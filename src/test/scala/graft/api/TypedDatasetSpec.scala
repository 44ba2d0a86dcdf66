package graft.api

import graft.SparkSpec

/** Typed Dataset surface — case-class rows with compile-time field checks,
  * the Spark-native answer to the reference's typed Row getters
  * (reference row.go:17-34).
  */
case class Line(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

class TypedDatasetSpec extends SparkSpec {

  test("case-class Dataset: filter + groupByKey + reduceGroups") {
    import spark.implicits._
    val ds = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .as[Line]
    val byFlag = ds.filter(_.l_quantity > 10)
      .groupByKey(_.l_returnflag)
      .mapValues(_.l_quantity)
      .reduceGroups(_ + _)
      .collect().toMap
    assert(byFlag.nonEmpty)
    assert(byFlag.values.forall(_ > 0))
    // cross-check against the relational path
    import org.apache.spark.sql.functions._
    val rel = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .where(col("l_quantity") > 10)
      .groupBy("l_returnflag").agg(sum("l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    byFlag.foreach { case (k, v) => assert(math.abs(v - rel(k)) < 1e-6) }
  }
}
