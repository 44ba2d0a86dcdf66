package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  test("as-of join: latest right row at-or-before each left ts, else null") {
    val lSchema = StructType(Seq(
      StructField("k", StringType), StructField("lts", LongType),
      StructField("lid", LongType)))
    val rSchema = StructType(Seq(
      StructField("k", StringType), StructField("rts", LongType),
      StructField("price", DoubleType)))
    val left = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", 5L, 1L),   // after r@3 → 30.0
      Row("a", 3L, 2L),   // exactly r@3 (inclusive) → 30.0
      Row("a", 2L, 3L),   // after r@1 → 10.0
      Row("a", 0L, 4L),   // before all → null
      Row("b", 9L, 5L),   // b has no right rows → null
    )), lSchema)
    val right = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", 1L, 10.0), Row("a", 3L, 30.0), Row("a", 7L, 70.0),
    )), rSchema)
    val out = AsOf.join(left, right, "k", "lts", "rts", Seq("price"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out == Map(1L -> 30.0, 2L -> 30.0, 3L -> 10.0, 4L -> null, 5L -> null))
  }
}
