package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reference-parity spec for the NYC-taxi / EDSM heatmap workloads
  * (SURVEY §5): map-typed heatmap column aggregated per time bucket,
  * with the map carried as native map<int,bigint> instead of the
  * reference's gob-encoded custom column.
  */
class HeatmapSpec extends SparkSpec {

  test("time-bucketed heatmap: per-bucket pixel counts, totals preserved") {
    val ev = graft.GraftSession.readTable(spark, sf(), "events")
    val px = Heatmap.pixel(
      col("value"), (col("user_id") % 100).cast("double"),
      minX = 0, maxX = 1000, minY = 0, maxY = 100, w = 16, h = 16)
    val hm = Heatmap.aggregate(ev, date_trunc("day", col("ts")), px)
    val rows = hm.collect()
    assert(rows.nonEmpty)
    // every pixel in range, per-bucket totals sum back to the row count
    val total = rows.map(_.getMap[Int, Long](1).values.sum).sum
    assert(total == ev.count())
    rows.foreach { r =>
      assert(r.getMap[Int, Long](1).keys.forall(p => p >= 0 && p < 256))
    }
  }

  test("heatmap maps merge across buckets like the reference's reduce") {
    // two explicit buckets, deterministic pixels
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("b", StringType), StructField("x", DoubleType),
      StructField("y", DoubleType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a", 0.0, 0.0), Row("a", 0.0, 0.0), Row("a", 9.0, 9.0),
        Row("b", 9.0, 0.0))),
      schema)
    val px = Heatmap.pixel(col("x"), col("y"), 0, 10, 0, 10, 2, 2)
    val out = Heatmap.aggregate(df, col("b"), px).collect()
      .map(r => r.getString(0) -> r.getMap[Int, Long](1).toMap).toMap
    assert(out("a") == Map(0 -> 2L, 3 -> 1L))
    assert(out("b") == Map(1 -> 1L))
  }
}
