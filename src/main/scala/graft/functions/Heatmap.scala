package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's flagship workload shape: bucketed 2-D heatmaps carried
  * as a map-typed column (reference `VarHeatmapColumnType` =
  * `map[int]uint32`, internal/test/integration/nyc_taxi_test.go:58-92;
  * time-bucketed variant edsm_test.go:45-191).
  *
  * There the heatmap is an opaque custom column merged cell-by-cell inside
  * Reduce closures; here it is a native `map<int,bigint>` produced by a
  * two-level aggregation — count per (bucket, pixel), then assemble the
  * map — so both levels get Catalyst partial aggregation and the map
  * itself is never shuffled until it is final.
  */
object Heatmap {

  /** Pixel index of (x, y) on a w×h grid over the given extent. Out-of-
    * range points clamp to the border (the reference drops them in the
    * closure — callers can filter beforehand for that behavior); the
    * clamp happens in DOUBLE space *before* the int cast, so arbitrarily
    * large coordinates clamp instead of overflowing the cast (an ANSI
    * runtime error on Spark 4's defaults). NaN clamps to the far border
    * (NaN sorts above every double); null x or y yields a null pixel,
    * which [[aggregate]] drops — not a silent count against pixel 0.
    */
  def pixel(x: Column, y: Column,
            minX: Double, maxX: Double, minY: Double, maxY: Double,
            w: Int, h: Int): Column = {
    val fx = (x - lit(minX)) / lit(maxX - minX) * lit(w)
    val fy = (y - lit(minY)) / lit(maxY - minY) * lit(h)
    val px = floor(least(lit((w - 1).toDouble), greatest(lit(0.0), fx))).cast("int")
    val py = floor(least(lit((h - 1).toDouble), greatest(lit(0.0), fy))).cast("int")
    when(x.isNull || y.isNull, lit(null).cast("int"))
      .otherwise(py * lit(w) + px)
  }

  /** One heatmap row per `bucket`: map from pixel index → count. Null
    * pixels (null coordinates upstream) are dropped, mirroring the
    * reference closures' skip-bad-point behavior.
    */
  def aggregate(df: DataFrame, bucket: Column, pixelCol: Column): DataFrame =
    df.where(pixelCol.isNotNull)
      .groupBy(bucket.as("bucket"), pixelCol.as("pixel"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("bucket"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("pixel"), col("cnt")))))
        .as("heatmap"))
}
