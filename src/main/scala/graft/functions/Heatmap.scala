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

  /** Pixel index of (x, y) on a w×h grid over the given extent; out-of-
    * range points clamp to the border (the reference drops them in the
    * closure — callers can filter beforehand for that behavior).
    */
  def pixel(x: Column, y: Column,
            minX: Double, maxX: Double, minY: Double, maxY: Double,
            w: Int, h: Int): Column = {
    val px = least(lit(w - 1), greatest(lit(0),
      floor((x - lit(minX)) / lit(maxX - minX) * lit(w)).cast("int")))
    val py = least(lit(h - 1), greatest(lit(0),
      floor((y - lit(minY)) / lit(maxY - minY) * lit(h)).cast("int")))
    py * lit(w) + px
  }

  /** One heatmap row per `bucket`: map from pixel index → count. */
  def aggregate(df: DataFrame, bucket: Column, pixelCol: Column): DataFrame =
    df.groupBy(bucket.as("bucket"), pixelCol.as("pixel"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("bucket"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("pixel"), col("cnt")))))
        .as("heatmap"))
}
