package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SaveMode}

/** Output paths. The reference has NO sink abstraction — results leave via
  * `Collect`/`Accumulate` to the coordinator or side-effecting `Map`
  * closures (reference README.md:333, edsm_test.go:138-184 writes PNGs
  * inside a Map). Spark-native equivalents, plus real columnar sinks the
  * reference lacks:
  *
  *  - columnar/batch writers with partition pruning on the way back in
  *  - `foreachPartition` for the side-effect pattern (connection-per-
  *    partition, the correct shape for external stores at 1000 executors)
  *  - streaming sinks live in [[graft.streaming.MicroBatch.runPerBatch]]
  */
object Sinks {

  /** Partitioned parquet — `partitionBy` columns become directory keys, so
    * downstream readers get partition pruning for free. At 100 TB choose
    * low-cardinality keys (date, source) — not high-cardinality IDs.
    */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
              mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def csv(df: DataFrame, path: String, header: Boolean = true,
          mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)

  /** Partitioned ORC — write-side parity with [[Sources.orc]]: same
    * directory-key pruning contract as the parquet sink.
    */
  def orc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
          mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  def jsonl(df: DataFrame, path: String,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** Z-order-clustered parquet: rows are range-partitioned and sorted by
    * the Morton interleave of two dimensions ([[graft.functions.Layout
    * .zValue16]]), so every output file covers a tight range in BOTH
    * columns and parquet min/max stats prune scans filtered on either —
    * the layout analogue of a composite index, paid once at write time.
    * `repartitionByRange` samples the z-distribution, so files are
    * near-equal-sized even when the dimensions are skewed.
    */
  def zorderedParquet(df: DataFrame, dimA: String, dimB: String,
                      path: String, numFiles: Int,
                      mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", graft.functions.Layout.zValue16(col(dimA), col(dimB)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(mode).parquet(path)
  }

  /** Interleave-ordered parquet — the write stage that completes
    * [[graft.functions.Corpus.interleaveByWeight]]: rows range-partition
    * and sort by `interleave_pos`, so reading files in name order streams
    * the training mixture in weighted-stride order (each source at its
    * weighted rate, evenly spread). Same write-side shape as
    * [[zorderedParquet]]: `repartitionByRange` samples the position
    * distribution → near-equal files even when sources are skewed, and
    * the sort is per-file, never a single global reducer.
    *
    * File-name order IS position order: part file numbering follows the
    * range partition id, and ranges are ascending in the sort key.
    */
  def interleavedParquet(df: DataFrame, sourceCol: String, keyCol: String,
                         weights: Map[String, Double], path: String,
                         numFiles: Int,
                         defaultWeight: Double = 1.0,
                         mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions.col
    graft.functions.Corpus.interleaveByWeight(df, sourceCol, keyCol, weights, defaultWeight)
      .repartitionByRange(numFiles, col("interleave_pos"))
      .sortWithinPartitions("interleave_pos")
      .write.mode(mode).parquet(path)
  }

  /** Bucketed + sorted table: rows are hash-partitioned into `nBuckets`
    * files per partition by `bucketCols` at write time. Two tables
    * bucketed the same way join WITHOUT a shuffle — the write pre-pays
    * the exchange once for every future join/aggregation on those keys.
    * The 100 TB pattern for fact tables that join repeatedly.
    */
  def bucketedTable(df: DataFrame, tableName: String,
                    bucketCols: Seq[String], nBuckets: Int,
                    sortCols: Seq[String] = Nil,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(tableName)
  }

  /** The reference's side-effecting-Map output pattern, done right: one
    * callback per partition (per-partition connection/batch), executed on
    * executors, no data through the driver.
    */
  def foreachPartitionSink(df: DataFrame)(f: Iterator[Row] => Unit): Unit =
    df.foreachPartition(f)
}
