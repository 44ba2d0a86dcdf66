package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Secondary file-skipping index over a file-backed table: per-file
  * min/max key range + a per-file Bloom filter, so point/batch lookups
  * read ONLY the files that can contain the keys — the scan-avoidance
  * layer a 100 TB corpus needs for "fetch these 50 documents" without a
  * table format's metadata tier. At 1000 executors the win is not
  * parallelism but I/O: a 100 TB table in 128 MB files is ~800k files,
  * and a batch lookup that touches 5 of them finishes in seconds while a
  * full scan occupies the cluster.
  *
  * The index is an ordinary DataFrame (one row per file: `file`,
  * `min_id`, `max_id`, `n_rows`, `bloom`) — persist it as parquet next
  * to the table and tomorrow's lookups never touch the data files at
  * all (the [[graft.functions.Dedup]] `fingerprintIndex` /
  * [[graft.functions.Similarity]] `ivfIndex` build-once/probe-many
  * convention applied to physical layout).
  *
  * Bloom encoding is plain and engine-portable: `bloomBits` positions,
  * `numProbes` probe positions per key via `xxhash64(probe, id) mod
  * bits`, stored as the SORTED ARRAY of set bit positions. Membership
  * is `array_contains` on every probe — no false negatives by
  * construction (every inserted key's positions are in the set), false
  * positives only cost reading a file that turns out empty for the key.
  *
  * Capability note: the reference engine always scans every partition of
  * its source (reference datasource/file.go:27-54 enumerates all files;
  * no skipping tier exists) — this index is the Spark-side answer.
  */
object FileSkipIndex {

  private val DefaultBits = 1 << 14
  private val DefaultProbes = 3

  private def probePositions(id: org.apache.spark.sql.Column, bits: Int,
                             probes: Int): Seq[org.apache.spark.sql.Column] =
    (0 until probes).map(p => pmod(xxhash64(lit(p), id), lit(bits.toLong)))

  /** Build the index for `df`, which must be a direct file-source read
    * (parquet/orc/csv — anything exposing the `_metadata.file_path`
    * hidden column; derived frames have no file identity to index).
    *
    * Shuffle profile: positions dedup first on `(file, position)` — the
    * per-file aggregation state is therefore capped at `bloomBits`
    * entries regardless of rows per file (a `collect_set` straight off
    * the rows would buffer 3 ints per ROW of the largest file) — then
    * both metadata-sized frames (≤ #files × bits and #files rows) join
    * on `file`. Nothing driver-sized is collected at build time.
    */
  def build(df: DataFrame, idCol: String, bloomBits: Int = DefaultBits,
            numProbes: Int = DefaultProbes): DataFrame = {
    require(bloomBits >= 8, s"bloomBits too small: $bloomBits")
    require(numProbes >= 1 && numProbes <= 8, s"numProbes out of [1,8]: $numProbes")
    val keyed = df.select(col("_metadata.file_path").as("file"),
      col(idCol).cast("long").as("__id"))
    val stats = keyed.groupBy("file").agg(
      min(col("__id")).as("min_id"), max(col("__id")).as("max_id"),
      count(lit(1)).as("n_rows"))
    val positions = keyed
      .select(col("file"),
        explode(array(probePositions(col("__id"), bloomBits, numProbes): _*))
          .as("__pos"))
      .groupBy("file", "__pos").agg(count(lit(1)).as("__c")).drop("__c")
      .groupBy("file").agg(sort_array(collect_set(col("__pos"))).as("bloom"))
    stats.join(positions, "file")
      .select("file", "min_id", "max_id", "n_rows", "bloom")
  }

  /** Files that MAY contain at least one of `ids`: range overlap AND all
    * Bloom probes present. Runs entirely over the metadata-sized index
    * (index × |ids| — lookups are small by contract).
    */
  def candidateFiles(index: DataFrame, ids: Seq[Long],
                     bloomBits: Int = DefaultBits,
                     numProbes: Int = DefaultProbes): DataFrame = {
    require(ids.nonEmpty, "probe needs at least one id")
    val probes = index.sparkSession.createDataFrame(
      ids.distinct.map(Tuple1.apply)).toDF("__pid")
    val hit = probePositions(col("__pid"), bloomBits, numProbes)
      .map(p => array_contains(col("bloom"), p))
      .reduce(_ && _)
    index.join(probes,
        col("__pid").between(col("min_id"), col("max_id")) && hit)
      .select("file").distinct()
  }

  /** Batch lookup through the index: collect the (metadata-sized)
    * candidate file list, read ONLY those files, and apply the exact id
    * filter — files outside every probe's range/Bloom are never opened.
    * `schemaOf` supplies the result schema for the zero-candidate case
    * (and is otherwise untouched).
    */
  def probe(spark: SparkSession, index: DataFrame, schemaOf: DataFrame,
            idCol: String, ids: Seq[Long], bloomBits: Int = DefaultBits,
            numProbes: Int = DefaultProbes): DataFrame = {
    val files = candidateFiles(index, ids, bloomBits, numProbes)
      .collect().map(_.getString(0))
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schemaOf.schema)
    else
      spark.read.schema(schemaOf.schema).parquet(files.toIndexedSeq: _*)
        .where(col(idCol).cast("long").isin(ids: _*))
  }
}
