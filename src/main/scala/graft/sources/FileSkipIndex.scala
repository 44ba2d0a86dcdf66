package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.execution.datasources.v2.FileTable
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
  * `min_id`, `max_id`, `n_rows`, `bloom`, plus the build parameters
  * `bits`, `probes`, `fmt`) — persist it as parquet next to the table
  * and tomorrow's lookups never touch the data files at all (the
  * [[graft.functions.Dedup]] `fingerprintIndex` /
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
  * The Bloom parameters and the source file format are COLUMNS of the
  * index, not free parameters of the probe: probing with different
  * bits/probes than the build used would silently produce Bloom false
  * negatives — dropped rows from an "exact" lookup — so `candidateFiles`
  * and `probe` read the stored values and there is no way to pass
  * mismatched ones. (Reader OPTIONS beyond the format — csv headers,
  * custom delimiters — are not stored; index option-dependent sources
  * by reading them into a well-typed frame first, or probe the raw
  * files yourself from `candidateFiles`.)
  *
  * Capability note: the reference engine always scans every partition of
  * its source (reference datasource/file.go:27-54 enumerates all files;
  * no skipping tier exists) — this index is the Spark-side answer.
  */
object FileSkipIndex {

  private val DefaultBits = 1 << 14
  private val DefaultProbes = 3

  private def probePositions(id: Column, bits: Int, probes: Int): Seq[Column] =
    (0 until probes).map(p => pmod(xxhash64(lit(p), id), lit(bits.toLong)))

  /** The source file format, recovered from `df`'s own plan (v1
    * `HadoopFsRelation` or a DSv2 `FileTable`) — the frame being indexed
    * already knows how its files are encoded; asking the caller again
    * would just create a second place for the answer to be wrong.
    */
  private def sniffFormat(df: DataFrame): Option[String] =
    // analyzed, not logical: a fresh DataFrameReader plan is an
    // UnresolvedDataSource node until analysis resolves the relation
    df.queryExecution.analyzed.collectFirst {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
        val n = l.relation.asInstanceOf[HadoopFsRelation]
          .fileFormat.getClass.getSimpleName
        n.stripSuffix("FileFormat").toLowerCase // ParquetFileFormat → parquet
      case r: DataSourceV2Relation if r.table.isInstanceOf[FileTable] =>
        r.table.asInstanceOf[FileTable].formatName.toLowerCase
    }

  /** Build parameters stored in a (possibly parquet-round-tripped)
    * index; loud failure on a frame that is not one of ours or that
    * mixes rows from two different builds.
    */
  private def storedParams(index: DataFrame): (Int, Int, String) = {
    val needed = Seq("bits", "probes", "fmt")
    val missing = needed.filterNot(index.columns.contains)
    require(missing.isEmpty,
      s"not a FileSkipIndex frame: missing column(s) ${missing.mkString(", ")}")
    val rows = index.select(needed.map(col): _*).distinct().limit(3).collect()
    require(rows.length == 1,
      s"index mixes rows from different builds: ${rows.mkString("; ")}")
    (rows(0).getInt(0), rows(0).getInt(1), rows(0).getString(2))
  }

  /** Build the index for `df`, which must be a direct file-source read
    * (parquet/orc/csv/json — anything exposing the `_metadata.file_path`
    * hidden column; derived frames have no file identity to index). The
    * file format is detected from `df`'s plan; pass `format` explicitly
    * only for a source the sniffer cannot name.
    *
    * Shuffle profile: positions dedup first on `(file, position)` — the
    * per-file aggregation state is therefore capped at `bloomBits`
    * entries regardless of rows per file (a `collect_set` straight off
    * the rows would buffer 3 ints per ROW of the largest file) — then
    * both metadata-sized frames (≤ #files × bits and #files rows) join
    * on `file`. Nothing driver-sized is collected at build time.
    */
  def build(df: DataFrame, idCol: String, bloomBits: Int = DefaultBits,
            numProbes: Int = DefaultProbes, format: String = ""): DataFrame = {
    require(bloomBits >= 8, s"bloomBits too small: $bloomBits")
    require(numProbes >= 1 && numProbes <= 8, s"numProbes out of [1,8]: $numProbes")
    val fmt =
      if (format.nonEmpty) format.toLowerCase
      else sniffFormat(df).getOrElse(throw new IllegalArgumentException(
        "cannot detect the source file format from the plan; pass format= explicitly"))
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
      .select(col("file"), col("min_id"), col("max_id"), col("n_rows"),
        col("bloom"), lit(bloomBits).as("bits"), lit(numProbes).as("probes"),
        lit(fmt).as("fmt"))
  }

  /** Files that MAY contain at least one of `ids`: range overlap AND all
    * Bloom probes present, under the bits/probes the index was BUILT
    * with (stored in the index — a mismatch here would mean false
    * negatives, so there is no parameter to mismatch). Runs entirely
    * over the metadata-sized index (index × |ids| — lookups are small
    * by contract).
    */
  def candidateFiles(index: DataFrame, ids: Seq[Long]): DataFrame = {
    require(ids.nonEmpty, "probe needs at least one id")
    val (bits, probes, _) = storedParams(index)
    val ps = index.sparkSession.createDataFrame(
      ids.distinct.map(Tuple1.apply)).toDF("__pid")
    val hit = probePositions(col("__pid"), bits, probes)
      .map(p => array_contains(col("bloom"), p))
      .reduce(_ && _)
    index.join(ps,
        col("__pid").between(col("min_id"), col("max_id")) && hit)
      .select("file").distinct()
  }

  /** Batch lookup through the index: collect the (metadata-sized)
    * candidate file list, read ONLY those files — in the format the
    * index recorded at build time — and apply the exact id filter;
    * files outside every probe's range/Bloom are never opened.
    * `schemaOf` supplies the result schema (required: the pruned read
    * must not re-infer types from a file subset, and the zero-candidate
    * case has no files to infer from).
    */
  def probe(spark: SparkSession, index: DataFrame, schemaOf: DataFrame,
            idCol: String, ids: Seq[Long]): DataFrame = {
    val (_, _, fmt) = storedParams(index)
    val files = candidateFiles(index, ids)
      .collect().map(_.getString(0))
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schemaOf.schema)
    else
      spark.read.schema(schemaOf.schema).format(fmt)
        .load(files.toIndexedSeq: _*)
        .where(col(idCol).cast("long").isin(ids: _*))
  }
}
