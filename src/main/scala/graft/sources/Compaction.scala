package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning over file metadata — the maintenance
  * pass every long-lived 100 TB table needs: streaming ingest and
  * per-partition writes leave behind thousands of KB-sized files, and a
  * scan's task count (and the namenode's metadata load) grows with file
  * COUNT, not byte size. The planner groups files into target-sized
  * bins; executing the plan is one `spark.read(files-of-bin).coalesce(1)
  * .write` per bin (embarrassingly parallel across bins).
  *
  * The packing rule is deliberately the one with a DISTRIBUTED, exact,
  * order-free formulation — cumulative-quota packing: items are taken
  * in (size DESC, name ASC) order and item j goes to bin
  * `floor(prefix_sum_exclusive(j) / targetBytes)`. Properties: bins are
  * contiguous in sort order, every bin's exclusive start is below its
  * quota boundary (so a bin exceeds `targetBytes` by at most its last
  * item), oversized items land alone in their own bin(s), and the whole
  * plan is a pure function of the file listing — two engines, or two
  * runs, produce the identical plan (first-fit-decreasing packs ~equally
  * well but is inherently sequential; this is the scalable spec).
  *
  * Scale shape: the input is METADATA-sized (one row per file), but the
  * prefix sum still avoids a single-reducer global window — the
  * [[graft.functions.Corpus.budgetSelect]] two-level decomposition,
  * with the size band = `length(bin(size))` (binary magnitude, integer-
  * exact — no float log in the bucketing): per-band totals prefix-sum in
  * a ≤64-row stage, the data-sized window keys on the band.
  */
object Compaction {

  /** Pack (name, size) items into target-sized bins. Returns
    * (name, size, bin, bin_start) with `bin_start` the exclusive prefix
    * sum — the position evidence for the bin assignment.
    */
  def plan(items: DataFrame, nameCol: String, sizeCol: String,
           targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val base = items.select(col(nameCol).cast("string").as("name"),
      col(sizeCol).cast("long").as("size"))
    val banded = base.withColumn("__bk", length(bin(greatest(col("size"), lit(0L)))))
    // exclusive prefix of each band's total, bands in DESC size order
    val offsets = banded.groupBy(col("__bk")).agg(sum(col("size")).as("__btot"))
      .select(col("__bk"),
        coalesce(sum(col("__btot")).over(
          Window.orderBy(col("__bk").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("__boff"))
    val inBand = Window.partitionBy(col("__bk"))
      .orderBy(col("size").desc, col("name").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    banded.join(broadcast(offsets), Seq("__bk"))
      .withColumn("__cum", col("__boff") + sum(col("size")).over(inBand))
      // integer `div`, not `/`: long / long is a DOUBLE divide in Spark
      .select(col("name"), col("size"),
        expr(s"(__cum - size) div ${targetBytes}L").as("bin"),
        (col("__cum") - col("size")).as("bin_start"))
  }

  /** [[plan]] over a file-backed frame's own listing (`_metadata`
    * hidden columns — any file source). Returns one row per FILE:
    * (name=file_path, size=file_size, bin, bin_start).
    */
  def planFiles(df: DataFrame, targetBytes: Long): DataFrame =
    plan(df.select(col("_metadata.file_path").as("f"),
        col("_metadata.file_size").as("s")).distinct(),
      "f", "s", targetBytes)

  /** Per-bin rollup of a [[plan]]: (bin, n_items, total_bytes). */
  def planSummary(planned: DataFrame): DataFrame =
    planned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_items"), sum(col("size")).as("total_bytes"))

  /** Execute a [[planFiles]] plan: rewrite the table so each bin becomes
    * ONE parquet file under `outDir/bin=<k>/`. A single distributed job,
    * not a driver loop over bins: rows rejoin their bin via a broadcast
    * of the (metadata-sized) plan on `_metadata.file_path`, hash-
    * repartition on `bin` puts every bin's rows in exactly one task, and
    * the dynamic-partition write emits one file per bin directory.
    * Files the plan doesn't cover are left out (and counted — a partial
    * plan must be visible, not silently dropped); pass the full
    * [[planFiles]] output for a whole-table rewrite.
    *
    * @return (bin, n_rows) per written bin — the job's own audit
    */
  def execute(df: DataFrame, planned: DataFrame, outDir: String): DataFrame = {
    val spark = df.sparkSession
    val planFiles = planned.select(col("name").as("__file"), col("bin"))
    // coverage is decidable at FILE granularity: the distinct listing
    // projects only the metadata column, so the pre-flight never pays a
    // data-column scan — the rewrite's one data pass is the write itself
    val files = df.select(col("_metadata.file_path").as("__file")).distinct()
    val uncoveredFiles =
      files.join(broadcast(planFiles), Seq("__file"), "left_anti").count()
    if (uncoveredFiles > 0)
      System.err.println(
        s"[graft] WARN Compaction.execute: $uncoveredFiles files the plan " +
          "does not cover — their rows are excluded from the rewrite")
    val coveredFiles =
      files.join(broadcast(planFiles), Seq("__file"), "left_semi").count()
    if (coveredFiles == 0L) {
      // nothing to rewrite: an empty parquet dir has no schema to
      // re-read — return the empty audit directly instead of crashing
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("bin", LongType),
          StructField("n_rows", LongType, nullable = false))))
    }
    val covered = df
      .withColumn("__file", col("_metadata.file_path"))
      .join(broadcast(planFiles), Seq("__file"))
      .drop("__file")
    covered
      .repartition(col("bin"))
      .write.mode("overwrite").partitionBy("bin").parquet(outDir)
    // partition-dir values re-read as the inferred (int) type — pin long
    spark.read.parquet(outDir)
      .groupBy(col("bin").cast("long").as("bin"))
      .agg(count(lit(1)).as("n_rows"))
  }
}
