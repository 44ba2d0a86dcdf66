package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout functions — the write-side levers that decide how much of
  * 100 TB a query has to READ. Parquet footers carry per-file/per-rowgroup
  * min/max stats; clustering correlated rows into the same files is what
  * turns those stats into skipped I/O. Sorting by one column prunes that
  * column only — a Z-order (Morton) curve interleaves the bits of two
  * dimensions so file ranges stay tight in BOTH, giving multi-dimensional
  * data skipping without an index.
  */
object Layout {

  /** 32-bit Morton code of two columns' low 16 bits: bit `i` of `a` lands
    * at position `2i`, bit `i` of `b` at `2i+1`. Pure shift/mask/or tree —
    * codegen'd, map-only, no state. Values beyond 16 bits are masked
    * (callers bucket/hash high-cardinality dimensions down first).
    */
  def zValue16(a: Column, b: Column): Column = {
    val am = a.cast("long").bitwiseAND(lit(0xFFFFL))
    val bm = b.cast("long").bitwiseAND(lit(0xFFFFL))
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** PARTITION-SCOPED small-file compaction plan — the dir-isolated
    * complement of [[graft.sources.Compaction.plan]]: that planner
    * packs one global namespace with a two-level banded prefix sum
    * (the extreme-file-count path); this one never bins across
    * partition directories — a partition dir is the unit of both query
    * pruning and rewrite atomicity, so compacting across dirs would
    * destroy partition pruning — and adds the keep threshold a parquet
    * maintenance pass needs (files already at target size are not
    * rewritten).
    *
    * Within each dir, files smaller than `targetBytes` are binned in
    * path order by running size: `group_id = floor((cumsum − bytes) /
    * targetBytes)` — first-fit with overflow, so every group's total
    * lands in `[targetBytes, targetBytes + maxfile)` except the last
    * (exact first-fit needs a stateful scan; the cumsum form is
    * window-expressible, deterministic, and within one file of
    * optimal for the many-small-files case this exists for). Files
    * ≥ targetBytes keep themselves: `action = 'keep'`, null group.
    *
    * Shuffle profile: inventory-sized (metadata, ~#files rows — NOT
    * data), one DIR-KEYED cumsum window — the dir key is what makes
    * the window parallel, so no global single-reducer stage and no
    * band decomposition needed (each dir's file count is bounded by
    * the table's own partition sizing).
    *
    * @return (dirCol, pathCol, bytes, action, group_id) — every input
    *         file exactly once
    */
  def compactionPlan(files: DataFrame, dirCol: String, pathCol: String,
                     bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    import org.apache.spark.sql.expressions.Window
    val bytes = col(bytesCol).cast("long")
    val small = bytes < targetBytes
    val cum = sum(when(small, bytes).otherwise(0L)).over(
      Window.partitionBy(col(dirCol)).orderBy(col(pathCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    files.select(col(dirCol), col(pathCol), bytes.as("bytes"),
        when(small, lit("compact")).otherwise(lit("keep")).as("action"),
        when(small,
          floor((cum - bytes).cast("double") / lit(targetBytes.toDouble))
            .cast("long")).as("group_id"))
  }
}
