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
}
