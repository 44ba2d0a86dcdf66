package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level expression pinning — force the CURRENT projection to
  * materialize as plain attributes before further operators reference
  * it.
  *
  * Why it exists: Catalyst's CollapseProject inlines a projected
  * expression into every downstream reference, and predicate pushdown
  * substitutes it into filters moved below the projection. For cheap
  * expressions that is exactly right; for an expensive derived column
  * (a 20-regex canonicalization chain, an RFC 3986 resolution CASE) it
  * multiplies the per-row work by the number of consumers and can blow
  * the generated code past the whole-stage-codegen size limit into
  * interpreted mode (measured on x_link_graph: 457 KB plan, 23.7 s vs
  * 3.4 s at sf0.1 before pinning).
  *
  * Mechanism: explode of a 1-element array inserts a Generate node.
  * The optimizer never collapses projections across Generate and never
  * pushes substituted predicates through it, so every pinned column is
  * computed exactly ONCE per row and downstream operators read plain
  * attributes. No shuffle; partitioning is preserved; the price is one
  * struct wrap/unwrap per row.
  */
object Pin {

  /** Pin every column of `df`'s current projection. */
  def pin(df: DataFrame): DataFrame = {
    val s = struct(df.columns.map(c => col(s"`${c.replace("`", "``")}`")): _*)
    df.select(explode(array(s)).as("__pin")).select(col("__pin.*"))
  }
}
