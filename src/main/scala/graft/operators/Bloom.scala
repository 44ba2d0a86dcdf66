package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.BloomExpressions

/** Runtime Bloom-filter join pruning — the "semi-join pushdown" pattern
  * that decides whether a 100 TB join is feasible at all.
  *
  * A fact⋈dim join where the dim side is filtered (so only a fraction of
  * fact keys survive) still shuffles the ENTIRE fact side before the join
  * discards the misses. Building a Bloom sketch of the surviving dim keys
  * (one distributed treeAggregate pass over the small side) and probing it
  * in the fact scan's WHERE drops non-matching fact rows BEFORE the
  * shuffle: the exchange now carries |matching| + ε·|fact| rows instead of
  * |fact|. False positives (rate `fpp`) are eliminated by the exact join
  * that follows, so results are bit-identical to the plain join.
  *
  * Spark's own AQE injects this only for DPP-eligible plans; this operator
  * makes the pattern available unconditionally (and to non-equi follow-up
  * logic). The probe is the native codegen'd
  * [[graft.plans.BloomMightContain]] — one xxhash-family probe per row
  * inside WholeStageCodegen, no boxing for long keys.
  *
  * Reference capability note: go-sif has no cross-table pruning — every
  * reduction ships all rows (reference internal/cluster/s_shuffle.go). This
  * is one of the Spark-side capabilities §2.5 calls out as a native fill.
  */
object Bloom {

  /** Pre-filter `fact` to rows whose `factKey` is (probably) present among
    * `dim`'s `dimKey` values. Combine with the exact join for identical-
    * to-plain-join results.
    *
    * @param expectedKeys sizing for the sketch (distinct dim keys); at
    *                     scale pass the dim-side row estimate, not COUNT()
    * @param fpp          false-positive rate: sketch is ~ -1.44·log2(fpp)
    *                     bits per key (1% → ~9.6 bits/key — 120 MB per
    *                     10^8 keys, broadcast-sized)
    */
  def prefilter(fact: DataFrame, dim: DataFrame, factKey: String,
                dimKey: String, expectedKeys: Long,
                fpp: Double = 0.01): DataFrame = {
    val sketch = dim.stat.bloomFilter(dimKey, expectedKeys, fpp)
    fact.where(BloomExpressions.mightContain(col(factKey), sketch))
  }

  /** Bloom-pruned inner equi-join: plain-join results, shuffle carries
    * only (probable) matches of the fact side.
    */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, expectedKeys: Long,
                 fpp: Double = 0.01): DataFrame = {
    val filtered = prefilter(fact, dim, factKey, dimKey, expectedKeys, fpp)
    // side-qualified keys: an unqualified col(factKey) is ambiguous when
    // both sides name the key identically
    filtered.join(dim, filtered(factKey) === dim(dimKey))
  }
}
