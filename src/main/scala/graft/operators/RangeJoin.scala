package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range (interval) join.
  *
  * Spark has no range-join optimization: a join whose only predicate is
  * `point BETWEEN start AND end` plans as BroadcastNestedLoopJoin (or a
  * cartesian product when neither side broadcasts) — O(|L|·|R|) at any
  * scale. The standard fix is binning: quantize the value domain into
  * fixed-width bins, emit each interval once per bin it covers, map each
  * point to its single bin, equi-join on the bin id, and re-check the
  * exact predicate. Every matching pair meets in exactly one bin (the
  * point's), so no dedup pass is needed, and the join is a plain shuffled
  * (or broadcast) hash join that scales linearly.
  *
  * Cost model: the interval side is replicated `len/binWidth + 1`× —
  * choose `binWidth` near the typical interval length so replication
  * stays O(1) per interval. A too-small width blows up the build side; a
  * too-large width degrades toward one giant bucket (all pairs in one
  * reducer). Skewed bins (many intervals covering one hot bin) compose
  * with [[Skew.saltedJoin]] upstream.
  *
  * Capability target: the time-range lookups a user of the reference
  * engine (go-sif/sif) would express as a hand-rolled `Map` probing a
  * broadcast interval list (README.md:333's side-effecting-closure
  * pattern), as a declarative, shuffle-parallel join.
  */
object RangeJoin {

  /** Join each left row whose `point` falls inside a right row's
    * `[start, end]` (inclusive both ends). All three columns must be of
    * one integral/date-like type; binning arithmetic runs on their long
    * form so nothing is lost to floating point.
    *
    * Returns left columns + the requested `rightCols` (names must not
    * collide with left's).
    */
  def pointInInterval(left: DataFrame, right: DataFrame,
                      point: String, start: String, end: String,
                      rightCols: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val leftCols = left.columns.toSeq
    val p = col(point).cast("long")
    val s = col(start).cast("long")
    val e = col(end).cast("long")
    // floorDiv semantics for negative domains: pmod-corrected quotient.
    def binOf(v: Column): Column =
      ((v - pmod(v, lit(binWidth))) / lit(binWidth)).cast("long")
    val l2 = left.withColumn("__bin", binOf(p))
    val r2 = right
      // degenerate/reversed intervals (end < start) match nothing — drop
      // them before the explode rather than emitting negative sequences
      .where(e >= s)
      .select((Seq(explode(sequence(binOf(s), binOf(e))).as("__bin")) ++
        Seq(s.as("__start"), e.as("__end")) ++ rightCols.map(col)): _*)
    l2.join(r2, Seq("__bin"))
      .where(p.between(col("__start"), col("__end")))
      .select((leftCols.map(col) ++ rightCols.map(col)): _*)
  }

  /** Join rows whose intervals overlap: `[ls, le] ∩ [rs, re] ≠ ∅`
    * (inclusive ends). Each left interval lands in every bin it covers,
    * each right interval likewise; a candidate pair can then meet in
    * several bins, so the pair is kept only in the FIRST bin both cover
    * (`max(binOf(ls), binOf(rs))`) — dedup by arithmetic, not by an extra
    * `distinct` shuffle.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      leftStart: String, leftEnd: String,
                      rightStart: String, rightEnd: String,
                      rightCols: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val leftCols = left.columns.toSeq
    def binOf(v: Column): Column =
      ((v - pmod(v, lit(binWidth))) / lit(binWidth)).cast("long")
    val ls = col(leftStart).cast("long"); val le = col(leftEnd).cast("long")
    val rs = col(rightStart).cast("long"); val re = col(rightEnd).cast("long")
    val l2 = left.where(le >= ls).select(
      (leftCols.map(col) :+ binOf(ls).as("__lbin") :+
        explode(sequence(binOf(ls), binOf(le))).as("__bin")): _*)
    val r2 = right.where(re >= rs).select(
      (Seq(explode(sequence(binOf(rs), binOf(re))).as("__bin"),
        binOf(rs).as("__rbin"), rs.as("__rs"), re.as("__re")) ++
        rightCols.map(col)): _*)
    l2.join(r2, Seq("__bin"))
      .where(greatest(col("__lbin"), col("__rbin")) === col("__bin"))
      .where(ls <= col("__re") && col("__rs") <= le)
      .select((leftCols.map(col) ++ rightCols.map(col)): _*)
  }
}
