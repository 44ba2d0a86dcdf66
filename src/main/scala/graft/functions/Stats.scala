package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed exact order statistics.
  *
  * Spark's `percentile(...)` aggregate is exact but buffers a
  * value→count map whose FINAL merge holds every distinct value on one
  * reducer — fine at 10⁶ rows, an OOM at 10¹² distinct doubles. This is
  * the scale-safe exact path: iterative bucket refinement (the classic
  * distributed selection algorithm), where every pass keeps only
  * O(intervals × buckets) counts — metadata, never rows — and the final
  * step collects one provably-small interval.
  *
  *  - Pass 0: count + min/max.
  *  - Each refinement pass histograms the pending intervals into
  *    `buckets` equal-width sub-ranges (ONE scan covers all pending ranks
  *    — intervals are disjoint, so a row maps to ≤1 (interval, bucket)
  *    cell), then walks the tiny count table to find each rank's
  *    sub-range and its exact row count.
  *  - When a rank's interval holds ≤ `maxCollect` rows (or collapses to a
  *    single double), its values are fetched and the rank read off
  *    exactly. Range shrinks ×`buckets` per pass, so passes are
  *    O(log_buckets(range/ulp)) — ≤ 5 in practice even for adversarial
  *    distributions.
  *
  * Reference capability note: go-sif computes quantiles only via a full
  * user-side Reduce (operations/transform/reduce.go:16-44) — single-node
  * state, same scale wall as Spark's `percentile`.
  */
object Stats {

  // A rank's state: the CLOSED value interval [lo, hi] known to contain
  // it, its offset among that interval's rows, and the interval's row
  // count. Intervals are always observed per-bucket [min, max] ranges
  // (or the global [min, max]), so they are attained at both ends and
  // disjoint across siblings — ordered bucket ranges cannot interleave.
  private final case class Pending(rank: Long, lo: Double, hi: Double,
                                   offset: Long, size: Long)

  /** Per-column data-profiling census (the `DESCRIBE`-class platform
    * feature): one row per column with total rows, null count and
    * distinct count — the completeness/cardinality report that drives
    * join-key selection, partition-key choice and schema QA. ONE scan:
    * all columns' aggregates ride a single aggregation job with map-side
    * partials.
    *
    * The scale mode is a PARAMETER, not a comment: `approxRsd = 0`
    * (default) is exact `count_distinct` — Spark plans the multi-column
    * form as Expand (the scan multiplied by #columns into a partial-
    * distinct exchange that carries the distinct VALUES themselves);
    * right when the counts are contractual, ruinous when one column is a
    * unique id over 100 TB (every id shuffles, × columns). `approxRsd >
    * 0` swaps in `approx_count_distinct` (HLL++): per-column sketch
    * state is KB-bounded, the exchange carries sketches not values, and
    * no Expand multiplies the scan — the 100 TB profile. The approx
    * mode's tolerance is oracled by x_profile_approx (exact value +
    * within-3·rsd flag, the x_approx_distinct self-verifying pattern).
    *
    * @param approxRsd 0 for exact distinct counts; otherwise the target
    *   relative standard deviation of the HLL++ estimate (e.g. 0.02)
    * @return (column, n_rows, n_nulls, n_distinct) in `columns` order
    *   (pinned by an ordinal column so the output order is part of the
    *   contract), distinct counts EXCLUDING null (count-distinct
    *   semantics in both engines)
    */
  def profile(df: DataFrame, columns: Seq[String],
              approxRsd: Double = 0.0): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    require(approxRsd >= 0.0 && approxRsd < 1.0,
      s"approxRsd must be in [0, 1): $approxRsd")
    // Aggregate aliases are ORDINAL (__nd_0, __nd_1, …), never the raw
    // column name, and input references are backtick-quoted: a name
    // containing a dot (legal in DataFrames) would otherwise round-trip
    // through col()'s parser as a nested-field path and fail analysis.
    def ref(c: String) = col(s"`${c.replace("`", "``")}`")
    val aggs = columns.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(lit(1)).as(s"__n_$i"),
        count(when(ref(c).isNull, lit(1))).as(s"__nn_$i"),
        (if (approxRsd == 0.0) count_distinct(ref(c))
         else approx_count_distinct(ref(c), approxRsd)).as(s"__nd_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = columns.zipWithIndex.map { case (c, i) =>
      one.select(lit(i).as("__ord"), lit(c).as("column"),
        col(s"__n_$i").as("n_rows"), col(s"__nn_$i").as("n_nulls"),
        col(s"__nd_$i").as("n_distinct"))
    }
    stacked.reduce(_ union _).orderBy("__ord")
      .select("column", "n_rows", "n_nulls", "n_distinct")
  }

  /** Exact linear-interpolation quantiles (the `percentile()` /
    * `quantile_cont` definition: index p·(n−1) over the sorted values,
    * fractional index interpolated). Nulls and NaNs are excluded.
    *
    * Runs jobs eagerly and returns the values (they are driver-sized by
    * definition).
    */
  def exactQuantiles(df: DataFrame, valueCol: String, probs: Seq[Double],
                     buckets: Int = 4096, maxCollect: Int = 1 << 20): Seq[Double] = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probabilities must be in [0,1]: $probs")
    require(buckets >= 2 && maxCollect >= 1)
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull && !isnan(col("v")))
    val head = vals.agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
      max(col("v")).as("hi")).head()
    val n = head.getLong(0)
    require(n > 0, s"exactQuantiles: no non-null values in $valueCol")
    val (gLo, gHi) = (head.getDouble(1), head.getDouble(2))

    // 0-based fractional positions; the integer ranks we must materialize.
    val positions = probs.map(p => p * (n - 1))
    val needed: Seq[Long] = positions
      .flatMap(pos => Seq(math.floor(pos).toLong, math.ceil(pos).toLong))
      .distinct.sorted

    var pending: Seq[Pending] = needed.map(r => Pending(r, gLo, gHi, r, n))
    val resolved = scala.collection.mutable.Map[Long, Double]()

    var guard = 0
    while (pending.nonEmpty) {
      guard += 1
      require(guard <= 64, s"exactQuantiles failed to converge: $pending")
      // An interval is terminal when it is a point, small enough to fetch,
      // or too narrow to subdivide (sub-ulp width breaks the ±1 floor
      // correction below — and such a span holds only a handful of
      // distinct doubles anyway, so the distinct-fetch is bounded).
      val (small, big) = pending.partition(p =>
        p.lo == p.hi || p.size <= maxCollect ||
          p.lo + (p.hi - p.lo) / buckets == p.lo)
      small.groupBy(p => (p.lo, p.hi)).foreach {
        case ((lo, hi), ps) =>
          if (lo == hi) ps.foreach(p => resolved(p.rank) = lo)
          else {
            // distinct values + multiplicities: driver memory is bounded by
            // DISTINCT doubles in the interval, not rows
            val hist = vals.where(col("v") >= lo && col("v") <= hi)
              .groupBy(col("v")).agg(count(lit(1)).as("c"))
              .orderBy(col("v")).collect()
              .map(r => (r.getDouble(0), r.getLong(1)))
            ps.foreach { p =>
              var cum = 0L; var i = 0; var found = false
              while (!found && i < hist.length) {
                cum += hist(i)._2
                if (p.offset < cum) { resolved(p.rank) = hist(i)._1; found = true }
                i += 1
              }
              require(found,
                s"rank ${p.rank}: offset ${p.offset} beyond interval [$lo,$hi]")
            }
          }
      }
      pending = big
      if (pending.nonEmpty) {
        // ONE scan histograms every pending interval. Intervals descend
        // from disjoint buckets, so each row lands in ≤1 cell.
        val intervals = pending.map(p => (p.lo, p.hi)).distinct
        val iExpr = intervals.zipWithIndex.foldLeft(lit(-1)) {
          case (acc, ((lo, hi), i)) =>
            when(col("v") >= lo && col("v") <= hi, lit(i)).otherwise(acc)
        }
        // Bucket boundaries are driver-computed literal doubles, and the
        // floor-based index is corrected by comparing against those exact
        // literals — so a row's counted bucket and the next pass's child
        // interval filter [xs(b), xs(b+1)) use IDENTICAL arithmetic. (A
        // bare floor can disagree with the comparison by 1 ulp, silently
        // shifting every offset after the misassigned row.)
        val boundsFor: ((Double, Double)) => IndexedSeq[Double] = {
          case (lo, hi) =>
            val w = (hi - lo) / buckets
            (0 to buckets).map(j =>
              if (j == 0) lo else if (j == buckets) hi else lo + j * w)
        }
        val bExpr = intervals.zipWithIndex.foldLeft(lit(0)) {
          case (acc, (ivl @ (lo, hi), i)) =>
            val xs = boundsFor(ivl)
            val bnds = typedLit(xs)
            val idx0 = least(lit(buckets - 1), greatest(lit(0),
              floor((col("v") - lit(lo)) / lit((hi - lo) / buckets)).cast("int")))
            val corrected =
              when(col("v") < element_at(bnds, idx0 + 1), idx0 - 1)
                .when(idx0 < buckets - 1 &&
                  col("v") >= element_at(bnds, least(idx0 + 2, lit(buckets + 1))),
                  idx0 + 1)
                .otherwise(idx0)
            when(col("iv") === i, corrected).otherwise(acc)
        }
        // min/max per cell lets the child clamp to the OBSERVED value
        // range — an all-equal bucket (heavy duplicates) collapses to a
        // point immediately instead of bisecting toward it for dozens of
        // passes, and sparse tails shrink by value, not by bucket width.
        val cells = vals.withColumn("iv", iExpr).where(col("iv") >= 0)
          .withColumn("bk", bExpr)
          .groupBy(col("iv"), col("bk"))
          .agg(count(lit(1)).as("c"), min(col("v")).as("mn"), max(col("v")).as("mx"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1)) ->
            ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
        pending = pending.map { p =>
          val ivl = (p.lo, p.hi)
          val iv = intervals.indexOf(ivl)
          var cum = 0L; var bk = 0; var res: Pending = null
          while (res == null && bk < buckets) {
            val (c, mn, mx) = cells.getOrElse((iv, bk), (0L, 0.0, 0.0))
            if (p.offset < cum + c) {
              // the child is the bucket's OBSERVED [min, max] — a closed
              // interval holding exactly the bucket's rows (neighbor
              // buckets cannot intersect it: value ranges are ordered)
              res = Pending(p.rank, mn, mx, p.offset - cum, c)
            }
            cum += c; bk += 1
          }
          require(res != null, s"rank ${p.rank}: offset ${p.offset} beyond interval")
          res
        }
      }
    }

    positions.map { pos =>
      val (kLo, kHi) = (math.floor(pos).toLong, math.ceil(pos).toLong)
      val (vLo, vHi) = (resolved(kLo), resolved(kHi))
      if (kLo == kHi) vLo else vLo + (pos - kLo) * (vHi - vLo)
    }
  }
}
