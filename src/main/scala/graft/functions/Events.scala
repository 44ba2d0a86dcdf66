package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over (user, timestamp, type) streams — the
  * funnel/retention layer a user of the reference engine would hand-roll
  * as keyed `Reduce` closures over event rows (reference
  * operations/transform/reduce.go:16-44), expressed as declarative
  * chained aggregations with exact integer-microsecond arithmetic (the
  * r_sessionize discipline: every comparison and difference is on
  * `unix_micros`, so oracles match bit-for-bit and daylight-saving can't
  * exist).
  */
object Events {

  /** FLOOR division of epoch-µs into `unitUs` buckets — `DIV` truncates
    * toward zero, so a pre-1970 timestamp would land one bucket HIGH
    * and diverge from the oracles' `//` (floor) arithmetic; the
    * pmod-then-div form floors exactly for any sign (pmod is always
    * non-negative, and the subtraction makes the dividend exactly
    * divisible).
    */
  private def floorBucket(tsCol: String, unitUs: Long): org.apache.spark.sql.Column =
    expr(s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), ${unitUs}L))" +
      s" div ${unitUs}L")

  /** Ordered conversion funnel: step 1's time is the user's earliest
    * event of `steps(0)`'s type; step k's time is the earliest event of
    * `steps(k-1)`'s type AT OR AFTER step k−1's time; a user counts for
    * step k iff `t_k − t_1 ≤ windowUs`. Returns one row per step:
    * (step, event_type, n_users), monotonically non-increasing.
    *
    * Shuffle profile: one (user)-keyed aggregation per step, each with
    * map-side partial MIN and a hash join back to the (users-sized, far
    * smaller than events) step-time table — O(steps) data-sized
    * shuffles, no windows over the raw stream, nothing quadratic. The
    * final per-step counts are 1-row aggregates unioned into one plan.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             windowUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowUs >= 0, s"windowUs must be non-negative: $windowUs")
    val ev = events.select(col(userCol).as("__u"),
      unix_micros(col(tsCol)).as("__us"), col(typeCol).as("__t"))
    val stepTables = funnelStepTables(ev, steps)
    stepTables.zipWithIndex.map { case (t, i) =>
      val k = i + 1
      t.where(col(s"t$k") - col("t1") <= windowUs)
        .agg(count(lit(1)).as("n_users"))
        .select(lit(k.toLong).as("step"),
          lit(steps(i)).as("event_type"), col("n_users"))
    }.reduce(_ union _)
  }

  /** The per-step time-table fold [[funnel]] and [[funnelLatency]]
    * share: table k = users reaching step k, with their greedy step
    * times t1..tk (step k's time = earliest event of that type AT OR
    * AFTER t(k−1)).
    */
  private def funnelStepTables(ev: DataFrame,
                               steps: Seq[String]): Seq[DataFrame] =
    steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (s, i)) =>
        val k = i + 1
        Some(prev match {
          case None =>
            ev.where(col("__t") === s)
              .groupBy(col("__u")).agg(min(col("__us")).as("t1"))
          case Some(acc) =>
            val keep = (1 until k).map(j => col(s"a.t$j"))
            ev.as("e").where(col("__t") === s)
              .join(acc.as("a"), col("e.__u") === col("a.__u"))
              .where(col("e.__us") >= col(s"a.t${k - 1}"))
              .groupBy(col("a.__u") +: keep: _*)
              .agg(min(col("e.__us")).as(s"t$k"))
        })
    }.flatten

  /** Per-user conversion latency for funnel completers — [[funnel]]'s
    * missing output: not HOW MANY users converted but HOW LONG each
    * took (the time-to-convert distribution product teams fence SLAs
    * on; feed the result to [[graft.functions.Stats.exactQuantiles]] /
    * [[graft.functions.Stats.quantileBucket]] for the percentile
    * view). One row per user completing EVERY step within `windowUs`:
    * (user, t_first_us, t_final_us, latency_us) — exact integer
    * microseconds, the same greedy earliest-at-or-after step chaining
    * as [[funnel]] (so `count(*)` here always equals the funnel's last
    * step's n_users; the greedy chain is the funnel semantics, not the
    * globally-minimal latency). Same shuffle profile as [[funnel]]:
    * one user-keyed min-aggregation per step joined to the shrinking
    * completer table.
    */
  def funnelLatency(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, steps: Seq[String],
                    windowUs: Long): DataFrame = {
    require(steps.size >= 2, "latency needs at least two funnel steps")
    require(windowUs >= 0, s"windowUs must be non-negative: $windowUs")
    val ev = events.select(col(userCol).as("__u"),
      unix_micros(col(tsCol)).as("__us"), col(typeCol).as("__t"))
    val k = steps.size
    funnelStepTables(ev, steps).last
      .where(col(s"t$k") - col("t1") <= windowUs)
      .select(col("__u").as(userCol),
        col("t1").as("t_first_us"), col(s"t$k").as("t_final_us"),
        (col(s"t$k") - col("t1")).as("latency_us"))
  }

  /** ONE-shuffle deep funnel — [[funnel]] for many steps: the k-join
    * form re-scans the event table once per step (fine at 3 steps; a
    * 10-step funnel pays 10 filtered joins), while this form shuffles
    * the events ONCE into per-user groups and runs the whole step
    * recurrence as a single native kernel over each user's collected
    * events ([[graft.plans.FunnelReach]] — the streaming funnel's
    * rescan-on-advance state machine run in batch, so equal-timestamp
    * chains and repeated step types match [[funnel]] exactly; the spec
    * pins the equivalence). Per-step counts then fall out of a
    * ≤|steps|-row reach histogram: a user with reach r counts for every
    * step ≤ r, so `n_users(k) = Σ_{r ≥ k} hist(r)` — metadata-sized.
    *
    * Memory note: a user's whole event list materializes in one task
    * (bounded by the busiest user, not the corpus — the
    * collect_list-per-key contract); the k-join [[funnel]] keeps
    * per-user state at one row per step and remains the right form when
    * single users have pathological event counts.
    *
    * @return (step, event_type, n_users) — identical contract to
    *         [[funnel]], monotonically non-increasing
    */
  def funnelDeep(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, steps: Seq[String],
                 windowUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowUs >= 0, s"windowUs must be non-negative: $windowUs")
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events.select(col(userCol).as("__u"),
      unix_micros(col(tsCol)).as("__us"), col(typeCol).as("__t"))
    val hist = ev.groupBy(col("__u"))
      .agg(collect_list(struct(col("__us"), col("__t"))).as("__evs"))
      .select(graft.plans.HashExpressions
        .funnelReach(col("__evs"), steps, windowUs).as("__r"))
      .where(col("__r") >= 1)
      .groupBy(col("__r")).agg(count(lit(1)).as("__n"))
    // k rows × ≤k hist rows: emit every step (zero-count steps included,
    // the funnel contract), n_users(k) = Σ over reaches ≥ k
    val stepTable = spark
      .createDataset(steps.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) })
      .toDF("step", "event_type")
    stepTable.join(broadcast(hist), col("__r") >= col("step"), "left")
      .groupBy(col("step"), col("event_type"))
      .agg(coalesce(sum(col("__n")), lit(0L)).as("n_users"))
  }

  /** Rate-spike detection per event type: bucket counts (exact integer
    * floor division — [[floorBucket]]) compared against the mean of the previous
    * `trailing` OBSERVED buckets of the same type — a bucket spikes when
    * `n · trailing > factor · Σ(prev n)` with a FULL trailing window,
    * written as an integer cross-multiplication so no float ever enters
    * the decision (bit-exact across engines by construction). The
    * observed-bucket frame (SQL `ROWS BETWEEN trailing PRECEDING AND 1
    * PRECEDING`) is the documented semantic: silent gaps don't dilute
    * the baseline, they simply aren't rows.
    *
    * Shuffle profile: one (type, bucket) count with map-side partials —
    * the only data-sized stage; the window runs over the bucket-grained
    * table (metadata-sized: time-range/bucketUs rows per type).
    *
    * @return (event_type, bucket, n, spike)
    */
  def rateSpikes(events: DataFrame, tsCol: String, typeCol: String,
                 bucketUs: Long, trailing: Int, factor: Long): DataFrame = {
    require(bucketUs >= 1 && trailing >= 1 && factor >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(-trailing, -1)
    events
      .select(col(typeCol).as("event_type"),
        floorBucket(tsCol, bucketUs).as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("n"))
      .withColumn("__prev_sum", sum(col("n")).over(w))
      .withColumn("__prev_cnt", count(col("n")).over(w))
      .select(col("event_type"), col("bucket"), col("n"),
        (col("__prev_cnt") === trailing &&
          col("n") * trailing > lit(factor) * col("__prev_sum")).as("spike"))
  }

  /** Cohort retention: users cohort by the UTC day of their first event
    * (`epoch_us div 86'400'000'000` — exact integer division), and each
    * (cohort_day, day_offset) row counts the distinct users of that
    * cohort active `day_offset` days later (offset 0 = the cohort day
    * itself, so it equals the cohort size).
    *
    * Shuffle profile: one (user)-keyed MIN for the cohort, one distinct
    * over (user, offset) pairs (≤ users × active-days, with map-side
    * partials), one (cohort, offset)-keyed count. Exact integers only.
    */
  def retention(events: DataFrame, userCol: String,
                tsCol: String): DataFrame = {
    val usPerDay = 86400000000L
    // exact integer floor division (never the double `/`)
    val ev = events.select(col(userCol).as("__u"),
      floorBucket(tsCol, usPerDay).as("__d"))
    val first = ev.groupBy(col("__u")).agg(min(col("__d")).as("__d0"))
    ev.join(first, "__u")
      .select(col("__u"), col("__d0"), (col("__d") - col("__d0")).as("__off"))
      .distinct()
      .groupBy(col("__d0").as("cohort_day"), col("__off").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Cohort LTV curve — [[retention]]'s value-weighted sibling: per
    * (cohort day, day offset), the number of active users, that day's
    * total value, and the cohort's CUMULATIVE value through that offset
    * (the lifetime-value curve "how much has the Jan-3 cohort produced
    * by day k"). Value sums accumulate in DECIMAL(28,6) (order-free)
    * and only cast to double at the edge, so the curve is
    * engine-reproducible; null- and NaN-value events count as activity
    * with value 0 (NaN gated before the cast — never a silent
    * cast-to-null), null-ts events have no day, and null-USER events
    * have no cohort to belong to — both excluded (the stickiness
    * convention).
    *
    * Shuffle profile: one user-keyed MIN (cohort assignment, map-side
    * partials), one (cohort, offset)-keyed aggregation, and the cumsum
    * window runs over the AGGREGATED (cohort, offset) grid — metadata-
    * sized (cohorts × horizon), partitioned by cohort, never the event
    * stream.
    */
  def cohortValue(events: DataFrame, userCol: String, tsCol: String,
                  valueCol: String): DataFrame = {
    val usPerDay = 86400000000L
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    // NaN AND out-of-range magnitudes are gated explicitly BEFORE the
    // decimal cast: a non-ANSI cast silently turns NaN or a |v| ≥ 10²²
    // double into null → coalesce 0 — undocumented data loss the oracle
    // (which errors on the cast) would expose as a parity break. Gated
    // rows contribute 0 by the SAME rule on both engines; the bound is
    // DECIMAL(28,6)'s integral capacity (22 digits).
    val vSafe = when(!isnan(col(valueCol)) && abs(col(valueCol)) < lit(1e22),
      col(valueCol)).cast(dec)
    val ev = events.where(col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        floorBucket(tsCol, usPerDay).as("__d"),
        coalesce(vSafe, lit(0).cast(dec)).as("__v"))
    val first = ev.groupBy(col("__u")).agg(min(col("__d")).as("__d0"))
    val grid = ev.join(first, "__u")
      .groupBy(col("__d0").as("cohort_day"),
        (col("__d") - col("__d0")).as("day_offset"))
      .agg(countDistinct(col("__u")).as("n_users"),
        sum(col("__v")).as("__day_v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_day")).orderBy(col("day_offset"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    grid.select(col("cohort_day"), col("day_offset"), col("n_users"),
      col("__day_v").cast("double").as("day_value"),
      sum(col("__day_v")).over(w).cast("double").as("cum_value"))
  }

  /** Engagement stickiness (DAU/MAU): per observed day, the distinct
    * active users that day, the distinct users active in the trailing
    * `windowDays` window, and their ratio as exact floor
    * parts-per-million — the classic product-engagement ratio with no
    * float in the output. Early days report the honest partial-history
    * MAU (the window is "last `windowDays` days of available data",
    * not padded). Null-user or null-ts events are excluded (an
    * anonymous event has no user to be sticky).
    *
    * Scale shape: a sliding DISTINCT is the naive trap here (a 30-day
    * distinct window over raw events re-scans each day 30×); instead
    * the (user, day) activity table dedups ONCE, each user-day
    * explodes to the ≤`windowDays` future days it supports (a bounded
    * ×window blowup of the already-deduped activity table, NOT the
    * event stream), and MAU falls out of one (user, day)-keyed dedup +
    * count. Every stage is an aggregation on small keys.
    */
  def stickiness(events: DataFrame, userCol: String, tsCol: String,
                 windowDays: Int = 30): DataFrame = {
    require(windowDays >= 1, s"windowDays must be positive: $windowDays")
    val usPerDay = 86400000000L
    val ud = events
      .where(col(tsCol).isNotNull && col(userCol).isNotNull)
      .select(col(userCol).as("__u"),
        floorBucket(tsCol, usPerDay).as("__d"))
      .distinct()
    val dau = ud.groupBy(col("__d").as("day")).agg(count(lit(1)).as("dau"))
    val mau = ud
      .select(col("__u"), explode(sequence(col("__d"),
        col("__d") + lit(windowDays - 1))).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("mau"))
    dau.join(mau, "day")
      .select(col("day"), col("dau"), col("mau"),
        expr(Stats.ppmSql("dau", "mau")).as("stickiness_ppm"))
  }

  /** Last-touch attribution: for every conversion event, the most recent
    * preceding touch event by the same user within `windowUs` — the
    * marketing-analytics primitive behind "which channel gets credit".
    * Returns one row per conversion: (event_id, user, touch_type,
    * touch_event, gap_us), with `touch_type = 'none'` (null touch
    * columns) when no in-window touch precedes it.
    *
    * One user-keyed window pass over the stream — no per-conversion
    * joins, no self-join: the candidate touch rides along as a running
    * `max(struct(ts, event_id, type))` over the preceding frame
    * (struct ordering is lexicographic, so "latest ts, ties to highest
    * event id" is exactly the struct max — integer-exact, no floats).
    * Strictly-preceding RANGE frame (`RANGE … 1 PRECEDING` on the
    * microsecond timestamp), so a conversion at the same microsecond
    * as a touch does NOT attribute to it — same-instant causality is
    * not causality. A RANGE frame (not ROWS) matters twice here: a
    * same-instant touch is excluded even when it sorts as a preceding
    * row, and it cannot shadow an earlier in-window touch that should
    * get the credit.
    */
  def lastTouchAttribution(events: DataFrame, userCol: String, tsCol: String,
                           typeCol: String, touchTypes: Seq[String],
                           convType: String, windowUs: Long,
                           eventIdCol: String = "event_id"): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(windowUs > 0, s"window must be positive: $windowUs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(expr(s"unix_micros($tsCol)").asc)
      .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val touch = max(when(col(typeCol).isin(touchTypes: _*),
      struct(expr(s"unix_micros($tsCol)").as("us"),
        col(eventIdCol).as("eid"), col(typeCol).as("et")))).over(w)
    val inWindow = col("__touch").isNotNull &&
      (expr(s"unix_micros($tsCol)") - col("__touch.us")) <= windowUs
    events.withColumn("__touch", touch)
      .where(col(typeCol) === convType)
      .select(col(eventIdCol).as("event_id"), col(userCol).as("user_id"),
        when(inWindow, col("__touch.et")).otherwise("none").as("touch_type"),
        when(inWindow, col("__touch.eid")).as("touch_event"),
        when(inWindow,
          expr(s"unix_micros($tsCol)") - col("__touch.us")).as("gap_us"))
  }

  /** Linear interpolation over a bucketed per-key time series — the
    * gap-filling rule `x_resample`'s forward-fill can't express: a
    * missing bucket strictly between two observed ones takes
    * `v_prev + (v_next − v_prev) · (t − t_prev)/(t_next − t_prev)`.
    * Input is one row per OBSERVED (key, bucket) with `bucketCol` an
    * integer grid index (bucket timestamps first: `unix_micros(ts) div
    * step`) — integer buckets keep every time difference exact.
    *
    * Returns the full per-key grid [min bucket, max bucket] × step 1:
    * (key, bucket, v, kind) with kind `obs` (value passed through
    * untouched — never re-derived from the formula) or `interp`.
    * Leading/trailing buckets outside the observed span don't exist by
    * construction (the grid starts/ends at observations), so there is
    * no extrapolation rule to get wrong.
    *
    * Determinism: the formula is int64→double conversions, one divide,
    * one multiply, one add — all IEEE-correctly-rounded, so any engine
    * reproduces the bits ([[Corpus.pmiTopK]]'s no-transcendentals
    * discipline).
    *
    * Scale shape: ONE key-keyed window pass (a single `lead`) turns the
    * observations into consecutive-pair SEGMENTS, and each segment
    * explodes its own half-open bucket range `[t, next_t)` (the last
    * observation emits itself) — no grid join, no second sort, no
    * re-scan of the upstream. This replaced a grid-aggregate + outer
    * join + two neighbor-carry window passes (4 exchanges, upstream
    * evaluated twice) that measured 5.4 s at sf0.1 where this form
    * needs one exchange. Dense-gap caveat: a key whose span is huge but
    * observations sparse still materializes its full grid; bound the
    * bucket width accordingly.
    *
    * Null values are NOT observations: they are excluded up front (a
    * null can't anchor a line), so the grid spans the first to last
    * NON-NULL bucket per key. Input carries one row per (key, bucket)
    * (the contract — it comes from an aggregation).
    *
    * `maxGapBuckets` caps how long a gap may be bridged: a missing
    * bucket whose surrounding observations are further than
    * `maxGapBuckets` apart keeps a NULL value with kind `gap` — a
    * sensor that was silent for a week has no line worth drawing
    * through the outage. Default bridges everything.
    */
  def interpolate(df: DataFrame, keyCol: String, bucketCol: String,
                  valCol: String,
                  maxGapBuckets: Long = Long.MaxValue): DataFrame = {
    require(maxGapBuckets >= 2, s"a bridgeable gap spans >= 2 buckets: $maxGapBuckets")
    val obs = df.select(col(keyCol).as("__k"),
        col(bucketCol).cast("long").as("__t"),
        col(valCol).cast("double").as("__v"))
      .where(col("__t").isNotNull && col("__v").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k")).orderBy(col("__t").asc)
    val seg = obs.select(col("__k"), col("__t"), col("__v"),
      lead(col("__t"), 1).over(w).as("__nt"),
      lead(col("__v"), 1).over(w).as("__nv"))
    val bridgeable = (col("__nt") - col("__t")) <= maxGapBuckets
    // greatest(..) guards a duplicate (key, bucket) input row (nt == t)
    // from Spark's descending-sequence surprise — it re-emits the
    // observation instead of fabricating [t, t−1]
    seg
      .select(col("__k"), col("__t"), col("__v"), col("__nt"), col("__nv"),
        explode(sequence(col("__t"),
          greatest(coalesce(col("__nt") - 1, col("__t")), col("__t"))))
          .as("__tt"))
      .select(col("__k").as(keyCol), col("__tt").as(bucketCol),
        when(col("__tt") === col("__t"), col("__v"))
          .when(bridgeable,
            col("__v") + (col("__nv") - col("__v")) *
              ((col("__tt") - col("__t")).cast("double") /
                (col("__nt") - col("__t")).cast("double"))).as(valCol),
        when(col("__tt") === col("__t"), lit("obs"))
          .when(bridgeable, lit("interp"))
          .otherwise(lit("gap")).as("kind"))
  }

  /** Gap-based sessionization as a per-SESSION table: consecutive
    * events of a user belong to one session while the gap stays ≤
    * `gapUs`; a longer gap opens the next session. Returns one row per
    * session — (user, session_seq (1-based), start_us, end_us,
    * n_events, duration_us) — the table session-level metrics (bounce
    * rate, dwell time, sessions/user) aggregate from.
    *
    * Exact integer microseconds throughout (the r_sessionize
    * discipline); event order per user is (unix_micros, eventIdCol).
    *
    * Scale shape: one user-keyed window pass marks session starts
    * (lag + running sum in the same sorted frame), then a
    * (user, session)-keyed aggregation with map-side partials — both
    * exchanges key on the user, nothing global.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gapUs: Long, eventIdCol: String = "event_id"): DataFrame = {
    require(gapUs > 0, s"gap must be positive: $gapUs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user"))
      .orderBy(col("__us").asc, col(eventIdCol).asc)
    events
      .select(col(userCol).as("user"), col(eventIdCol),
        expr(s"unix_micros($tsCol)").as("__us"))
      .where(col("__us").isNotNull)
      .withColumn("__new",
        when(col("__us") - lag(col("__us"), 1).over(w) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)) + 1L)
      .groupBy(col("user"), col("session_seq"))
      .agg(min(col("__us")).as("start_us"), max(col("__us")).as("end_us"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** k-step path census — [[transitionCounts]] generalized to sliding
    * windows of `k` CONSECUTIVE events per user: "which 3-step journeys
    * actually happen, and how often" (the sequence-mining census behind
    * funnel design and anomaly triage). A path is the '>'-joined type
    * sequence; every length-k window of a user's (ts, id)-ordered
    * stream counts once; paths below `minCount` are dropped.
    *
    * Scale shape: one user-keyed window pass building the k-lag chain
    * (k small-constant lags over one sorted frame, no self-joins), then
    * a path-keyed aggregation with map-side partials — the exchange
    * carries distinct paths per partition, bounded by min(#types^k,
    * partition rows); `minCount` is the tail guard at large k.
    */
  def pathCounts(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, k: Int, minCount: Long = 1L,
                 eventIdCol: String = "event_id"): DataFrame = {
    require(k >= 2, s"paths need at least 2 steps: $k")
    require(minCount >= 1, s"minCount must be positive: $minCount")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(expr(s"unix_micros($tsCol)").asc, col(eventIdCol).asc)
    val steps = (k - 1 to 0 by -1).map(j =>
      if (j == 0) col(typeCol) else lag(col(typeCol), j).over(w))
    events
      .where(expr(s"unix_micros($tsCol)").isNotNull)
      .select(concat_ws(">", steps: _*).as("path"),
        steps.map(_.isNotNull).reduce(_ && _).as("__full"))
      .where(col("__full"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
  }

  /** Linear (multi-touch) attribution — [[lastTouchAttribution]]'s
    * winner-take-all rule replaced by equal credit over EVERY strictly-
    * preceding in-window touch: one row per (conversion, touch) with
    * `n_touches` alongside, so each touch's credit is the exact
    * rational `1 / n_touches` (consumer-side — no float share in the
    * output). Conversions with no in-window touch emit one row with
    * null touch columns and `n_touches = 0`. Same gates as last-touch:
    * strict precedence (a same-microsecond touch earns nothing),
    * inclusive window boundary.
    *
    * Scale shape: this is a per-user RANGE join, executed as the
    * binned equi-join (the [[graft.operators.RangeJoin]] recipe with
    * the user key folded into the join key): touches land in one
    * `windowUs`-wide time bin each, conversions explode over the ≤ 2
    * bins their window covers, the join keys on (user, bin), and the
    * exact time gate prunes the candidates. Never a per-user cross
    * join; per-conversion fan-out is bounded by the touches actually
    * in its window. The `n_touches` count rides a conversion-keyed
    * window over the (already window-bounded) pair stream.
    */
  def linearAttribution(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, touchTypes: Seq[String],
                        convType: String, windowUs: Long,
                        eventIdCol: String = "event_id"): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(windowUs > 0, s"window must be positive: $windowUs")
    val us = expr(s"unix_micros($tsCol)")
    // integer `div`, not `/`: Spark's `/` on longs is a DOUBLE divide,
    // exact only below 2^53 (the Compaction.plan trap) — the subtraction
    // makes the dividend exactly divisible, pmod floors for any sign
    // (the floorBucket discipline, here over a shiftable expression)
    def binOf(v: String): Column =
      expr(s"(($v) - pmod(($v), ${windowUs}L)) div ${windowUs}L")
    val touches = events.where(col(typeCol).isin(touchTypes: _*) && us.isNotNull)
      .select(col(userCol).as("__u"), us.as("__ut"),
        col(eventIdCol).as("touch_event"), col(typeCol).as("touch_type"))
      .withColumn("__bin", binOf("__ut"))
    val convs = events.where(col(typeCol) === convType && us.isNotNull)
      .select(col(userCol).as("__u"), us.as("__uc"),
        col(eventIdCol).as("event_id"))
    val cb = convs.withColumn("__bin",
      explode(sequence(binOf(s"__uc - ${windowUs}L"), binOf("__uc - 1L"))))
    val pairs = cb.join(touches, Seq("__u", "__bin"))
      .where(col("__ut").between(col("__uc") - windowUs, col("__uc") - 1))
      .select(col("event_id"), col("touch_event"), col("touch_type"),
        (col("__uc") - col("__ut")).as("gap_us"))
    val n = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id"))
    convs.select(col("event_id"), col("__u").as("user_id"))
      .join(pairs.withColumn("n_touches", count(lit(1)).over(n)),
        Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("touch_event"),
        col("touch_type"), col("gap_us"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"))
  }

  /** First-order Markov transition census over per-user event sequences:
    * for every ordered pair of event types, how often does `from`
    * immediately precede `to` in some user's stream — the behavioral
    * transition matrix behind next-action prediction, anomaly scoring
    * ("this session's transitions are improbable") and funnel design
    * (which steps users ACTUALLY take, vs the ones we hypothesized).
    *
    * Returns (from_type, to_type, n, n_from): `n` transitions observed,
    * `n_from` = total transitions leaving `from_type` — so the MLE
    * transition probability is the exact rational n / n_from, left to
    * the consumer (no float in the output; the [[Corpus.pmiTopK]]
    * exactness discipline).
    *
    * Sequence order is (unix_micros(ts), eventIdCol) per user — the
    * attribution tiebreak, so equal-timestamp events have one
    * well-defined order on any engine. Null-timestamp events have no
    * position in time and are excluded (the convention across this
    * family: pathCounts, sessionize, attribution).
    *
    * Scale shape: ONE user-keyed window pass (lag) over the stream,
    * then an aggregation whose exchange carries (type, type) pairs
    * after map-side partials — at most #types² rows per partition, no
    * matter the event volume; the `n_from` rollup is a #types²-sized
    * window over the aggregated table, not the stream.
    */
  def transitionCounts(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String,
                       eventIdCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(expr(s"unix_micros($tsCol)").asc, col(eventIdCol).asc)
    val counts = events
      .where(expr(s"unix_micros($tsCol)").isNotNull)
      .select(col(typeCol).as("to_type"),
        lag(col(typeCol), 1).over(w).as("from_type"))
      .where(col("from_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    counts.withColumn("n_from",
      sum(col("n")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("from_type"))))
  }

  /** Per-key exact least-squares trend: the slope of `valueCol` against
    * an integer bucket index `xCol`, emitted as an EXACT RATIONAL —
    * `slope_num / slope_den` where `num = n·Σxy − Σx·Σy` and
    * `den = n·Σx² − (Σx)²` — plus the raw sums the caller can derive
    * intercept/R² from ("is this user's spend rising", "is this
    * source's quality drifting", per key, no float in the output). The
    * value is scaled to exact integer micro-units first
    * (`floor(value·10⁶)` — one IEEE multiply + floor both engines
    * reproduce bit-for-bit, the calibrateScores convention), so every
    * aggregate and the num/den products are integer arithmetic in
    * DECIMAL(38,0) — nothing rounds, order never matters. `slope_num`
    * is therefore in micro-value units per bucket. Overflow contract:
    * the num/den products stay exact while `2·n²·X·Y < 10³⁸` per key
    * (X = max |x|, Y = max |y_micro|) — e.g. hour-bucket x (X ≈ 10⁴)
    * and 10³-scale values (Y ≈ 10⁹) are safe beyond 10⁹ points/key;
    * past the bound Spark's non-ANSI decimal returns NULL slope
    * columns (visible, never silently wrong). `slope_den` ≥ 0,
    * and 0 ⇔ all of a key's points share one bucket (slope undefined;
    * the row still reports its sums). Null x and null/NaN value rows
    * are excluded (they have no position on either axis — and a NaN
    * that passed the gate would count into `n` while its micro-unit
    * cast nulls out of every sum, silently skewing the slope).
    *
    * Scale shape: ONE key-keyed aggregation with map-side partials —
    * the exchange carries 6 numbers per key, never points.
    */
  def trendStats(df: DataFrame, keyCol: String, xCol: String,
                 valueCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val x = col(xCol).cast("long").cast(d38)
    val y = floor(col(valueCol) * lit(1000000.0)).cast("long").cast(d38)
    // |v| ≤ 9.2e12 gates the micro-unit long cast the same way NaN is
    // gated: beyond it floor(v·10⁶) exceeds int64 and the non-ANSI cast
    // nulls — the row would count into n while dropping out of every
    // sum, silently skewing the slope. Excluded rows are excluded from
    // n too, and streamingTrend applies the identical rule so batch and
    // streaming state stay row-for-row equivalent.
    df.where(col(xCol).isNotNull && col(valueCol).isNotNull &&
        !isnan(col(valueCol)) && abs(col(valueCol)) <= lit(9.2e12))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(x).cast(d38).as("sum_x"),
        sum(y).cast(d38).as("sum_y_micro"),
        sum(x * y).cast(d38).as("sum_xy_micro"),
        sum(x * x).cast(d38).as("sum_xx"))
      .select(col(keyCol), col("n"), col("sum_x"), col("sum_y_micro"),
        col("sum_xy_micro"), col("sum_xx"),
        (col("n").cast(d38) * col("sum_xy_micro") -
          col("sum_x") * col("sum_y_micro")).cast(d38).as("slope_num"),
        (col("n").cast(d38) * col("sum_xx") -
          col("sum_x") * col("sum_x")).cast(d38).as("slope_den"))
  }

  /** Market-basket association pairs: for every unordered item pair
    * co-occurring in at least `minSupport` baskets, the exact counts an
    * association rule is made of — `pair_n` (baskets containing both),
    * `a_n`/`b_n` (baskets containing each), `n_baskets` (total), and
    * both directed confidences in exact parts-per-million (floor of the
    * rational — integer arithmetic only, so cross-engine bit parity is
    * structural; lift = pair_n·n_baskets / (a_n·b_n) is left to the
    * caller's precision since its product can exceed 64 bits at fleet
    * scale). Pairs are canonical (`item_a` < `item_b`); multiplicity
    * within a basket never double-counts (presence, not quantity).
    *
    * Scale shape: pair generation is a SELF-EQUI-JOIN on the basket key
    * — never an item cross product — so its fan-out per basket is
    * C(size, 2). That makes one pathological mega-basket (a crawl
    * session with 10⁴ items) a quadratic bomb, which is why
    * `maxBasketSize` is a first-class guard: basket sizes are counted
    * first (one aggregation) and oversized baskets are dropped from
    * pair generation AND from the per-item/total denominators, keeping
    * the emitted confidences exactly consistent with the mined
    * universe. The `minSupport` filter prunes the long pair tail before
    * the per-item count join, so the join input is the surviving pairs,
    * not every pair ever seen. All shuffles key on basket or item ids.
    *
    * @return (item_a, item_b, pair_n, a_n, b_n, n_baskets,
    *         conf_ab_ppm, conf_ba_ppm)
    */
  def associationPairs(df: DataFrame, basketCol: String, itemCol: String,
                       minSupport: Long = 2L,
                       maxBasketSize: Int = 1000): DataFrame = {
    require(minSupport >= 1, s"minSupport must be positive: $minSupport")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2: $maxBasketSize")
    val m = df.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .where(col("__bk").isNotNull && col("__it").isNotNull)
      .distinct()
    val sized = m.groupBy(col("__bk")).agg(count(lit(1)).as("__sz"))
      .where(col("__sz") <= maxBasketSize)
      .select(col("__bk"))
    // the mining universe feeds FOUR consumers (both self-join sides,
    // the per-item counts, the basket total) — snapshot it once so the
    // upstream distinct + size guard don't replay per consumer (the
    // dbscan pair-pipeline discipline; measured 5.2 s → the join cost
    // alone at sf0.1)
    val kept = Snapshots.snapshot(m.join(sized, Seq("__bk"), "left_semi"))
    val itemN = kept.groupBy(col("__it")).agg(count(lit(1)).as("__in"))
    val total = kept.select(col("__bk")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val pairs = kept.as("l").join(kept.as("r"),
        col("l.__bk") === col("r.__bk") && col("l.__it") < col("r.__it"))
      .groupBy(col("l.__it").as("item_a"), col("r.__it").as("item_b"))
      .agg(count(lit(1)).as("pair_n"))
      .where(col("pair_n") >= minSupport)
    pairs
      .join(itemN.select(col("__it").as("item_a"), col("__in").as("a_n")),
        Seq("item_a"))
      .join(itemN.select(col("__it").as("item_b"), col("__in").as("b_n")),
        Seq("item_b"))
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("pair_n"),
        col("a_n"), col("b_n"), col("n_baskets"),
        expr(Stats.ppmSql("pair_n", "a_n")).as("conf_ab_ppm"),
        expr(Stats.ppmSql("pair_n", "b_n")).as("conf_ba_ppm"))
  }

  /** Consecutive same-type event streaks per user — the classic
    * gaps-and-islands decomposition (`row_number() − row_number()
    * within type` is constant exactly along a run): per (user, type),
    * the longest run, the run count, and the total events. The
    * engagement/abuse read: a 400-long `error` streak is an outage, a
    * 400-long `click` streak is a bot — signals a plain count per type
    * cannot see because it ignores adjacency.
    *
    * Ordering is pinned on (`tsCol`, `idCol`) so ties cannot flip
    * islands between engines. Exact integers end-to-end. Shuffle
    * profile: two windows over the SAME user-keyed partitioning (one
    * exchange — the second window partitions on (user, type), a
    * refinement Catalyst satisfies without re-exchanging), one
    * island-keyed count, one (user, type) rollup.
    *
    * @return (userCol, typeCol, n_events, n_streaks, max_streak)
    */
  def streaks(events: DataFrame, userCol: String, tsCol: String,
              typeCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val wt = Window.partitionBy(col(userCol), col(typeCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    events
      .select(col(userCol), col(typeCol), col(tsCol), col(idCol))
      .withColumn("__island",
        row_number().over(w) - row_number().over(wt))
      .groupBy(col(userCol), col(typeCol), col("__island"))
      .agg(count(lit(1)).as("__len"))
      .groupBy(col(userCol), col(typeCol))
      .agg(sum(col("__len")).as("n_events"),
        count(lit(1)).as("n_streaks"),
        max(col("__len")).as("max_streak"))
  }

  /** Per-key CUSUM changepoint scan (Page 1954): within each key, the
    * running sum of deviations from the key's own mean,
    * `S_i = Σ_{j≤i}(v_j − v̄)`, peaks in magnitude AT the level-shift
    * point — the localization step after a drift DETECTOR
    * (histogramDrift, trendStats) says "something moved". Reports the
    * peak |S|, where it happened, and the normalized
    * `range = (max S − min S)` diagnostics.
    *
    * Determinism: the per-key mean is a DECIMAL(28,9) sum with ONE
    * double divide; the running sum adds doubles in the PINNED
    * (`tsCol`, `idCol`) order, so both engines execute the identical
    * float sequence (the r_window_running discipline); the argmax row
    * is row_number 1 under (|S| desc, ts asc, id asc). Null/NaN
    * values are excluded before the mean so they cannot poison S.
    *
    * Shuffle profile: one key-keyed mean rollup broadcast back, one
    * window over the key partitioning, one argmax filter. Each key's
    * series must fit a window partition — the per-user event-history
    * assumption sessionize already makes.
    *
    * @return (userCol, n, cusum_peak, peak_ts, cusum_range)
    */
  def cusumScan(events: DataFrame, userCol: String, tsCol: String,
                valueCol: String, idCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 9)
    val base = events.select(col(userCol), col(tsCol), col(idCol),
        col(valueCol).cast("double").as("__v"))
      .where(col("__v").isNotNull && !isnan(col("__v")))
    val means = base.groupBy(col(userCol))
      .agg((sum(col("__v").cast(dec)).cast("double") /
        count(lit(1)).cast("double")).as("__mean"),
        count(lit(1)).as("n"))
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scanned = base.join(means, Seq(userCol))
      .withColumn("__s", sum(col("__v") - col("__mean")).over(w))
    val pick = Window.partitionBy(col(userCol))
      .orderBy(abs(col("__s")).desc, col(tsCol).asc, col(idCol).asc)
    scanned
      .withColumn("__smax", max(col("__s")).over(
        Window.partitionBy(col(userCol))))
      .withColumn("__smin", min(col("__s")).over(
        Window.partitionBy(col(userCol))))
      .withColumn("__rk", row_number().over(pick))
      .where(col("__rk") === 1)
      .select(col(userCol), col("n"),
        round(abs(col("__s")), 9).as("cusum_peak"),
        col(tsCol).as("peak_ts"),
        round(col("__smax") - col("__smin"), 9).as("cusum_range"))
  }
}
