package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class EventsSpec extends SparkSpec {

  private val usPerDay = 86400000000L

  private def ev(rows: Seq[(Long, Long, String)]) = {
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("us", LongType),
      StructField("event_type", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))),
      schema).select(col("user_id"), timestamp_micros(col("us")).as("ts"),
      col("event_type"))
  }

  test("funnel: order matters, window cuts late conversions, counts non-increasing") {
    val events = ev(Seq(
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "purchase"),
      (2L, 0L, "click"), (2L, 10L, "view"), // click BEFORE view: step 2 unreached
      (3L, 0L, "view"), (3L, 200L, "click"), // step 2 outside the window
      (4L, 0L, "purchase"))) // never entered the funnel
    val out = Events.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), windowUs = 100L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "view", 3L), (2L, "click", 1L), (3L, "purchase", 1L)))
  }

  test("funnel: re-converting after the first qualifying event changes nothing") {
    val events = ev(Seq(
      (1L, 0L, "view"), (1L, 5L, "click"), (1L, 7L, "click")))
    val out = Events.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click"), windowUs = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L))
  }

  test("funnelDeep equals funnel: fixture, equal timestamps, repeated step types") {
    // base case: the EventsSpec funnel fixture
    val base = Seq(
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "purchase"),
      (2L, 0L, "click"), (2L, 10L, "view"),
      (3L, 0L, "view"), (3L, 200L, "click"),
      (4L, 0L, "purchase"))
    def both(rows: Seq[(Long, Long, String)], steps: Seq[String], w: Long) = {
      def collect(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
          .sortBy(_._1).toSeq
      (collect(Events.funnel(ev(rows), "user_id", "ts", "event_type", steps, w)),
        collect(Events.funnelDeep(ev(rows), "user_id", "ts", "event_type", steps, w)))
    }
    val (f1, d1) = both(base, Seq("view", "click", "purchase"), 100L)
    assert(d1 == f1)
    // equal timestamps: click shares step-2's timestamp AND sorts before
    // "view"; a single greedy pass would consume it too early — user 1
    // completes in the batch semantics (>= is inclusive)
    val eq = Seq((1L, 5L, "view"), (1L, 5L, "click"),
      (2L, 3L, "click"), (2L, 4L, "view"))
    val (f2, d2) = both(eq, Seq("view", "click"), 100L)
    assert(d2 == f2 && f2 == Seq((1L, "view", 2L), (2L, "click", 1L)))
    // repeated step type: ONE view event satisfies both view steps (the
    // same-event inclusive recurrence); user 2 needs no second view
    val rep = Seq((1L, 5L, "view"), (1L, 9L, "click"),
      (2L, 1L, "view"), (2L, 2L, "view"), (2L, 3L, "click"))
    val (f3, d3) = both(rep, Seq("view", "view", "click"), 100L)
    assert(d3 == f3 && f3.map(_._3) == Seq(2L, 2L, 2L))
    // a 5-step funnel (the deep form's home turf) with a mid-window cut
    val deep = Seq(
      (1L, 0L, "a"), (1L, 1L, "b"), (1L, 2L, "c"), (1L, 3L, "d"), (1L, 4L, "e"),
      (2L, 0L, "a"), (2L, 1L, "b"), (2L, 2L, "c"), (2L, 90L, "d"), (2L, 300L, "e"))
    val (f4, d4) = both(deep, Seq("a", "b", "c", "d", "e"), 100L)
    assert(d4 == f4 && f4.map(_._3) == Seq(2L, 2L, 2L, 2L, 1L))
  }

  test("rateSpikes: full trailing window required, integer predicate, gaps skipped") {
    val perBucket = Seq(1, 1, 1, 1, 1, 1, 10) // bucket 6 spikes
    val rows = perBucket.zipWithIndex.flatMap { case (n, b) =>
      (0 until n).map(i => (1L, b * 1000L + i, "click"))
    } ++ Seq((2L, 0L, "view"), (2L, 9000L, "view")) // gappy type: never full window
    val out = Events.rateSpikes(ev(rows), "ts", "event_type",
      bucketUs = 1000L, trailing = 6, factor = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(("click", 6L)) == ((10L, true)))
    assert(out(("click", 5L)) == ((1L, false))) // only 5 prior buckets
    assert(out(("view", 9L))._2 == false)       // observed-frame count 1 < 6
  }

  test("retention: cohort by first-event day, same-day repeats collapse") {
    val events = ev(Seq(
      (1L, 100L * usPerDay + 5L, "view"),
      (1L, 100L * usPerDay + 9L, "click"),  // same day: counts once
      (1L, 102L * usPerDay + 1L, "view"),
      (2L, 101L * usPerDay + 2L, "view")))
    val out = Events.retention(events, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (100L, 0L) -> 1L, (100L, 2L) -> 1L, (101L, 0L) -> 1L))
  }

  private def evId(rows: Seq[(Long, Long, Long, String)]) = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("us", LongType), StructField("event_type", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3, r._4))),
      schema).select(col("event_id"), col("user_id"),
      timestamp_micros(col("us")).as("ts"), col("event_type"))
  }

  test("interpolate: exact line between observations, obs pass through, spans per key") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("t", LongType), StructField("v", DoubleType)))
    val obs = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      // key 1: observed at 10 (1.0) and 14 (9.0) → 11,12,13 on the line
      Row(1L, 10L, 1.0), Row(1L, 14L, 9.0),
      // key 2: single observation → just itself
      Row(2L, 5L, 4.5),
      // key 3: flat segment and a second slope
      Row(3L, 0L, 2.0), Row(3L, 2L, 2.0), Row(3L, 3L, 8.0))), schema)
    val got = Events.interpolate(obs, "k", "t", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getString(3))).toMap
    assert(got == Map(
      (1L, 10L) -> (1.0, "obs"), (1L, 11L) -> (3.0, "interp"),
      (1L, 12L) -> (5.0, "interp"), (1L, 13L) -> (7.0, "interp"),
      (1L, 14L) -> (9.0, "obs"),
      (2L, 5L) -> (4.5, "obs"),
      (3L, 0L) -> (2.0, "obs"), (3L, 1L) -> (2.0, "interp"),
      (3L, 2L) -> (2.0, "obs"), (3L, 3L) -> (8.0, "obs")))
  }

  test("linearAttribution: every in-window touch credited equally, edges match lastTouch") {
    val events = evId(Seq(
      // user 1: two touches in window + one same-instant (excluded) +
      // one outside the window
      (1L, 1L, 0L, "click"), (2L, 1L, 60L, "view"), (3L, 1L, 150L, "click"),
      (4L, 1L, 150L, "purchase"),
      // user 2: no touches at all
      (5L, 2L, 9L, "purchase"),
      // user 3: boundary gap == windowUs attributes
      (6L, 3L, 0L, "view"), (7L, 3L, 100L, "purchase")))
    val got = Events.linearAttribution(events, "user_id", "ts", "event_type",
        Seq("click", "view"), "purchase", windowUs = 100L)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(5)))
      .toSet
    // conversion 4 (us=150, window [50,149]): touch 2 only (touch 1 at 0
    // is outside, touch 3 same-instant excluded) → n=1
    assert(got == Set(
      (4L, Some(2L), 1L), (5L, None, 0L), (7L, Some(6L), 1L)))
    // a conversion with BOTH touches in window splits credit: n=2 rows
    val events2 = evId(Seq(
      (1L, 1L, 10L, "click"), (2L, 1L, 20L, "view"), (3L, 1L, 50L, "purchase")))
    val both = Events.linearAttribution(events2, "user_id", "ts", "event_type",
        Seq("click", "view"), "purchase", windowUs = 100L)
      .collect().map(r => (r.getLong(2), r.getLong(4), r.getLong(5))).toSet
    assert(both == Set((1L, 40L, 2L), (2L, 30L, 2L)))
  }

  test("sessionize: gap boundary inclusive, tie order, per-session aggregates") {
    val g = 100L
    val events = evId(Seq(
      // user 1: gap exactly g stays in session; g+1 opens session 2
      (1L, 1L, 0L, "a"), (2L, 1L, 100L, "b"), (3L, 1L, 201L, "c"),
      (4L, 1L, 250L, "d"),
      // user 2: single event
      (5L, 2L, 7L, "a"),
      // user 3: same-ts events collapse into one session regardless of id order
      (6L, 3L, 50L, "a"), (7L, 3L, 50L, "b"), (8L, 3L, 400L, "c")))
    val got = Events.sessionize(events, "user_id", "ts", gapUs = g)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == Map(
      (1L, 1L) -> (0L, 100L, 2L, 100L),
      (1L, 2L) -> (201L, 250L, 2L, 49L),
      (2L, 1L) -> (7L, 7L, 1L, 0L),
      (3L, 1L) -> (50L, 50L, 2L, 0L),
      (3L, 2L) -> (400L, 400L, 1L, 0L)))
  }

  test("pathCounts: sliding k-windows, cross-user isolation, minCount") {
    val events = evId(Seq(
      // user 1: a b c d → paths abc, bcd
      (1L, 1L, 10L, "a"), (2L, 1L, 20L, "b"), (3L, 1L, 30L, "c"), (4L, 1L, 40L, "d"),
      // user 2: a b c → abc (n=2 with user 1's)
      (5L, 2L, 1L, "a"), (6L, 2L, 2L, "b"), (7L, 2L, 3L, "c"),
      // user 3: only 2 events — no 3-path
      (8L, 3L, 1L, "a"), (9L, 3L, 2L, "b")))
    val got = Events.pathCounts(events, "user_id", "ts", "event_type", k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a>b>c" -> 2L, "b>c>d" -> 1L))
    val filtered = Events.pathCounts(events, "user_id", "ts", "event_type",
        k = 3, minCount = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(filtered == Map("a>b>c" -> 2L))
    // k=2 degenerates to the transition census counts
    val k2 = Events.pathCounts(events, "user_id", "ts", "event_type", k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val trans = Events.transitionCounts(events, "user_id", "ts", "event_type")
      .collect().map(r => s"${r.getString(0)}>${r.getString(1)}" -> r.getLong(2)).toMap
    assert(k2 == trans)
  }

  test("interpolate: maxGapBuckets leaves unbridgeable outages as explicit gaps") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("t", LongType), StructField("v", DoubleType)))
    val obs = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, 0L, 0.0), Row(1L, 2L, 4.0), Row(1L, 10L, 100.0))), schema)
    val got = Events.interpolate(obs, "k", "t", "v", maxGapBuckets = 4L)
      .collect().map(r => r.getLong(1) ->
        ((if (r.isNullAt(2)) None else Some(r.getDouble(2))), r.getString(3)))
      .toMap
    // 0→2 bridges (gap 2 ≤ 4); 2→10 is an outage (gap 8 > 4)
    assert(got(0L) == ((Some(0.0), "obs")))
    assert(got(1L) == ((Some(2.0), "interp")))
    assert(got(2L) == ((Some(4.0), "obs")))
    (3L to 9L).foreach(t => assert(got(t) == ((None, "gap")), s"t=$t"))
    assert(got(10L) == ((Some(100.0), "obs")))
    // default bridges everything
    val all = Events.interpolate(obs, "k", "t", "v")
      .collect().filter(_.getString(3) == "gap")
    assert(all.isEmpty)
  }

  test("transitionCounts: per-user adjacency, tie order by event id, exact rollup") {
    val events = evId(Seq(
      // user 1: a → b → b → c
      (1L, 1L, 10L, "a"), (2L, 1L, 20L, "b"), (3L, 1L, 30L, "b"), (4L, 1L, 40L, "c"),
      // user 2: same-ts pair ordered by event id → a → c, then c → a
      (5L, 2L, 5L, "a"), (6L, 2L, 5L, "c"), (7L, 2L, 9L, "a"),
      // user 3: single event — no transitions
      (8L, 3L, 1L, "b")))
    val got = Events.transitionCounts(events, "user_id", "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      ("a", "b") -> (1L, 2L), ("a", "c") -> (1L, 2L),
      ("b", "b") -> (1L, 2L), ("b", "c") -> (1L, 2L),
      ("c", "a") -> (1L, 1L)))
  }

  test("lastTouchAttribution: latest in-window touch wins, strict precedence, ties by id") {
    val events = evId(Seq(
      // user 1: click@10 then view@20 → purchase@25 credits the view
      (1L, 1L, 10L, "click"), (2L, 1L, 20L, "view"), (3L, 1L, 25L, "purchase"),
      // user 2: touch outside the 100µs window → 'none'
      (4L, 2L, 0L, "click"), (5L, 2L, 200L, "purchase"),
      // user 3: touch at the SAME microsecond as the purchase → not causal
      (6L, 3L, 50L, "click"), (7L, 3L, 50L, "purchase"),
      // user 4: two touches at the same ts → higher event_id breaks the tie
      (8L, 4L, 5L, "click"), (9L, 4L, 5L, "view"), (10L, 4L, 7L, "purchase"),
      // user 5: a prior purchase is NOT a touch
      (11L, 5L, 1L, "purchase"), (12L, 5L, 9L, "purchase"),
      // user 6: window boundary is inclusive (gap == windowUs attributes)
      (13L, 6L, 0L, "view"), (14L, 6L, 100L, "purchase"),
      // user 7: a same-instant touch must not SHADOW the earlier valid one
      (15L, 7L, 40L, "click"), (16L, 7L, 50L, "view"), (17L, 7L, 50L, "purchase")))
    val out = Events.lastTouchAttribution(events, "user_id", "ts", "event_type",
        Seq("click", "view"), "purchase", windowUs = 100L)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
         if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(out == Map(
      3L  -> (("view", Some(2L), Some(5L))),
      5L  -> (("none", None, None)),
      7L  -> (("none", None, None)),
      10L -> (("view", Some(9L), Some(2L))),
      11L -> (("none", None, None)),
      12L -> (("none", None, None)),
      14L -> (("view", Some(13L), Some(100L))),
      17L -> (("click", Some(15L), Some(10L)))))
  }

  test("stickiness: trailing window, dedup within day, partial history honest") {
    val day = 86400000000L
    // user 1 active days 0 and 2 (twice on day 2); user 2 day 2 only;
    // user 3 day 0 only
    val events = ev(Seq(
      (1L, 0L * day + 1L, "a"), (1L, 2L * day + 1L, "a"),
      (1L, 2L * day + 2L, "b"), (2L, 2L * day + 3L, "a"),
      (3L, 0L * day + 9L, "a")))
    val out = Events.stickiness(events, "user_id", "ts", windowDays = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // window 2: day 0 sees {1,3}; day 2's window {1,2} sees only {1,2}
    assert(out == Map(
      0L -> ((2L, 2L, 1000000L)),
      2L -> ((2L, 2L, 1000000L))))
    // window 3: day 2's MAU now reaches day 0 → {1,2,3}, dau still 2
    val w3 = Events.stickiness(events, "user_id", "ts", windowDays = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(w3(2L) == ((2L, 3L, 666666L)))
    assert(w3(0L) == ((2L, 2L, 1000000L)))
  }

  test("day bucketing FLOORS pre-1970 timestamps (no truncate-toward-zero merge)") {
    val day = 86400000000L
    // one event 1µs before epoch, one 1µs after: truncating division
    // would merge both into 'day 0'; flooring keeps them apart
    val events = ev(Seq((1L, -1L, "a"), (1L, 1L, "a"), (2L, -day, "a")))
    val out = Events.retention(events, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // user 1: cohort day −1, offsets 0 (day −1) and 1 (day 0);
    // user 2: exactly at −day → day −1, its own cohort row merges in
    assert(out == Map((-1L, 0L) -> 2L, (-1L, 1L) -> 1L))
  }

  test("cohortValue: cohort by first day, null value is activity, cum exact") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val day = 86400000000L
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("us", LongType),
      StructField("value", DoubleType)))
    val rows = Seq(
      Row(1L, 0L * day + 5L, 10.0), Row(1L, 0L * day + 9L, 2.0),
      Row(1L, 2L * day + 1L, 5.0),
      Row(2L, 2L * day + 2L, 7.0),
      Row(3L, 2L * day + 3L, null), // activity with value 0
      Row(4L, null, 99.0))          // no day: excluded entirely
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
    val out = Events.cohortValue(df, "user_id", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out == Map(
      (0L, 0L) -> ((1L, 12.0, 12.0)),
      (0L, 2L) -> ((1L, 5.0, 17.0)),
      (2L, 0L) -> ((2L, 7.0, 7.0))))
  }

  test("funnelLatency: completers only, window gate, greedy anchor at earliest first step") {
    val events = ev(Seq(
      // user 1: clean chain → latency 20
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "purchase"),
      // user 2: completes but outside the 100µs window
      (2L, 0L, "view"), (2L, 50L, "click"), (2L, 200L, "purchase"),
      // user 3: never purchases
      (3L, 0L, "view"), (3L, 1L, "click"),
      // user 4: a later view would give latency 2, but the funnel
      // anchors at the EARLIEST first step (t1 = 0) → latency 7
      (4L, 0L, "view"), (4L, 5L, "view"), (4L, 6L, "click"),
      (4L, 7L, "purchase")))
    val out = Events.funnelLatency(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowUs = 100L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((0L, 20L, 20L)),
      4L -> ((0L, 7L, 7L))))
  }

  test("trendStats: exact rational slope, one-bucket key degenerates, nulls excluded") {
    val rows = Seq(
      // key 1: perfect line y = x + 1 → slope 1.0 = 1e6 micro/bucket
      (1L, Some(0L), Some(1.0)), (1L, Some(1L), Some(2.0)),
      (1L, Some(2L), Some(3.0)),
      // key 2: all points in one bucket → slope_den 0
      (2L, Some(5L), Some(1.5)), (2L, Some(5L), Some(2.5)),
      // key 3: null x / null value / NaN rows contribute nothing —
      // a NaN past the gate would inflate n while nulling out of sums
      (3L, Some(0L), Some(1.0)), (3L, None, Some(9.0)),
      (3L, Some(1L), None), (3L, Some(2L), Some(Double.NaN)))
    val df = spark.createDataFrame(rows).toDF("k", "x", "v")
    val out = Events.trendStats(df, "k", "x", "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDecimal(6).longValueExact,
          r.getDecimal(7).longValueExact))).toMap
    // key 1: n=3 sx=3 sy=6e6 sxy=8e6 sxx=5 → num = 24e6−18e6, den = 15−9
    assert(out == Map(
      1L -> ((3L, 6000000L, 6L)),
      2L -> ((2L, 0L, 0L)),
      3L -> ((1L, 0L, 0L))))
  }

  test("associationPairs: presence not quantity, canonical pairs, size guard consistent") {
    val rows = Seq(
      // basket 1: {a,b,c}; basket 2: {a,b} with item a listed TWICE
      // (multiplicity must not double-count); basket 3: {a,c};
      // basket 4: {d,e,f,g} — over the size cap, excluded everywhere
      (10L, "a"), (10L, "b"), (10L, "c"),
      (20L, "a"), (20L, "a"), (20L, "b"),
      (30L, "a"), (30L, "c"),
      (40L, "d"), (40L, "e"), (40L, "f"), (40L, "g"))
    val df = spark.createDataFrame(rows).toDF("bk", "it")
    val out = Events.associationPairs(df, "bk", "it",
        minSupport = 2L, maxBasketSize = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    // surviving universe = baskets {1,2,3}: a in 3, b in 2, c in 2;
    // (a,b) in 2, (a,c) in 2, (b,c) in 1 (below minSupport)
    assert(out == Map(
      ("a", "b") -> ((2L, 3L, 2L, 3L, 666666L, 1000000L)),
      ("a", "c") -> ((2L, 3L, 2L, 3L, 666666L, 1000000L))))
  }

  test("associationPairs ≡ driver brute force on seeded baskets") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(400)((rnd.nextInt(60).toLong, s"i${rnd.nextInt(12)}"))
    val df = spark.createDataFrame(rows).toDF("bk", "it")
    val baskets = rows.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      .toMap.filter(_._2.size <= 5)
    val itemN = baskets.values.toSeq.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val expect = baskets.values.toSeq
      .flatMap(s => s.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 2L)
    val got = Events.associationPairs(df, "bk", "it",
        minSupport = 2L, maxBasketSize = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == expect.keySet)
    val nB = baskets.size.toLong
    got.foreach { case (p, (pairN, aN, bN, tot)) =>
      assert(pairN == expect(p) && aN == itemN(p._1) &&
        bN == itemN(p._2) && tot == nB, s"pair $p")
    }
  }

  test("associationPairs: minSupport 1 keeps singletons, null keys dropped") {
    val rows = Seq(
      (Some(1L), Some("x")), (Some(1L), Some("y")),
      (Some(2L), Some("x")), (None, Some("z")), (Some(3L), None))
    val df = spark.createDataFrame(rows).toDF("bk", "it")
    val out = Events.associationPairs(df, "bk", "it", minSupport = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(5)))).toMap
    // null basket / null item rows never mine; universe = baskets {1,2}
    assert(out == Map(("x", "y") -> ((1L, 2L))))
  }

  test("streaks: islands split on interruption, per-user isolation") {
    val events = ev(Seq(
      (1L, 0L, "A"), (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "A"),
      (2L, 0L, "A"), (2L, 10L, "A"), (2L, 20L, "A")))
      .withColumn("event_id", col("user_id") * 1000 +
        expr("unix_micros(ts)"))
    val got = Events.streaks(events, "user_id", "ts", "event_type",
        "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got((1L, "A")) == ((3L, 2L, 2L)), got.toString)
    assert(got((1L, "B")) == ((1L, 1L, 1L)), got.toString)
    assert(got((2L, "A")) == ((3L, 1L, 3L)), "user 2 unbroken run")
  }

  test("cusumScan peaks at the level shift; hand values") {
    val events = ev(Seq(
      (1L, 0L, "x"), (1L, 10L, "x"), (1L, 20L, "x"), (1L, 30L, "x")))
      .withColumn("event_id", expr("unix_micros(ts)"))
      .withColumn("value",
        when(expr("unix_micros(ts)") < 20L, lit(1.0)).otherwise(lit(5.0)))
    val got = Events.cusumScan(events, "user_id", "ts", "value",
      "event_id").collect()(0)
    // mean 3, devs -2,-2,2,2 -> S: -2,-4,-2,0 — peak |S| 4 at the
    // pre-shift row (ts = 10us), range = 0 - (-4) = 4
    assert(got.getLong(1) == 4L)
    assert(got.getDouble(2) == 4.0, got.toString)
    assert(got.getTimestamp(3).getTime == 0L, got.toString) // 10us -> 0ms
    assert(got.getDouble(4) == 4.0, "range = 0 - (-4)")
  }
}
