package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  test("as-of join: latest right row at-or-before each left ts, else null") {
    val lSchema = StructType(Seq(
      StructField("k", StringType), StructField("lts", LongType),
      StructField("lid", LongType)))
    val rSchema = StructType(Seq(
      StructField("k", StringType), StructField("rts", LongType),
      StructField("price", DoubleType)))
    val left = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", 5L, 1L),   // after r@3 → 30.0
      Row("a", 3L, 2L),   // exactly r@3 (inclusive) → 30.0
      Row("a", 2L, 3L),   // after r@1 → 10.0
      Row("a", 0L, 4L),   // before all → null
      Row("b", 9L, 5L),   // b has no right rows → null
    )), lSchema)
    val right = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", 1L, 10.0), Row("a", 3L, 30.0), Row("a", 7L, 70.0),
    )), rSchema)
    val out = AsOf.join(left, right, "k", "lts", "rts", Seq("price"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out == Map(1L -> 30.0, 2L -> 30.0, 3L -> 10.0, 4L -> null, 5L -> null))
  }

  // int64 epoch-nanos beyond 2^53: adjacent nanos are indistinguishable
  // after a double cast, so ordering must happen in the native long.
  test("as-of ordering is exact for int64 timestamps beyond 2^53") {
    val base = 1700000000000000000L // epoch nanos, ≫ 2^53
    val lSchema = StructType(Seq(
      StructField("k", StringType), StructField("lts", LongType),
      StructField("lid", LongType)))
    val rSchema = StructType(Seq(
      StructField("k", StringType), StructField("rts", LongType),
      StructField("v", LongType)))
    val left = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", base, 1L),      // exactly r@base → 100
      Row("a", base + 1L, 2L), // exactly r@base+1 → 101 (collapses under double)
      Row("a", base + 2L, 3L), // after both → 101
    )), lSchema)
    val right = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", base, 100L), Row("a", base + 1L, 101L),
    )), rSchema)
    val out = AsOf.join(left, right, "k", "lts", "rts", Seq("v"))
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 100L, 2L -> 101L, 3L -> 101L))
  }

  test("broadcastJoin matches the composed as-of join, including edge cases") {
    val lSchema = StructType(Seq(
      StructField("k", StringType), StructField("lts", LongType),
      StructField("lid", LongType)))
    val rSchema = StructType(Seq(
      StructField("k", StringType), StructField("rts", LongType),
      StructField("price", DoubleType)))
    val left = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", 5L, 1L), Row("a", 3L, 2L), Row("a", 2L, 3L), Row("a", 0L, 4L),
      Row("b", 9L, 5L), Row(null, 4L, 6L),
    )), lSchema)
    val right = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", 1L, 10.0), Row("a", 3L, 30.0), Row("a", 7L, 70.0),
      Row(null, 2L, 99.0),
    )), rSchema)
    def res(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    val composed = res(AsOf.join(left, right, "k", "lts", "rts", Seq("price")))
    val bcast = res(AsOf.broadcastJoin(left, right, "k", "lts", "rts", Seq("price")))
    assert(bcast == composed)
    assert(bcast == Map(1L -> 30.0, 2L -> 30.0, 3L -> 10.0, 4L -> null,
      5L -> null, 6L -> 99.0)) // null keys group (Window.partitionBy semantics)
  }

  test("broadcastJoin matches the composed join on a dense random workload") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val lRows = (1 to 400).map(i =>
      Row(s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong, i.toLong))
    val rRows = (1 to 60).map(i =>
      Row(s"k${rnd.nextInt(6)}", i.toLong * 2 % 97, i.toLong * 1000))
    val lSchema = StructType(Seq(
      StructField("k", StringType), StructField("lts", LongType),
      StructField("lid", LongType)))
    val rSchema = StructType(Seq(
      StructField("k", StringType), StructField("rts", LongType),
      StructField("v", LongType)))
    val left = spark.createDataFrame(spark.sparkContext.parallelize(lRows), lSchema)
    val right = spark.createDataFrame(spark.sparkContext.parallelize(rRows), rSchema)
      // contract: right unique per (key, ts)
      .groupBy("k", "rts").agg(max(col("v")).as("v"))
    def res(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) null else r.getLong(3))).toMap
    assert(res(AsOf.broadcastJoin(left, right, "k", "lts", "rts", Seq("v"))) ==
      res(AsOf.join(left, right, "k", "lts", "rts", Seq("v"))))
  }

  test("broadcastJoin plan is the custom exec with zero exchanges") {
    import org.apache.spark.sql.functions._
    val df = spark.range(100).select(
      (col("id") % 5).cast("string").as("k"), col("id").as("lts"), col("id").as("lid"))
    val r = spark.range(10).select(
      (col("id") % 5).cast("string").as("k"), (col("id") * 7).as("rts"), col("id").as("v"))
    val out = AsOf.broadcastJoin(df, r, "k", "lts", "rts", Seq("v"))
    val phys = out.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastAsOfJoin"), phys)
    assert(!phys.contains("Exchange"), s"broadcast as-of join must not shuffle:\n$phys")
    assert(out.count() == 100)
  }

  test("broadcastJoin self-join: both sides from the SAME DataFrame instance") {
    // Shared-instance plans share attribute exprIds; DeduplicateRelations
    // re-ids the right subtree but cannot remap the custom node's fields
    // (ambiguous by id) — the operator must dedup its right side itself.
    // Regression for the INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND crash.
    import org.apache.spark.sql.functions._
    val base = graft.GraftSession.readTable(spark, sf(), "events")
    val ev = base.select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val purch = base.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("p_us"))
      .agg(max(col("event_id")).as("p_event_id"))
    val bc = AsOf.broadcastJoin(ev, purch, "user_id", "us", "p_us", Seq("p_event_id"))
    val composed = AsOf.join(ev, purch, "user_id", "us", "p_us", Seq("p_event_id"))
    def res(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getLong(3))).toMap
    assert(res(bc) == res(composed))
  }
  // pandas merge_asof tolerance parity: matches older than the budget
  // resolve to null, in-budget matches are untouched.
  test("as-of join tolerance: stale matches null out, fresh ones survive") {
    val lSchema = StructType(Seq(
      StructField("k", StringType), StructField("lts", LongType),
      StructField("lid", LongType)))
    val rSchema = StructType(Seq(
      StructField("k", StringType), StructField("rts", LongType),
      StructField("price", DoubleType)))
    val left = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", 5L, 1L),   // match r@3, age 2 ≤ 2 → 30.0
      Row("a", 9L, 2L),   // match r@3, age 6 > 2 → null (stale)
      Row("a", 3L, 3L),   // exact hit, age 0 → 30.0
      Row("a", 0L, 4L),   // no match at all → null
    )), lSchema)
    val right = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", 1L, 10.0), Row("a", 3L, 30.0),
    )), rSchema)
    val out = AsOf.join(left, right, "k", "lts", "rts", Seq("price"),
        tolerance = Some(2L))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out == Map(1L -> 30.0, 2L -> null, 3L -> 30.0, 4L -> null))
    // tolerance = 0 keeps only exact-timestamp hits
    val zero = AsOf.join(left, right, "k", "lts", "rts", Seq("price"),
        tolerance = Some(0L))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(zero == Map(1L -> null, 2L -> null, 3L -> 30.0, 4L -> null))
  }
  // The matched row's value is what the join returns — null included. A
  // per-column carry would back-fill the matched row's NULL from an
  // older right row (and mis-age the tolerance gate); the struct carry
  // must not.
  test("as-of join: matched row's null field stays null (no back-fill)") {
    val lSchema = StructType(Seq(
      StructField("k", StringType), StructField("lts", LongType),
      StructField("lid", LongType)))
    val rSchema = StructType(Seq(
      StructField("k", StringType), StructField("rts", LongType),
      StructField("price", DoubleType)))
    val left = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", 4L, 1L),   // matches r@3 whose price is NULL → null
      Row("a", 2L, 2L),   // matches r@1 → 10.0
    )), lSchema)
    val right = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", 1L, 10.0), Row("a", 3L, null),
    )), rSchema)
    val out = AsOf.join(left, right, "k", "lts", "rts", Seq("price"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out == Map(1L -> null, 2L -> 10.0), out.toString)
    // …and the tolerance gate ages the MATCH, not the last non-null
    // value: lts=4 matches r@3 (age 1 ≤ 2) but its price is null — the
    // stale price from r@1 (age 3 > 2) must NOT appear
    val tol = AsOf.join(left, right, "k", "lts", "rts", Seq("price"),
        tolerance = Some(2L))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(tol == Map(1L -> null, 2L -> 10.0), tol.toString)
  }
}
