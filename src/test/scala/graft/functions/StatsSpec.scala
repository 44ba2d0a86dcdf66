package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsSpec extends SparkSpec {

  test("profile: null-aware counts, distinct excludes nulls, order pinned") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("x", LongType), StructField("y", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "a"), Row(1L, null), Row(null, "b"), Row(2L, "a"))),
      schema)
    val out = Stats.profile(df, Seq("y", "x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq( // caller's order, not schema order
      ("y", 4L, 1L, 2L), ("x", 4L, 1L, 2L)))
  }

  test("profile: dotted column names survive (ordinal aliases), approx mode bounded") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // a column whose NAME contains a dot — legal in DataFrames; raw-name
    // aliases round-tripped through col() would parse it as a nested path
    val schema = StructType(Seq(StructField("a.b", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize((1L to 100L).map(i => Row(i % 37))), schema)
    val exact = Stats.profile(df, Seq("a.b")).collect().head
    assert((exact.getString(0), exact.getLong(1), exact.getLong(2),
      exact.getLong(3)) == (("a.b", 100L, 0L, 37L)))
    // approx mode: HLL++ estimate within 3·rsd of exact
    val ap = Stats.profile(df, Seq("a.b"), approxRsd = 0.05).collect().head
    assert(ap.getLong(1) == 100L && ap.getLong(2) == 0L)
    assert(math.abs(ap.getLong(3) - 37L) <= 3 * 0.05 * 37L + 1)
  }

  private val probs = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.95, 1.0)

  private def reference(df: org.apache.spark.sql.DataFrame, c: String): Seq[Double] = {
    val arr = probs.map(p => s"${p}D").mkString("array(", ", ", ")")
    df.selectExpr(s"percentile($c, $arr) AS q").head()
      .getSeq[Double](0).toSeq
  }

  private def check(df: org.apache.spark.sql.DataFrame, c: String,
                    buckets: Int, clue: String): Unit = {
    val got = Stats.exactQuantiles(df, c, probs, buckets = buckets,
      maxCollect = 50)
    val want = reference(df, c)
    probs.indices.foreach { i =>
      assert(got(i) == want(i) ||
        math.abs(got(i) - want(i)) <= math.ulp(want(i)) * 4,
        s"$clue buckets=$buckets p=${probs(i)}: ${got(i)} vs ${want(i)}")
    }
  }

  test("exactQuantiles equals percentile() on uniform, skewed, and discrete data") {
    import spark.implicits._
    val uniform = spark.range(10001).select((col("id") * 17 % 10007).cast("double").as("v"))
    val skewed = spark.range(5000).select(
      (pow(col("id").cast("double") / 100.0, 3) - lit(1234.5)).as("v"))
    // heavy duplicates: only 7 distinct values
    val discrete = spark.range(9999).select((col("id") % 7).cast("double").as("v"))
    for (b <- Seq(4, 64, 4096)) {
      check(uniform, "v", b, "uniform")
      check(skewed, "v", b, "skewed")
      check(discrete, "v", b, "discrete")
    }
  }

  test("exactQuantiles: nulls and NaNs excluded, negatives, single value") {
    import spark.implicits._
    val df = Seq[Option[Double]](Some(-5.0), None, Some(Double.NaN), Some(3.5),
      Some(-5.0), Some(100.25)).toDF("v")
    val got = Stats.exactQuantiles(df, "v", Seq(0.0, 0.5, 1.0), buckets = 4)
    assert(got == Seq(-5.0, (-5.0 + 3.5) / 2, 100.25))
    val one = Seq(42.0).toDF("v")
    assert(Stats.exactQuantiles(one, "v", Seq(0.0, 0.37, 1.0)) == Seq(42.0, 42.0, 42.0))
  }

  test("exactQuantiles: adversarial near-identical doubles (sub-ulp intervals)") {
    import spark.implicits._
    val base = 1.0e15
    val df = (0 until 2000).map(i => base + (i % 3).toDouble).toDF("v")
    check(df, "v", 4, "near-identical")
  }

  test("exactQuantiles on lineitem matches percentile() bit-for-bit") {
    val l = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val got = Stats.exactQuantiles(l, "l_extendedprice", Seq(0.5, 0.95, 0.99),
      maxCollect = 100)
    val arr = "array(0.5D, 0.95D, 0.99D)"
    val want = l.selectExpr(s"percentile(l_extendedprice, $arr) AS q")
      .head().getSeq[Double](0).toSeq
    assert(got == want, s"$got vs $want")
  }
}
