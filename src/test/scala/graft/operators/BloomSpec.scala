package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomSpec extends SparkSpec {

  test("prunedJoin result is bit-identical to the plain join (long keys)") {
    val l = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val hot = spark.read.parquet(s"${sf()}/orders.parquet")
      .where(col("o_totalprice") > 200000)
      .select(col("o_orderkey"), col("o_totalprice"))
    val plain = l.join(hot, l("l_orderkey") === hot("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    val pruned = Bloom.prunedJoin(l, hot, "l_orderkey", "o_orderkey", 10000)
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    assert(plain.count() == pruned.count())
    assert(plain.exceptAll(pruned).isEmpty && pruned.exceptAll(plain).isEmpty)
  }

  test("prefilter keeps every true match and prunes most non-matches") {
    val l = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val hot = spark.read.parquet(s"${sf()}/orders.parquet")
      .where(col("o_totalprice") > 350000).select(col("o_orderkey"))
    val nHot = hot.count()
    val filtered = Bloom.prefilter(l, hot, "l_orderkey", "o_orderkey",
      expectedKeys = math.max(nHot, 1), fpp = 0.01)
    // no false negatives: the semi-join through the prefilter equals the
    // exact semi-join
    val exactSemi = l.join(hot, l("l_orderkey") === hot("o_orderkey"), "left_semi")
    val prefSemi = filtered.join(hot, filtered("l_orderkey") === hot("o_orderkey"), "left_semi")
    assert(exactSemi.count() == prefSemi.count())
    // actual pruning happened: survivors ≪ full table (1% fpp on a
    // selective key set cannot keep half the fact side)
    val total = l.count()
    val kept = filtered.count()
    assert(kept < total / 2, s"prefilter kept $kept of $total rows")
    assert(kept >= exactSemi.count())
  }

  test("prunedJoin works when both sides name the key identically") {
    import spark.implicits._
    val fact = Seq(1L, 2L, 3L, 4L, 5L).toDF("k")
    val dim = Seq(2L, 4L).toDF("k")
    val rows = Bloom.prunedJoin(fact, dim, "k", "k", 10, 0.001)
      .select(fact("k")).as[Long].collect().sorted
    assert(rows.toSeq == Seq(2L, 4L))
  }

  test("string keys hash consistently between build and probe") {
    import spark.implicits._
    val dim = Seq("alpha", "bravo", "charlie").toDF("k")
    val fact = Seq("alpha", "bravo", "delta", "echo", "foxtrot", "golf",
      "hotel", "india", "juliett", "kilo").toDF("k")
    val kept = Bloom.prefilter(fact, dim, "k", "k", 100, 0.001)
      .as[String].collect().toSet
    assert(Set("alpha", "bravo").subsetOf(kept))
    // fpp 0.001 on 8 negatives: all pruned with near-certainty
    assert(kept.size <= 3)
  }

  test("null fact keys are dropped, matching inner-join semantics") {
    import spark.implicits._
    val dim = Seq(1L, 2L).toDF("k")
    val fact = Seq[Option[Long]](Some(1L), None, Some(9L)).toDF("k")
    val kept = Bloom.prefilter(fact, dim, "k", "k", 10, 0.001)
      .collect().map(_.get(0))
    assert(kept.contains(1L) && !kept.contains(null))
  }

  test("probe runs inside the scan stage, before the join exchange") {
    val l = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val hot = spark.read.parquet(s"${sf()}/orders.parquet")
      .where(col("o_totalprice") > 200000).select(col("o_orderkey"))
    val plan = Bloom.prunedJoin(l, hot, "l_orderkey", "o_orderkey", 10000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"expected bloom probe in the physical plan:\n$plan")
  }
}
