package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Properties for the distributed selection/sketch operators, sampled
  * with fixed seeds (the scalatest/scalacheck bridge isn't on the
  * offline classpath — same pattern as ReducePropertySpec).
  */
class StatsPropertySpec extends SparkSpec {

  // value pools that stress each regime: continuous, heavy-duplicate,
  // near-identical magnitudes, mixed signs
  private val valuesGen: Gen[List[Double]] = for {
    n <- Gen.chooseNum(1, 120)
    pool <- Gen.oneOf(
      Gen.chooseNum(-1e6, 1e6),
      Gen.oneOf(0.0, 1.0, 2.0),
      Gen.oneOf(1e15, 1e15 + 1, 1e15 + 2),
      Gen.chooseNum(-5.0, 5.0))
    xs <- Gen.listOfN(n, pool)
  } yield xs

  private def referenceQuantile(sorted: IndexedSeq[Double], p: Double): Double = {
    val pos = p * (sorted.size - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo) else sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  test("exactQuantiles == driver-side sort+interpolate on 12 sampled multisets") {
    import spark.implicits._
    val probs = Seq(0.0, 0.1, 0.5, 0.9, 1.0)
    (1 to 12).foreach { i =>
      val xs = valuesGen(Gen.Parameters.default, Seed(i.toLong)).get
      val df = xs.toDF("v").repartition(3)
      // tiny buckets + tiny maxCollect force multi-pass refinement
      val got = Stats.exactQuantiles(df, "v", probs, buckets = 4, maxCollect = 5)
      val sorted = xs.sorted.toIndexedSeq
      val want = probs.map(p => referenceQuantile(sorted, p))
      probs.indices.foreach { j =>
        assert(got(j) == want(j) ||
          math.abs(got(j) - want(j)) <= math.ulp(want(j)) * 4,
          s"seed=$i p=${probs(j)}: ${got(j)} vs ${want(j)} (n=${xs.size})")
      }
    }
  }

  private val streamGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(1, 400)
    xs <- Gen.listOfN(n, Gen.frequency(
      5 -> Gen.const("hot"), 3 -> Gen.const("warm"),
      4 -> Gen.oneOf((1 to 50).map(i => s"t$i"))))
  } yield xs

  test("misraGries superset guarantee holds on 10 sampled streams x 3 capacities") {
    import spark.implicits._
    (1 to 10).foreach { i =>
      val xs = streamGen(Gen.Parameters.default, Seed(100L + i)).get
      val ds = spark.createDataset(xs).repartition(4)
      Seq(2, 5, 11).foreach { cap =>
        val summary = ds.select(Corpus.misraGries(cap).toColumn).head().toSet
        val exact = xs.groupBy(identity).view.mapValues(_.size)
          .filter(_._2 > xs.size / (cap + 1)).keySet
        assert(exact.subsetOf(summary),
          s"seed=$i cap=$cap: missing ${exact -- summary}")
        assert(summary.size <= cap)
      }
    }
  }
  // knnJoin must equal per-query driver-side brute force for arbitrary
  // vector sets — including duplicate vectors (cosine ties resolved by
  // neighbor id) and k beyond the corpus size.
  test("knnJoin == driver brute force on 8 sampled vector sets") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val dim = 6
    val schema = StructType(Seq(StructField("vid", LongType),
      StructField("v", ArrayType(FloatType, containsNull = false))))
    val vecGen: Gen[Array[Float]] = Gen.oneOf(
      Gen.listOfN(dim, Gen.chooseNum(-4, 4).map(_.toFloat / 3f)),
      Gen.listOfN(dim, Gen.oneOf(-1f, 0f, 1f)) // duplicates + ties likely
    ).map(_.toArray).suchThat(a => a.exists(_ != 0f))
    def cosExact(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = a.map(x => x.toDouble * x.toDouble).sum
      val nb = b.map(x => x.toDouble * x.toDouble).sum
      BigDecimal(dot / math.sqrt(na * nb))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    (1 to 8).foreach { i =>
      val params = Gen.Parameters.default
      val nQ = Gen.chooseNum(1, 4).apply(params, Seed(i * 1000L)).get
      val nC = Gen.chooseNum(1, 25).apply(params, Seed(i * 1000L + 1)).get
      val k = Gen.chooseNum(1, 6).apply(params, Seed(i * 1000L + 2)).get
      val vecs = (0 until nQ + nC).map(j =>
        vecGen.apply(params, Seed(i * 1000L + 10 + j)).get)
      val rows = vecs.zipWithIndex.map { case (v, j) => Row(j.toLong, v.toSeq) }
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
      val queries = df.where(col("vid") < nQ)
      val corpus = df.where(col("vid") >= nQ)
      val got = Similarity.knnJoin(queries, corpus, "vid", "v", "vid", "v",
          k, margin = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      val want = (0 until nQ).flatMap { q =>
        (nQ until nQ + nC).map(c => (c.toLong, cosExact(vecs(q), vecs(c))))
          .sortBy(t => (-t._2, t._1)).take(k).zipWithIndex
          .map { case ((c, s), r) => (q.toLong, c, s, (r + 1).toLong) }
      }.toSet
      assert(got == want, s"sample $i (nQ=$nQ nC=$nC k=$k)")
    }
  }
}
