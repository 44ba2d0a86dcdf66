package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Similarity.voteLabels]]/[[Similarity.knnClassify]],
  * [[Similarity.centroidOutlierScores]], and [[Corpus.calibrateScores]].
  */
class CalibrateClassifySpec extends SparkSpec {
  import spark.implicits._

  test("voteLabels: majority wins, ties break to the smallest label") {
    val neighbors = Seq(
      // q1: labels 2,2,7 → 2 by majority
      (1L, 101L), (1L, 102L), (1L, 103L),
      // q2: labels 7,7,2,2,9 → tie 7/2 at 2 votes → 2 (smallest)
      (2L, 103L), (2L, 104L), (2L, 101L), (2L, 102L), (2L, 105L))
      .toDF("query_id", "neighbor_id")
      .withColumn("cos", lit(0.5)).withColumn("rank", lit(1L))
    val labeled = Seq((101L, 2), (102L, 2), (103L, 7), (104L, 7), (105L, 9))
      .toDF("vec_id", "label")
    val out = Similarity.voteLabels(neighbors, labeled, "vec_id", "label")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2, 2L, 3L)))
    assert(out(2L) == ((2, 2L, 5L)))
  }

  test("knnClassify recovers planted cluster labels") {
    // three well-separated axis clusters in 4d; queries sit near them
    def v(axis: Int, eps: Float): Array[Float] = {
      val a = Array.fill(4)(eps); a(axis) = 1f; a
    }
    val corpus = (0 until 30).map { i =>
      val axis = i % 3
      (100L + i, v(axis, 0.01f * (i % 5)), axis * 10)
    }.toDF("vec_id", "embedding", "label")
    val queries = Seq((0L, v(0, 0.02f)), (1L, v(1, 0.03f)), (2L, v(2, 0.01f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.knnClassify(queries, corpus,
        "vec_id", "embedding", "vec_id", "embedding", "label", k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((0, 5L, 5L)))
    assert(out(1L) == ((10, 5L, 5L)))
    assert(out(2L) == ((20, 5L, 5L)))
  }

  test("centroidOutlierScores flags the vector far from its own group") {
    val rows = Seq(
      (1L, Array(1f, 0f, 0f), "a"),
      (2L, Array(0.9f, 0.1f, 0f), "a"),
      (3L, Array(-1f, 0f, 0f), "a"), // opposite direction — the outlier
      (4L, Array(0f, 1f, 0f), "b"),
      (5L, Array(0f, 0.8f, 0.2f), "b"),
      (6L, null.asInstanceOf[Array[Float]], "b"))
      .toDF("vec_id", "embedding", "grp")
    val out = Similarity.centroidOutlierScores(rows, "vec_id", "embedding", "grp")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).getBoolean(3) && !out(2L).getBoolean(3))
    assert(out(3L).getBoolean(3), "anti-aligned vector must flag")
    assert(out(3L).getDouble(2) < 0.0)
    assert(out(1L).getDouble(2) > 0.5)
    assert(!out(4L).getBoolean(3) && !out(5L).getBoolean(3))
    // null vector: no score, not an outlier, row preserved
    assert(out(6L).isNullAt(2) && !out(6L).getBoolean(3))
    assert(out.size == 6)
  }

  test("calibrateScores equals the single-window percent_rank at any bucket count") {
    val docs = (1L to 200L).map { i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "de",
        ((i * 37) % 101).toDouble / 100.0)
    }.toDF("doc_id", "lang", "score")
    val w = Window.partitionBy("lang").orderBy(col("score"), col("doc_id"))
    val expected = docs
      .withColumn("rank_in_group", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .withColumn("pct", when(col("n") > 1,
        (col("rank_in_group") - 1).cast("double") / (col("n") - 1).cast("double"))
        .otherwise(0.0))
      .select("doc_id", "lang", "score", "rank_in_group", "pct")
      .orderBy("doc_id").collect().toSeq
    for (nb <- Seq(1, 7, 256)) {
      val got = Corpus.calibrateScores(docs, "doc_id", "lang", col("score"), nb)
        .orderBy("doc_id").collect().toSeq
      assert(got == expected, s"nBuckets=$nb diverged from the global window")
    }
  }

  test("calibrateScores: single-row group pins 0.0, null scores sink, repartition-invariant") {
    val docs = Seq(
      (1L, "solo", 0.9), (2L, "en", 0.5), (3L, "en", 0.2),
      (4L, "en", Double.NaN), (5L, "en", 0.7))
      .toDF("doc_id", "lang", "score")
      .withColumn("score", when(isnan(col("score")), lit(null)).otherwise(col("score")))
    val out = Corpus.calibrateScores(docs, "doc_id", "lang", col("score"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((1L, 0.0)))
    assert(out(4L)._1 == 1L, "null score calibrates to the bottom rank")
    assert(out(5L)._1 == 4L)
    val re = Corpus.calibrateScores(docs.repartition(5), "doc_id", "lang", col("score"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(re == out)
  }
}
