package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Corpus.dedupSubstrings]] — substring-granular exact dedup via
  * content-defined anchors (Lee et al. ExactSubstr semantics: every
  * occurrence of a corpus-duplicated region is marked and cut).
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // A distinctive paragraph long enough to anchor several times at 1/4
  // density with k=8 (expected anchors ≈ len/4 ≈ 40).
  private val para =
    "the quick brown fox jumps over the lazy dog while seventeen green " +
    "turtles carefully carry purple umbrellas across the frozen river delta"

  private def run(rows: Seq[(Long, String)], maxGap: Int = 32) =
    Corpus.dedupSubstringsPortable(rows.toDF("doc_id", "text"),
      "doc_id", "text", k = 8, cutoffHex = "40", maxGap = maxGap)

  /** Scala reference: cut [s0,e0) spans out of text. */
  private def cutRef(text: String, spans: scala.collection.Seq[(Int, Int)]): String = {
    val keep = new StringBuilder
    var p = 0
    spans.sortBy(_._1).foreach { case (s0, e0) =>
      keep.append(text.substring(p, s0)); p = e0
    }
    keep.append(text.substring(p)).toString
  }

  test("misaligned cross-document duplicate region is detected and cut") {
    // the duplicated paragraph sits at offsets 10 and 23 — no common
    // alignment; content-defined anchors must still agree on it. The
    // prefixes avoid repeated-character runs: a run ≥ 2k would repeat its
    // own k-gram and be (correctly!) flagged as a within-doc duplicate.
    val a = 10L -> ("one lead: " + para + " tail one ends differently here")
    val b = 20L -> ("a second, longer lead: " + para + " and a different tail")
    val c = 30L -> "nothing in this short document repeats anywhere at all"
    val out = run(Seq(a, b, c)).collect().map(r =>
      r.getAs[Long]("doc_id") -> r).toMap

    for ((docId, text) <- Seq(a, b)) {
      val r = out(docId)
      assert(r.getAs[Long]("n_spans") >= 1, s"doc $docId found no span")
      val spans = r.getAs[scala.collection.Seq[Row]]("spans").map(x => (x.getInt(0), x.getInt(1)))
      val paraStart = text.indexOf(para)
      // every span lies inside the duplicated paragraph (no false cuts
      // in the unique prefix/suffix)
      spans.foreach { case (s0, e0) =>
        assert(s0 >= paraStart && e0 <= paraStart + para.length,
          s"span ($s0,$e0) leaks outside the duplicated region of $docId")
      }
      // and most of the paragraph is covered (anchor-gap slack at edges)
      assert(r.getAs[Long]("dup_chars") >= para.length / 2,
        s"doc $docId covered only ${r.getAs[Long]("dup_chars")} of ${para.length}")
    }
    val rc = out(30L)
    assert(rc.getAs[Long]("n_spans") == 0L)
    assert(rc.getAs[String]("clean_text") == c._2)
    assert(rc.getAs[Long]("clean_len") == c._2.length.toLong)
  }

  test("within-document repetition counts as duplication (ExactSubstr)") {
    // the filler between the two copies is longer than maxGap, so the
    // occurrences must surface as separate spans, not one merged cut
    val doc = 1L -> (para +
      " entirely unique middle filler long enough to exceed the merge gap " +
      para)
    val other = 2L -> "unique filler so the corpus is not one document"
    val out = run(Seq(doc, other)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r = out(1L)
    assert(r.getAs[Long]("n_spans") >= 2,
      "both occurrences of the repeated paragraph should be spanned")
    assert(r.getAs[Long]("dup_chars") >= para.length.toLong,
      "coverage should span both copies")
  }

  test("output is self-consistent: spans disjoint+sorted, cut reproduces clean_text") {
    val docs = Seq(
      1L -> ("a" * 7 + para + "b" * 5),
      2L -> ("c" * 19 + para + "d" * 11),
      3L -> (para + " x " + para),
      4L -> "entirely unique text with no duplication to find",
      5L -> "")
    run(docs).collect().foreach { r =>
      val text = docs.toMap.apply(r.getAs[Long]("doc_id"))
      val spans = r.getAs[scala.collection.Seq[Row]]("spans").map(x => (x.getInt(0), x.getInt(1)))
      spans.sliding(2).foreach {
        case Seq((_, e0), (s1, _)) => assert(e0 <= s1, s"overlap in $spans")
        case _ =>
      }
      assert(spans == spans.sortBy(_._1))
      val dupChars = spans.map { case (s, e) => e - s }.sum.toLong
      assert(r.getAs[Long]("dup_chars") == dupChars)
      assert(r.getAs[Long]("clean_len") == text.length - dupChars)
      assert(r.getAs[String]("clean_text") == cutRef(text, spans))
      assert(r.getAs[String]("clean_text").length.toLong ==
        r.getAs[Long]("clean_len"))
    }
  }

  test("result is repartition-invariant") {
    val docs = (1L to 40L).map(i =>
      i -> (s"prefix $i " + (if (i % 2 == 0) para else s"unique body $i ${"z" * i.toInt}")))
    val base = run(docs).orderBy("doc_id").collect().toSeq
    val re = Corpus.dedupSubstringsPortable(
      docs.toDF("doc_id", "text").repartition(7),
      "doc_id", "text", k = 8, cutoffHex = "40", maxGap = 32)
      .orderBy("doc_id").collect().toSeq
    assert(base == re)
  }

  test("production xxhash64 selector satisfies the same contract") {
    val docs = Seq(
      1L -> ("m" * 13 + para + " tail a"),
      2L -> ("n" * 29 + para + " tail b"),
      3L -> "no duplication in this one at all, truly none")
    val out = Corpus.dedupSubstrings(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = 8, anchorDensity = 4, maxGap = 32)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_spans") >= 1)
    assert(out(2L).getAs[Long]("n_spans") >= 1)
    assert(out(3L).getAs[Long]("n_spans") == 0L)
    assert(out(3L).getAs[String]("clean_text") == docs(2)._2)
    Seq(1L, 2L).foreach { id =>
      val text = docs.toMap.apply(id)
      val spans = out(id).getAs[scala.collection.Seq[Row]]("spans").map(x => (x.getInt(0), x.getInt(1)))
      assert(out(id).getAs[String]("clean_text") == cutRef(text, spans))
    }
  }

  test("contaminationSpans marks only benchmark-shared regions, cut is consistent") {
    val bench = Seq(900L -> ("benchmark item wraps: " + para))
      .toDF("doc_id", "text")
    // doc 1: contains the benchmark paragraph (misaligned); doc 2 and 3
    // share a paragraph with EACH OTHER but not with the benchmark —
    // contamination must not fire on train-internal duplication
    // no 8-char substring of this sentence occurs in the bench doc (the
    // word "benchmark" itself would be a real, detected leak!)
    val other = "a train-only repeated passage which no holdout ever recorded"
    val train = Seq(
      1L -> ("train lead-in text " + para + " and a tail"),
      2L -> ("first copy here: " + other),
      3L -> ("second, shifted copy: " + other))
      .toDF("doc_id", "text")
    val out = Corpus.contaminationSpansPortable(train, "doc_id", "text",
        bench, "text", k = 8, cutoffHex = "40", maxGap = 32)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_spans") >= 1, "benchmark leak not detected")
    val text1 = "train lead-in text " + para + " and a tail"
    val paraStart = text1.indexOf(para)
    val spans1 = r1.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("spans")
      .map(x => (x.getInt(0), x.getInt(1)))
    spans1.foreach { case (s0, e0) =>
      assert(s0 >= paraStart && e0 <= paraStart + para.length,
        s"span ($s0,$e0) outside the leaked region") }
    assert(r1.getAs[String]("clean_text") == cutRef(text1, spans1))
    assert(out(2L).getAs[Long]("n_spans") == 0L,
      "train-internal duplication is not contamination")
    assert(out(3L).getAs[Long]("n_spans") == 0L)
    assert(out(2L).getAs[String]("clean_text") == "first copy here: " + other)
  }

  test("native anchor kernels equal the HOF formulation on multibyte text") {
    // the kernel walks UTF-8 byte offsets per code point; positions must
    // agree with Spark's own substr/length (code-point) semantics, or
    // spans would slice mid-character on non-ASCII corpora
    val texts = Seq(
      "héllo wörld — ünïcode text with ümlaut répéats héllo wörld",
      "日本語のテキストと日本語のテキスト repeated segments here",
      "mixed ascii and 中文 characters 中文 interleaved everywhere",
      "plain ascii control row for comparison purposes only")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val k = 6
    for ((native, hof) <- Seq(
      (graft.plans.HashExpressions.md5PrefixAnchors(col("text"), k, 64),
        filter(when(length(col("text")) >= k,
            sequence(lit(0), length(col("text")) - k))
          .otherwise(array().cast("array<int>")),
          s => substring(md5(col("text").substr(s + 1, lit(k))), 1, 2) < lit("40"))),
      (graft.plans.HashExpressions.xxModAnchors(col("text"), k, 4),
        filter(when(length(col("text")) >= k,
            sequence(lit(0), length(col("text")) - k))
          .otherwise(array().cast("array<int>")),
          s => pmod(xxhash64(col("text").substr(s + 1, lit(k))), lit(4)) === 0)))) {
      val rows = df.select(col("id"), native.as("n"), hof.as("h"))
        .collect()
      rows.foreach { r =>
        assert(r.getAs[scala.collection.Seq[Int]]("n") ==
          r.getAs[scala.collection.Seq[Int]]("h"),
          s"kernel/HOF divergence on row ${r.getLong(0)}")
      }
      // sanity: the unicode rows actually anchor somewhere
      assert(rows.map(_.getAs[scala.collection.Seq[Int]]("n").size).sum > 0)
    }
  }

  test("null text behaves as empty; config guards reject bad parameters") {
    val out = Corpus.dedupSubstringsPortable(
      Seq((1L, null: String), (2L, para), (3L, para))
        .toDF("doc_id", "text"), "doc_id", "text",
      k = 8, cutoffHex = "40", maxGap = 32)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("clean_text") == "")
    assert(out(1L).getAs[Long]("n_spans") == 0L)
    assert(out(2L).getAs[Long]("n_spans") >= 1) // dup of doc 3
    intercept[IllegalArgumentException] {
      Corpus.dedupSubstringsPortable(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", k = 8, cutoffHex = "40", maxGap = 4)
    }
    intercept[IllegalArgumentException] {
      Corpus.dedupSubstrings(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", minCount = 1)
    }
  }
}
