package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

@graft.Heavy // top-tier suite by measured wall time; excluded from `sbt smoke`
class CorpusSpec extends SparkSpec {

  private lazy val docs = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("lang", StringType),
      StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "en", "spam spam spam spam"),
        Row(2L, "en", "the quick brown fox jumps over the lazy dog"),
        Row(3L, "de", "one"),
        Row(4L, "en", "hash join hash join hash join scan"))),
      schema)
  }

  private lazy val vecs = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("label", IntegerType),
      StructField("v", ArrayType(FloatType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 0, Seq(1.0f, -2.0f, 0.5f)),
        Row(2L, 0, Seq(3.0f, 2.0f, -0.5f)),
        Row(3L, 1, Seq(0.0f, 0.0f, 0.0f)))),
      schema)
  }

  test("wordNgrams keeps multiplicity; short docs get an empty array") {
    val out = docs.select(col("id"),
      TextFunctions.wordNgrams(col("text"), 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("spam spam", "spam spam", "spam spam"))
    assert(out(2L).length == 8)
    assert(out(3L) == Seq.empty)
  }

  test("repetitionSignals flags repeated tokens and bigrams") {
    val out = Corpus.repetitionSignals(docs, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((4L, 1L, 1.0, 1.0))) // all one token, all one bigram
    val (n2, d2, tf2, bf2) = out(2L)
    assert(n2 == 9 && d2 == 8)
    assert(tf2 == 2.0 / 9.0 && bf2 == 1.0 / 8.0)
    assert(out(3L) == ((1L, 1L, 1.0, 0.0))) // single token: no bigrams
  }

  test("bm25 scores term-bearing docs, monotone in tf") {
    val out = Corpus.bm25(docs, "id", "text", Seq("hash", "join", "scan"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!out.contains(1L) && !out.contains(2L) && !out.contains(3L))
    assert(out(4L) > 0.0)
  }

  private lazy val retrievalDocs = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "common alpha beta gamma"),
        Row(2L, "common alpha beta gamma"),
        Row(3L, "common alpha beta delta"),
        Row(4L, "common epsilon zeta eta"),
        Row(5L, "x"))),
      schema)
  }

  test("tfidfTopK: identical doc ranks first at cos 1.0; df-pruned terms generate no candidates") {
    val out = Corpus.tfidfTopK(retrievalDocs, "id", "text",
      col("id") === 1, k = 10, ngram = 1, maxDfRatio = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // "common" has df = 4 of 5 docs > 0.7·5 → pruned: doc 4 shares ONLY the
    // pruned term, so the inverted index never pairs it with the query;
    // doc 5 shares nothing; the query never retrieves itself.
    assert(out.map(_._2).toSet == Set(2L, 3L))
    val byRank = out.sortBy(_._4)
    assert(byRank.head == ((1L, 2L, 1.0, 1L))) // identical kept-term vector
    assert(byRank(1)._2 == 3L && byRank(1)._3 > 0.0 && byRank(1)._3 < 1.0)
  }

  test("tfidfTopK is repartition-invariant") {
    val a = Corpus.tfidfTopK(retrievalDocs, "id", "text",
      col("id") === 1, k = 10, ngram = 1, maxDfRatio = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val b = Corpus.tfidfTopK(retrievalDocs.repartition(7), "id", "text",
      col("id") === 1, k = 10, ngram = 1, maxDfRatio = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("tfidfTopK: docs below the shingle width drop out of both sides") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "a b c"), Row(2L, "a b c"), Row(3L, "c"))),
      schema)
    val out = Corpus.tfidfTopK(d, "id", "text", col("id") === 1,
      k = 5, ngram = 2, maxDfRatio = 0.9)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((2L, 1.0))) // doc 3 has no bigrams
    intercept[IllegalArgumentException] {
      Corpus.tfidfTopK(d, "id", "text", col("id") === 1, k = 5,
        ngram = 1, maxDfRatio = 1.0)
    }
  }

  test("tfidfIndex/tfidfProbeIndex: probe survives a parquet round-trip, frozen idf") {
    val (postings, dict) = Corpus.tfidfIndex(retrievalDocs, "id", "text",
      ngram = 1, maxDfRatio = 0.7)
    val dir = java.nio.file.Files.createTempDirectory("graft-tfidf-idx").toString
    postings.write.mode("overwrite").parquet(s"$dir/postings")
    dict.write.mode("overwrite").parquet(s"$dir/dict")
    val p2 = spark.read.parquet(s"$dir/postings")
    val d2 = spark.read.parquet(s"$dir/dict")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val queries = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(100L, "common alpha beta gamma"), // kept-term vector of docs 1/2
        Row(101L, "zzz unknownterm"))),       // nothing indexed → absent
      schema)
    val out = Corpus.tfidfProbeIndex(queries, "id", "text", p2, d2, k = 10,
      ngram = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(!out.exists(_._1 == 101L))
    val q100 = out.filter(_._1 == 100L).sortBy(_._4)
    // docs 1 and 2 are identical to the query on kept terms → cos 1.0,
    // tie broken by doc_id; doc 4 (only the pruned term) never appears
    assert(q100.take(2).map(t => (t._2, t._3)).toSeq == Seq((1L, 1.0), (2L, 1.0)))
    assert(!q100.exists(_._2 == 4L))
  }

  // the index-maintenance trio's third member: append files new docs
  // under the FROZEN dict; re-filing the original corpus under its own
  // dict reproduces the stored postings exactly (append ≡ rebuild with
  // frozen statistics), and the probe retrieves appended docs against
  // the same snapshot idf.
  test("tfidfIndexAppend: frozen-dict filing == stored postings; probe finds appends; mixed refuses") {
    val (params, postings, dict) = Corpus.tfidfIndexBuild(
      retrievalDocs, "id", "text", ngram = 1, maxDfRatio = 0.7)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // append ≡ rebuild-with-frozen-stats, exact: the original corpus
    // re-filed under its own frozen dict is the stored posting set
    assert(rows(Corpus.tfidfIndexAppend(params, dict, retrievalDocs,
      "id", "text")) == rows(postings))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(50L, "common alpha beta gamma"),   // twin of indexed content
        Row(51L, "zzz unknownterm onlynovel"))), // no dict gram → no rows
      schema)
    val appended = Corpus.tfidfIndexAppend(params, dict, batch, "id", "text")
    assert(appended.where(col("doc_id") === 51L).count() == 0L)
    // probing old ∪ appended retrieves the appended doc at cos 1.0 for
    // its own text (consistent snapshot statistics across the seam)
    val merged = postings.unionByName(appended)
    val queries = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(100L, "common alpha beta gamma"))), schema)
    // the frozen-params probe overload reads ngram=1 from the persisted
    // scheme — no free parameter to typo on the probe path
    val got = Corpus.tfidfProbeIndex(queries, "id", "text", params, merged,
        dict, k = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(got(50L) == 1.0)
    // a union of two schemes' params refuses loudly — on append AND probe
    val (params2, _, _) = Corpus.tfidfIndexBuild(
      retrievalDocs, "id", "text", ngram = 2, maxDfRatio = 0.7)
    val ex = intercept[IllegalArgumentException] {
      Corpus.tfidfIndexAppend(params.unionByName(params2), dict, batch,
        "id", "text")
    }
    assert(ex.getMessage.contains("mixed-scheme"))
    val exp = intercept[IllegalArgumentException] {
      Corpus.tfidfProbeIndex(queries, "id", "text",
        params.unionByName(params2), merged, dict, k = 10)
    }
    assert(exp.getMessage.contains("mixed-scheme"))
  }

  test("leakSafeSplit: whole near-dup clusters land on one side, singletons unchanged") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val docs = spark.range(0, 300).select(col("id").as("doc_id"))
    val pairs = spark.createDataFrame(Seq((0L, 1L), (1L, 2L), (10L, 11L)))
      .toDF("id_a", "id_b")
    val out = Corpus.leakSafeSplit(docs, "doc_id", pairs, splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // transitive cluster {0,1,2} and pair {10,11} each land together
    assert(out(0L) == out(1L) && out(1L) == out(2L))
    assert(out(10L) == out(11L))
    // singletons split exactly as plain hashSplit on their own id, and
    // cluster members inherit their min-id representative's split
    val plain = Corpus.hashSplit(docs, "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val clustered = Set(0L, 1L, 2L, 10L, 11L)
    assert((0L until 300L).filterNot(clustered).forall(i => out(i) == plain(i)))
    assert(out(0L) == plain(0L) && out(10L) == plain(10L))
  }

  test("snapshotDiff: delta-only output with added/removed/changed verdicts") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    def snap(rows: Seq[(Long, String)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), schema)
    val old = snap(Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    val nw = snap(Seq(1L -> "a", 2L -> "B2", 4L -> "d"))
    val out = Corpus.snapshotDiff(old, nw, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("snapshotDiff: null text transitions are explicit changes; null→null is unchanged") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    def snap(rows: Seq[(Long, String)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), schema)
    val old = snap(Seq(1L -> null, 2L -> "b", 3L -> null))
    val nw = snap(Seq(1L -> "now-set", 2L -> null, 3L -> null))
    val out = Corpus.snapshotDiff(old, nw, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // null→value and value→null are changes; null→null is NOT (id 3 absent)
    assert(out == Map(1L -> "changed", 2L -> "changed"))
  }

  test("snapshotDiff: a weak-hash collision silently reads 'changed' as 'unchanged'; the 128-bit default catches it") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    def snap(rows: Seq[(Long, String)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), schema)
    // id 1's text changes but COLLIDES under the injected weak hash
    // (length) — the undetectable-corruption path the 128-bit default
    // buys out: a diff collision filters the row as unchanged, unlike a
    // dedup collision which at least errs toward dropping.
    val old = snap(Seq(1L -> "aaaa", 2L -> "keep"))
    val nw = snap(Seq(1L -> "bbbb", 2L -> "keep"))
    val weak = Corpus.snapshotDiffWithFingerprint(old, nw, "id", "text",
        c => length(c))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(weak.isEmpty, "weak 'hash' must miss the planted collision")
    val strong = Corpus.snapshotDiff(old, nw, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(strong == Map(1L -> "changed"))
  }

  test("rrfFuse: shared docs outrank single-list docs, ties break by doc_id") {
    val schema = StructType(Seq(
      StructField("query_id", LongType), StructField("doc_id", LongType),
      StructField("rank", LongType)))
    def list(rows: Seq[(Long, Long, Long)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))), schema)
    val a = list(Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L)))
    val b = list(Seq((1L, 11L, 1L), (1L, 12L, 2L), (2L, 21L, 1L)))
    val out = Corpus.rrfFuse(Seq(a, b), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    // q1: doc 11 appears in both lists (1/61 + 1/62) > doc 10 (1/61) > doc 12 (1/62)
    assert(out.filter(_._1 == 1L).map(_._2).toSeq == Seq(11L, 10L, 12L))
    // q2: docs 20 and 21 tie at 1/61 — doc_id breaks the tie
    assert(out.filter(_._1 == 2L).map(_._2).toSeq == Seq(20L, 21L))
    val q2 = out.filter(_._1 == 2L)
    assert(q2(0)._3 == q2(1)._3)
  }

  test("hashStratifiedSample is deterministic and respects per-stratum rates") {
    val base = spark.range(0, 2000).select(
      col("id"), when(col("id") % 2 === 0, "en").otherwise("xx").as("lang"))
    val kept = Corpus.hashStratifiedSample(base, "lang", "id",
      Map("en" -> 8), defaultPer16 = 1)
    val counts = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // en keeps ~8/16 of 1000, xx ~1/16 of 1000 — generous bounds
    assert(counts("en") > 350 && counts("en") < 650)
    assert(counts.getOrElse("xx", 0L) < 180)
    // re-running selects the identical set
    val a = kept.select("id").collect().map(_.getLong(0)).toSet
    val b = Corpus.hashStratifiedSample(base, "lang", "id", Map("en" -> 8), 1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("decontaminate counts distinct shared n-grams per (train, bench) pair") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val corpus = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "the quick brown fox jumps high"),   // train
        Row(2L, "a totally different document here"), // train
        Row(40L, "the quick brown fox sleeps"),       // bench
        Row(80L, "short one"))),                      // bench: no trigram
      schema)
    val out = Corpus.decontaminate(
      corpus.where(col("id") % 40 =!= 0), corpus.where(col("id") % 40 === 0),
      "id", "text", n = 3, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc1 vs doc40 share "the quick brown" + "quick brown fox"
    assert(out == Map((1L, 40L) -> 2L))
    // repeated grams count once (distinct), threshold filters
    val rep = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "x y z x y z"), Row(40L, "x y z"))), schema)
    val out2 = Corpus.decontaminate(
      rep.where(col("id") === 1), rep.where(col("id") === 40),
      "id", "text", n = 3, minShared = 2)
    assert(out2.count() == 0) // only 1 distinct shared gram ("x y z")
  }

  test("chunkTokens: stride windows cover every token, short/empty docs handled") {
    val df = spark.createDataFrame(Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 tokens
      (2L, "a b"),                            // shorter than a chunk
      (3L, " "))).toDF("id", "text")          // empty
    val out = df.select(col("id"),
      inline(TextFunctions.chunkTokens(col("text"), chunkLen = 4, stride = 3)))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(_._4).toSeq == Seq(
      "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"))
    assert(doc1.map(_._3).toSeq == Seq(0L, 3L, 6L))
    assert(out.filter(_._1 == 2L).map(_._4).toSeq == Seq("a b"))
    assert(!out.exists(_._1 == 3L))
  }

  test("normalize lowercases, strips controls, collapses whitespace") {
    val out = spark.range(1)
      .select(TextFunctions.normalize(
        lit("  Hello\tWORLD  again\n")).as("n"))
      .head().getString(0)
    assert(out == "hello world again")
  }

  test("scrubPii masks emails, long ids, and phone-ish runs") {
    val out = spark.range(1)
      .select(TextFunctions.scrubPii(
        lit("mail a.b+c@ex-site.org id 123456789012 call +1 (555) 867-5309 ok")).as("s"))
      .head().getString(0)
    assert(out == "mail <EMAIL> id <ID> call <PHONE> ok")
  }

  test("luhnValid accepts mod-10-clean numbers and rejects off-by-one") {
    // classic test numbers: Visa/MC/Amex/Discover valid; +1 digit flips
    val cases = Seq(
      ("4111111111111111", true), ("5500005555555559", true),
      ("378282246310005", true), ("6011111111111117", true),
      ("4111111111111112", false), ("1234567812345678", false))
    val got = spark.createDataFrame(cases).toDF("d", "want")
      .select(TextFunctions.luhnValid(col("d")).as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), r))
  }

  test("piiCensus: typed counts with octet and Luhn precision gates") {
    import spark.implicits._
    val docs = Seq(
      // one of each, card Luhn-valid, ip in range
      (1L, "mail a.b@ex.org from 10.0.255.7 call +1 (555) 867-5309 " +
        "pay 4111 1111 1111 1111 now"),
      // shape matches that FAIL the precision gates: octet 999, Luhn-off
      (2L, "bad ip 999.1.2.3 bad card 4111-1111-1111-1112"),
      // digit run too short/long for a card; no other PII
      (3L, "code 1234 5678 90 and 11111111111111111111111111 end"),
      (4L, ""), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Corpus.piiCensus(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // independent-families contract: the ip, the phone AND the card all
    // count as phone-shaped runs → n_phone 3
    assert(got(1L) == ((1L, 1L, 3L, 1L, 0L)),
      s"valid row counts ${got(1L)}")
    assert(got(2L) == ((0L, 0L, 2L, 0L, 1L)), s"gate row ${got(2L)}")
    assert(got(3L)._4 == 0L && got(3L)._5 == 0L, s"sized-out ${got(3L)}")
    assert(got(4L) == ((0L, 0L, 0L, 0L, 0L)))
    assert(got(5L) == ((0L, 0L, 0L, 0L, 0L)), "null text is a zero row")
  }

  test("readabilityCensus: hand counts, clamps, empty/null totality") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The quick brown fox. It jumps! Over"), // 7 w, 2 sent, 8 syl
      (2L, "no punctuation here"),                 // sentence clamp → 1
      (3L, "123 456"),                             // vowelless clamp → 1 each
      (4L, ""), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Corpus.readabilityCensus(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    val ease1 = BigDecimal(206.835 - 1.015 * (7.0 / 2.0) - 84.6 * (8.0 / 7.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((7L, 2L, 8L, Some(ease1))), got(1L).toString)
    assert(got(2L)._2 == 1L, "unpunctuated text is one sentence, not /0")
    assert(got(3L) == ((2L, 1L, 2L, got(3L)._4)) && got(3L)._4.isDefined)
    assert(got(4L) == ((0L, 0L, 0L, None)))
    assert(got(5L) == ((0L, 0L, 0L, None)), "null text is a zero row")
  }

  test("readabilityCensus: doc-level syllable count == per-token formula on fuzzed Unicode") {
    import spark.implicits._
    // the round-14 implementation, verbatim: per-token vowel-run count
    // with the >= 1 clamp — the doc-level rewrite must be value-equal
    def perTokenSyllables(txt: org.apache.spark.sql.Column) = {
      val t = coalesce(txt, lit(""))
      aggregate(
        transform(TextFunctions.tokens(t), tok =>
          greatest(size(regexp_extract_all(lower(tok), lit("[aeiouy]+"),
            lit(0))), lit(1))),
        lit(0), (a, x) => a + x)
    }
    val rnd = new scala.util.Random(1504)
    val alphabet =
      "aeiouyAEIOUY bcdXYZ0189.!?\t\nÆæéÉΣσς中文 %$*-_~  "
    val docs = (1L to 300L).map { i =>
      val n = rnd.nextInt(60)
      (i, (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    } :+ (301L, "") :+ (302L, "ΑΣ ΒΣ xyz") :+ (303L, "rhythm 123 ---")
    val df = docs.toDF("doc_id", "text")
    val got = Corpus.readabilityCensus(df, "doc_id", "text")
      .select(col("doc_id"), col("n_syllables"))
    val want = df.select(col("doc_id"),
      perTokenSyllables(col("text")).cast("long").as("n_syllables"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "doc-level rewrite diverged from the per-token formula")
  }

  test("zipfFit matches an independent driver-side OLS on a fuzzed corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(1505)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val docs = (1L to 200L).map { i =>
      val n = 1 + rnd.nextInt(30)
      // min of two uniforms skews the distribution Zipf-ward
      (i, (0 until n)
        .map(_ => words(math.min(rnd.nextInt(10), rnd.nextInt(10))))
        .mkString(" "))
    }
    val got = Corpus.zipfFit(docs.toDF("doc_id", "text"), "text",
      maxRank = 7).collect()(0)
    // independent reference: plain Scala counts + the same
    // decimal-15-term OLS the operator promises
    val top = docs.flatMap(_._2.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }.toSeq
      .sortBy { case (w, c) => (-c, w) }.take(7)
    val xs = top.zipWithIndex.map { case ((_, c), i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble)) }
    def d15(v: Double) =
      BigDecimal(v).setScale(15, BigDecimal.RoundingMode.HALF_UP)
    def r9(v: Double) =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n = xs.size.toDouble
    val sx = xs.map(p => d15(p._1)).sum.toDouble
    val sy = xs.map(p => d15(p._2)).sum.toDouble
    val sxy = xs.map(p => d15(p._1 * p._2)).sum.toDouble
    val sxx = xs.map(p => d15(p._1 * p._1)).sum.toDouble
    val syy = xs.map(p => d15(p._2 * p._2)).sum.toDouble
    val dn = n * sxy - sx * sy
    val dx = n * sxx - sx * sx
    val dy = n * syy - sy * sy
    assert(got.getLong(0) == 7L)
    assert(got.getDouble(1) == r9(dn / dx), "slope")
    assert(got.getDouble(2) == r9((sy - (dn / dx) * sx) / n), "intercept")
    assert(got.getDouble(3) == r9((dn * dn) / (dx * dy)), "r2")
  }

  test("zipfFit on an exact power-law reads slope -1, r2 1") {
    import spark.implicits._
    // counts 120/r for ranks 1..4 — exactly ln c = ln 120 - 1 * ln r
    val text = Seq.fill(120)("w1") ++ Seq.fill(60)("w2") ++
      Seq.fill(40)("w3") ++ Seq.fill(30)("w4")
    val df = Seq((1L, text.mkString(" "))).toDF("doc_id", "text")
    val got = Corpus.zipfFit(df, "text", maxRank = 500).collect()(0)
    assert(got.getLong(0) == 4L, "maxRank beyond vocab: n_ranks = vocab")
    assert(math.abs(got.getDouble(1) - (-1.0)) < 1e-8, s"slope ${got.getDouble(1)}")
    assert(math.abs(got.getDouble(3) - 1.0) < 1e-8, s"r2 ${got.getDouble(3)}")
  }

  test("vocabGrowth: hand curve with empty/null docs") {
    import spark.implicits._
    val hand = Seq(
      (0L, "a b a"), (1L, "b c"), // bucket 0: 5 tokens, new {a,b,c}
      (2L, "c d"), (3L, ""),      // bucket 1: 2 tokens, new {d}
      (4L, null.asInstanceOf[String]), (5L, "a e e")) // bucket 2: 3, {e}
      .toDF("doc_id", "text")
    val got = Corpus.vocabGrowth(hand, "doc_id", "text", bucketWidth = 2L)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq((0L, 2L, 3L, 5L, 3L), (1L, 2L, 1L, 7L, 4L),
      (2L, 2L, 1L, 10L, 5L)), got.toString)
  }

  test("vocabGrowth cum columns equal true prefix counts on fuzzed docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(1506)
    val words = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j",
      "k", "l")
    val docs = (0L until 120L).map { i =>
      (i, (0 until rnd.nextInt(8)).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" "))
    }
    val w = 7L
    val got = Corpus.vocabGrowth(docs.toDF("doc_id", "text"), "doc_id",
        "text", bucketWidth = w)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.nonEmpty)
    got.foreach { case (b, (cumTok, cumTyp)) =>
      val toks = docs.filter(_._1 < (b + 1) * w)
        .flatMap(_._2.split("\\s+").filter(_.nonEmpty))
      assert(cumTok == toks.size.toLong, s"bucket $b tokens")
      assert(cumTyp == toks.distinct.size.toLong, s"bucket $b types")
    }
  }

  test("jmNll matches an independent driver LM on a fuzzed corpus (OOV incl.)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1509)
    val words = Vector("a", "b", "c", "d", "e", "oovx", "oovy")
    val docs = (0L until 80L).map { i =>
      val n = rnd.nextInt(12)
      // test docs (i % 4 == 3) may draw the two words train never sees
      (i, (0 until n)
        .map(_ => words(rnd.nextInt(if (i % 4 == 3) 7 else 5)))
        .mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = Corpus.jmNll(df, df.where(col("doc_id") % 4 < 3),
        "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    def toks(s: String) = s.split("\\s+").filter(_.nonEmpty).toSeq
    val trainDocs = docs.filter(_._1 % 4 < 3)
    val uni = trainDocs.flatMap(d => toks(d._2)).groupBy(identity)
      .map { case (w, x) => w -> x.size.toLong }
    val N = uni.values.sum; val V = uni.size.toLong
    val big = trainDocs.flatMap { d => val t = toks(d._2); t.zip(t.drop(1)) }
      .groupBy(identity).map { case (p, x) => p -> x.size.toLong }
    def d15(v: Double) =
      BigDecimal(v).setScale(15, BigDecimal.RoundingMode.HALF_UP)
    def r9(v: Double) =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    var sawOov = false
    docs.foreach { case (i, txt) =>
      val t = toks(txt); val bgs = t.zip(t.drop(1))
      val (nb, want) = got(i)
      assert(nb == bgs.size.toLong, s"doc $i n_bigrams")
      if (bgs.isEmpty) assert(want.isEmpty, s"doc $i null avg")
      else {
        val terms = bgs.groupBy(identity).toSeq.map { case (p @ (w1, w2), xs) =>
          val ccur = uni.getOrElse(w2, 0L); val c12 = big.getOrElse(p, 0L)
          val nll = uni.get(w1) match {
            case Some(cp) =>
              math.log((4L * cp * (N + V)).toDouble) -
                math.log((3L * c12 * (N + V) + 1L * cp * (ccur + 1L)).toDouble)
            case None =>
              sawOov = true
              math.log((N + V).toDouble) - math.log((ccur + 1L).toDouble)
          }
          d15(xs.size.toDouble * nll)
        }
        assert(want.get == r9(terms.sum.toDouble / bgs.size.toDouble),
          s"doc $i avg_nll")
      }
    }
    assert(sawOov, "fixture must exercise the OOV-history branch")
  }

  test("chi2Collocations matches an independent driver contingency computation") {
    import spark.implicits._
    val rnd = new scala.util.Random(1507)
    val words = Vector("new", "york", "the", "of", "and", "city", "state")
    val docs = (1L to 150L).map { i =>
      val n = 2 + rnd.nextInt(20)
      (i, (0 until n).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    }
    val got = Corpus.chi2Collocations(docs.toDF("doc_id", "text"), "text",
        k = 10, minCount = 3L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6))))
    // independent reference over plain Scala collections
    val bigs = docs.flatMap { case (_, t) =>
      val ts = t.split("\\s+").filter(_.nonEmpty); ts.zip(ts.drop(1)) }
    val bc = bigs.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val r1 = bc.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val c1 = bc.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val nb = bc.values.sum
    def chi(p: (String, String)): Double = {
      val cab = bc(p); val r = r1(p._1); val c = c1(p._2)
      val d = cab.toDouble * (nb - r - c + cab).toDouble -
        (r - cab).toDouble * (c - cab).toDouble
      val raw = (nb.toDouble * (d * d)) /
        ((r.toDouble * c.toDouble) * ((nb - r).toDouble * (nb - c).toDouble))
      BigDecimal(raw).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = bc.keys.filter(bc(_) >= 3L).toSeq
      .map(p => (p, chi(p)))
      .sortBy { case ((w1, w2), x) => (-x, w1, w2) }.take(10)
    assert(got.map(_._1).toSeq == want.map(_._1), "ranking order")
    got.foreach { case (p, (cab, r, c, n2, x)) =>
      assert(cab == bc(p) && r == r1(p._1) && c == c1(p._2) && n2 == nb &&
        x == chi(p), s"row $p")
    }
  }

  test("chi2Collocations ranks a glued pair above independent fillers") {
    import spark.implicits._
    val glued = Seq.fill(20)("hong kong").mkString(" ")
    val rnd = new scala.util.Random(1508)
    val noise = (0 until 200)
      .map(_ => Vector("a", "b", "c", "d")(rnd.nextInt(4))).mkString(" ")
    val df = Seq((1L, glued), (2L, noise)).toDF("doc_id", "text")
    val top = Corpus.chi2Collocations(df, "text", k = 3, minCount = 3L)
      .collect()(0)
    assert((top.getString(0), top.getString(1)) == (("hong", "kong")))
  }

  test("soundexCode: official vectors incl. H/W transparency and H-initials") {
    import spark.implicits._
    val cases = Seq(
      "Robert" -> "R163", "Rupert" -> "R163", "robert" -> "R163",
      "Ashcraft" -> "A261", "Ashcroft" -> "A261", // h-transparency
      "Tymczak" -> "T522", "Pfister" -> "P236",   // first-letter run
      "Honeyman" -> "H555", "Jack" -> "J200", "O'Brien" -> "O165",
      "Whit" -> "W300",                            // w-initial
      "Smith" -> "S530", "Smyth" -> "S530",
      "a" -> "A000", "Aeiou" -> "A000", "HW" -> "H000",
      "Chkhc" -> "C000",   // deep c-h-k-h-c chain merges into the head
      "Ckhck" -> "C000")   // adjacent + h-linked equal codes, one run
    val got = cases.map(_._1).toDF("t")
      .select(col("t"), TextFunctions.soundexCode(col("t")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (t, want) => assert(got(t) == want, s"$t -> $want") }
    val nulls = Seq("123", "...", "").toDF("t")
      .select(TextFunctions.soundexCode(col("t"))).collect()
    assert(nulls.forall(_.isNullAt(0)), "letterless tokens code to null")
  }

  test("phoneticVariants buckets spelling variants with counts and witnesses") {
    import spark.implicits._
    val df = Seq((1L, "Robert Rupert robert Smith"), (2L, "Smyth Smith xyz"))
      .toDF("doc_id", "text")
    val got = Corpus.phoneticVariants(df, "text", k = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(got("R163") == ((3L, 3L, "Robert", "robert")), got.toString)
    assert(got("S530") == ((2L, 3L, "Smith", "Smyth")), got.toString)
    assert(got.size == 2, "singleton buckets (xyz) drop")
  }

  test("ngramNovelty: prefix charging, within-doc dedup, short docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),       // abc, bcd — both novel
      (2L, "a b c x"),       // abc seen, bcx novel
      (3L, "a b"),           // < 3 tokens: no grams
      (4L, "a b c a b c"))   // distinct grams: abc(seen) bca cab
      .toDF("doc_id", "text")
    val got = Corpus.ngramNovelty(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got(1L) == ((2L, 2L, Some(1000000L))), got(1L).toString)
    assert(got(2L) == ((2L, 1L, Some(500000L))), got(2L).toString)
    assert(got(3L) == ((0L, 0L, None)), "short doc: no grams, null ppm")
    assert(got(4L) == ((3L, 2L, Some(666666L))), got(4L).toString)
  }

  test("charBigramEntropy: deterministic alternation reads zero conditional") {
    import spark.implicits._
    val df = Seq((1L, "abab"), (2L, "ba"), (3L, "x"), (4L, "")).toDF("doc_id", "text")
    val got = Corpus.charBigramEntropy(df, "text").collect()(0)
    // pairs: ab x2, ba x2; contexts a:2 b:2; N=4 — after 'a' always
    // 'b' and after 'b' always 'a': H(Y|X) = 0, H(X) = ln 2
    assert(got.getLong(0) == 4L && got.getLong(1) == 2L &&
      got.getLong(2) == 2L, got.toString)
    assert(got.getDouble(3) == 0.0, "alternation: zero conditional entropy")
    def d15(x: Double) =
      BigDecimal(x).setScale(15, BigDecimal.RoundingMode.HALF_UP)
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hm = (d15(2.0 * (math.log(4.0) - math.log(2.0))) +
      d15(2.0 * (math.log(4.0) - math.log(2.0)))).toDouble
    assert(got.getDouble(4) == r9(hm / 4.0), got.toString)
  }

  test("burrowsDelta: hand z-grid, zero-variance guard, pair shape") {
    import spark.implicits._
    // A: "x x", B: "x y" over top-2 words {x, y}: both words
    // z-standardize to +/-1, delta = (2 + 2) / 2 = 2 exactly
    val df = Seq(("A", "x x"), ("B", "x y")).toDF("src2", "text")
    val got = Corpus.burrowsDelta(df, "text", "src2", kWords = 2)
      .collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getString(0), r.getString(1), r.getLong(2)) == (("A", "B", 2L)))
    assert(r.getDouble(3) == 2.0, r.toString)
    // a word with identical shares everywhere contributes nothing
    val const = Seq(("A", "w w z"), ("B", "w w q"), ("C", "w w p"))
      .toDF("src2", "text")
    val pairs = Corpus.burrowsDelta(const, "text", "src2", kWords = 1)
      .collect()
    assert(pairs.length == 3 && pairs.forall(_.getDouble(3) == 0.0),
      "top word 'w' has zero cross-source variance -> all deltas 0")
  }

  test("simpsonRepeatRate: hand rational") {
    import spark.implicits._
    val df = Seq((1L, "a a b")).toDF("doc_id", "text")
    val r = Corpus.simpsonRepeatRate(df, "text").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 2L, 2L, 6L)), r.toString)
    assert(r.getDouble(4) == BigDecimal(2.0 / 6.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("jsDivergence: identical slices 0, disjoint ln2 / 1 bit") {
    import spark.implicits._
    val same = Seq(("A", "x x y"), ("B", "x x y")).toDF("s", "text")
    val s0 = Corpus.jsDivergence(same, "text", "s", "A", "B").collect()(0)
    assert(s0.getDouble(3) == 0.0, s0.toString)
    val disj = Seq(("A", "p p"), ("B", "q q q"), ("C", "p z"))
      .toDF("s", "text")
    val s1 = Corpus.jsDivergence(disj, "text", "s", "A", "B").collect()(0)
    assert(s1.getLong(0) == 2L && s1.getLong(1) == 3L &&
      s1.getLong(2) == 2L, "slice C excluded; union {p,q}")
    assert(math.abs(s1.getDouble(3) - math.log(2.0)) < 1e-9, s1.toString)
    assert(math.abs(s1.getDouble(4) - 1.0) < 1e-9, "disjoint = 1 bit")
  }

  test("keyness matches an independent G2 computation; enrichment sides") {
    import spark.implicits._
    val df = Seq(("en", "alpha alpha alpha beta beta"),
      ("zh", "beta beta gamma gamma gamma")).toDF("lang2", "text")
    val got = Corpus.keyness(df, "text", "lang2", "en", "zh", k = 10,
      minCount = 2L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4)))).toMap
    val (ta, tb) = (5L, 5L)
    def g2(a: Long, b: Long): Double = {
      def cell(o: Long, row: Long, colT: Long) =
        if (o > 0) o.toDouble * (math.log((o * (ta + tb)).toDouble) -
          math.log((row * colT).toDouble)) else 0.0
      val row = a + b; val rowC = (ta - a) + (tb - b)
      val raw = 2.0 * ((cell(a, row, ta) + cell(ta - a, rowC, ta)) +
        (cell(b, row, tb) + cell(tb - b, rowC, tb)))
      BigDecimal(raw).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got("alpha") == ((3L, 0L, g2(3L, 0L), "en")), got.toString)
    assert(got("gamma") == ((0L, 3L, g2(0L, 3L), "zh")), got.toString)
    assert(got("beta") == ((2L, 2L, g2(2L, 2L), "zh")),
      "balanced counts: G2 = 0, tie side goes to the else branch")
    assert(got("beta")._3 == 0.0, "equal shares carry no keyness")
  }

  test("codeProseCensus: hand feature counts on code vs prose vs empty") {
    import spark.implicits._
    val docs = Seq(
      (1L, "def main():\n    return f(x);\n"),
      (2L, "plain english prose about nothing much"),
      (3L, ""), (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Corpus.codeProseCensus(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getBoolean(7)))).toMap
    // doc 1: 3 lines (trailing \n), 1 indent, (): ( ) ( ) ; = 5
    // braces, kw def+return = 2, 0 camel -> 3*2+2*1+5+0 = 13, codey
    assert(got(1L) == ((3L, 1L, 5L, 2L, 0L, 13L, true)), got(1L).toString)
    assert(got(2L) == ((1L, 0L, 0L, 0L, 0L, 0L, false)), got(2L).toString)
    assert(got(3L) == ((0L, 0L, 0L, 0L, 0L, 0L, false)))
    assert(got(4L) == ((0L, 0L, 0L, 0L, 0L, 0L, false)), "null total")
  }

  test("rakeKeywords: hand phrase scores, breaks, caps, length guard") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the QUICK brown fox and the lazy dog"),
      (2L, "quick brown fox !!! lazy dog"),
      (3L, "v1 v2 v3 v4 v5")).toDF("doc_id", "text")
    val out = Corpus.rakeKeywords(docs, "text",
      Seq("the", "and"), k = 10, maxPhraseLen = 4).collect()
    val got = out.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // quick/brown/fox: freq 2, deg 6 -> 3.0 each; phrase = 9
    assert(got("quick brown fox") == ((2L, 3L, 9.0)), got.toString)
    // lazy/dog: freq 2, deg 4 -> 2.0 each; phrase = 4
    assert(got("lazy dog") == ((2L, 2L, 4.0)), got.toString)
    assert(got.size == 2, "the 5-word run dropped by the length guard")
    assert(out(0).getString(0) == "quick brown fox", "rank order")
  }

  test("burstiness: hand counts, Poisson floor, df gate") {
    import spark.implicits._
    val df = Seq((1L, "x x x y"), (2L, "y z"), (3L, "x z"), (4L, ""))
      .toDF("doc_id", "text")
    val got = Corpus.burstiness(df, "doc_id", "text", k = 30, minDf = 2L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got.keySet == Set("x", "y", "z"), "df >= 2 gate")
    // x: cf 4, df 2, sum_c2 10, D 4 -> burst 2, vmr ((10-4)/3)/1 = 2
    assert(got("x") == ((4L, 2L, 10L, 4L, 2.0, 2.0)), got("x").toString)
    // y: cf 2, df 2, sum_c2 2 -> burst 1, vmr ((2-1)/3)/0.5 = 2/3
    assert(got("y")._5 == 1.0 && got("y")._6 == 0.666666667, got("y").toString)
    // a token appearing exactly once everywhere is Poisson-flat: vmr 0
    val uni = Seq((1L, "u"), (2L, "u"), (3L, "u"), (4L, "u"))
      .toDF("doc_id", "text")
    val u = Corpus.burstiness(uni, "doc_id", "text", k = 1, minDf = 1L)
      .collect()(0)
    assert(u.getDouble(5) == 1.0 && u.getDouble(6) == 0.0)
  }

  test("packOffsets equals the naive global-window cumsum at any bucket width") {
    import org.apache.spark.sql.expressions.Window
    val base = spark.range(0, 300).select(
      (col("id") * 3).as("doc_id"), // sparse ids exercise empty buckets
      concat_ws(" ", (transform(sequence(lit(1), (col("id") % 7) + 1),
        _ => lit("w")))).as("text"))
    val naive = base.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("chunk_id",
        ((col("start_offset") - pmod(col("start_offset"), lit(100L))) / 100L).cast("long"))
    for (bw <- Seq(1L, 16L, 1000L)) {
      val out = Corpus.packOffsets(base, "doc_id", "text", seqLen = 100L, bucketWidth = bw)
      assert(naive.exceptAll(out).isEmpty && out.exceptAll(naive).isEmpty,
        s"bucketWidth=$bw")
    }
  }

  test("exactKPerStratum keeps min(k, |stratum|) rows, deterministically") {
    val base = spark.range(0, 400).select(
      col("id"), when(col("id") % 4 === 0, "en")
        .when(col("id") === 399, "solo").otherwise("xx").as("lang"))
    val out = Corpus.exactKPerStratum(base, "lang", "id", 7)
    val counts = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 7L, "xx" -> 7L, "solo" -> 1L))
    val again = Corpus.exactKPerStratum(base, "lang", "id", 7)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    assert(out.columns.toSeq == Seq("id", "lang")) // helper column dropped
  }

  test("quantizeInt8: values in [-127,127], max-magnitude element hits 127") {
    val out = Similarity.quantizeInt8(vecs, "id", "v")
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Int](2), r.getDouble(3))).toMap
    val (q1, s1) = out(1L)
    assert(q1 == Seq(64, -127, 32)) // scale = 127/2
    assert(s1 == 63.5)
    assert(out(2L)._1 == Seq(127, 85, -21))
    assert(out(3L) == ((Seq(0, 0, 0), 0.0))) // zero vector → scale 0
  }

  test("labelCentroids averages per label and dimension") {
    val out = Similarity.labelCentroids(vecs, "label", "v")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((0, 1L)) == 2.0)   // (1 + 3) / 2
    assert(out((0, 2L)) == 0.0)   // (-2 + 2) / 2
    assert(out((0, 3L)) == 0.0)   // (0.5 - 0.5) / 2
    assert(out((1, 1L)) == 0.0)
    assert(out.size == 6)
  }

  test("heavyHitters equals the exact HAVING answer at tiny capacity") {
    // capacity 3 on a corpus where exactly the tokens above N/3 should
    // survive; docs corpus: spam×4, hash×3, join×3, the×2, rest ×1 → N=20
    // (4+9+1+6? count: doc1 4, doc2 9, doc3 1, doc4 7 → N=21). Threshold
    // N/3 = 7 → no token qualifies; use capacity 5 → threshold 4.2 →
    // none; capacity 6 → 3.5 → spam(4). Assert against the directly
    // computed exact answer instead of hand-arithmetic.
    import spark.implicits._
    for (cap <- Seq(3, 6, 10, 100)) {
      val got = Corpus.heavyHitters(docs, "text", cap)
        .orderBy("token").as[(String, Long)].collect().toSeq
      val toks = docs.select(explode(
        graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      val n = toks.count()
      val want = toks.groupBy("token").count()
        .where(col("count").cast("double") > lit(n.toDouble / cap))
        .orderBy("token").as[(String, Long)].collect().toSeq
      assert(got == want, s"capacity $cap")
    }
  }

  test("heavyHittersByGroup applies each group's own threshold exactly") {
    import spark.implicits._
    for (cap <- Seq(2, 4, 50)) {
      val got = Corpus.heavyHittersByGroup(docs, "lang", "text", cap)
        .orderBy("lang", "token").as[(String, String, Long)].collect().toSeq
      val toks = docs.select(col("lang"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      val totals = toks.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = toks.groupBy("lang", "token").count().collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .filter { case (g, _, c) => c.toDouble > totals(g).toDouble / cap }
        .sortBy(t => (t._1, t._2)).toSeq
      assert(got == want, s"capacity $cap")
    }
  }

  test("misraGries summary is a superset of every true heavy hitter") {
    import spark.implicits._
    // skewed stream: "a" dominates, many singletons force evictions
    val stream = (1 to 400).map(_ => "a") ++ (1 to 100).map(i => s"t$i") ++
      (1 to 50).map(_ => "b")
    val ds = spark.createDataset(stream).repartition(7)
    val cap = 5
    val summary = ds.select(Corpus.misraGries(cap).toColumn).head().toSet
    val n = stream.size
    val exact = stream.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 > n / (cap + 1)).keySet
    assert(exact.subsetOf(summary),
      s"missing ${exact -- summary} from MG summary $summary")
    assert(summary.size <= cap)
  }
  // Mixture weighting: ⌊w⌋ deterministic copies + hash-decided extra;
  // reproducible across partitionings, copy_ids contiguous from 0.
  test("mixtureWeightedSample: multiplicities, determinism, copy ids") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("src", StringType)))
    val rows = (0L until 400L).map(i => Row(i, if (i % 4 == 0) "a" else "b"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val out = Corpus.mixtureWeightedSample(df, "src", "id",
      Map("a" -> 2.5, "b" -> 0.25))
    val got = out.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // every 'a' row appears 2 or 3 times, every 'b' row 0 or 1 times
    val byId = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byId.filter(k => k._1 % 4 == 0).values.forall(n => n == 2 || n == 3))
    assert(byId.filter(k => k._1 % 4 != 0).values.forall(_ == 1))
    // aggregate rates within a loose band of the weights
    val aCount = got.count(_._2 == "a"); val bCount = got.count(_._2 == "b")
    assert(aCount >= 200 && aCount <= 300, s"a: $aCount")   // 100 rows × 2.5
    assert(bCount >= 37 && bCount <= 113, s"b: $bCount")    // 300 rows × 0.25
    // copy ids are contiguous from 0 per surviving row
    got.groupBy(_._1).foreach { case (_, copies) =>
      assert(copies.map(_._3).sorted.toSeq == (0L until copies.length) )
    }
    // exact reproducibility on a different partitioning
    val got2 = Corpus.mixtureWeightedSample(df.repartition(7), "src", "id",
      Map("a" -> 2.5, "b" -> 0.25))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.sorted.toSeq == got2.sorted.toSeq)
  }
  // Hash split: every row gets exactly one label, proportions track the
  // fractions, and assignment depends only on the key — identical on any
  // partitioning (the property rand() splits lack).
  test("hashSplit: complete, proportional, repartition-invariant") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("src", StringType)))
    val rows = (0L until 2000L).map(i => Row(i, s"s${i % 3}"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Corpus.hashSplit(df, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got.size == 2000)
    val counts = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // 16-bit buckets over 2000 uniform-ish md5 keys: loose band
    assert(counts("train") > 1400 && counts("train") < 1800, counts.toString)
    assert(counts("val") > 100 && counts("val") < 320, counts.toString)
    assert(counts("test") > 100 && counts("test") < 320, counts.toString)
    val again = Corpus.hashSplit(df.repartition(7), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(again == got)
    // bad fractions fail loudly
    intercept[IllegalArgumentException] {
      Corpus.hashSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  // Stride interleave: row r of a weight-w source sits at (r-0.5)/w, so
  // any prefix [0, P) holds EXACTLY min(n_s, floor(P*w + 0.5)) rows of
  // each source — the even-spread guarantee, checked exactly.
  test("interleaveByWeight: exact per-source counts in every prefix") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("src", StringType)))
    val rows = (0L until 300L).map(i => Row(i, if (i % 3 == 0) "a" else "b"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val weights = Map("a" -> 3.0, "b" -> 0.5)
    val out = Corpus.interleaveByWeight(df, "src", "id", weights)
      .select(col("src"), col("interleave_pos"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val nPer = Map("a" -> 100, "b" -> 200)
    Seq(10.0, 50.0, 120.0, 500.0).foreach { p =>
      weights.foreach { case (src, w) =>
        val got = out.count(t => t._1 == src && t._2 < p)
        val want = math.min(nPer(src), math.floor(p * w + 0.5).toInt)
        assert(got == want, s"prefix $p source $src: $got vs $want")
      }
    }
    // deterministic across partitionings
    val again = Corpus.interleaveByWeight(df.repartition(7), "src", "id", weights)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sorted.toSeq
    val first = Corpus.interleaveByWeight(df, "src", "id", weights)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sorted.toSeq
    assert(again == first)
  }

  test("removeFrequentUnits drops cross-doc units, keeps order, restores empty docs") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val rows = Seq(
      Row(1L, "cookie banner\nunique alpha\nnav bar"),
      Row(2L, "nav bar\nunique beta\ncookie banner"),
      Row(3L, "cookie banner\nnav bar"),         // all units frequent → ""
      Row(4L, "solo line\nanother solo"),        // nothing removed
      Row(5L, "unique alpha"),                   // df("unique alpha") = 2 (docs 1, 5)
      Row(6L, ""),                               // split("") = [""], df = 1 → kept
      Row(7L, "first seven\ncookie banner\nlast seven")) // order preserved around a drop
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    val out = Corpus.removeFrequentUnits(df, "id",
        split(col("text"), "\n"), minDf = 2L, joiner = "\n")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("", 3L)))                // all three units cross-doc frequent
    assert(out(2L) == (("unique beta", 2L)))
    assert(out(3L) == (("", 2L)))
    assert(out(4L) == (("solo line\nanother solo", 0L)))
    assert(out(5L) == (("", 1L)))
    assert(out(6L) == (("", 0L)))
    assert(out(7L) == (("first seven\nlast seven", 1L)))
    assert(out.size == 7)
    // a unit repeated WITHIN one doc only (df = 1) survives
    val within = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "twice\ntwice"), Row(2L, "other"))), schema)
    val w = Corpus.removeFrequentUnits(within, "id",
        split(col("text"), "\n"), minDf = 2L, joiner = "\n")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(w(1L) == "twice\ntwice")
  }

  test("packSpans: spans tile each doc exactly and respect sequence bounds") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    // token counts 3, 10, 0 (drops out), 7, 25 with seqLen 8 → plenty of
    // boundary crossings at several bucket widths
    val rows = Seq(
      Row(1L, Seq.fill(3)("t").mkString(" ")),
      Row(2L, Seq.fill(10)("t").mkString(" ")),
      Row(3L, ""),
      Row(4L, Seq.fill(7)("t").mkString(" ")),
      Row(5L, Seq.fill(25)("t").mkString(" ")))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    for (bw <- Seq(1L, 2L, 64L)) {
      val out = Corpus.packSpans(df, "id", "text", seqLen = 8L, bucketWidth = bw)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      // empty doc contributes nothing
      assert(!out.exists(_._1 == 3L))
      // per doc: spans tile [0, n_tokens) contiguously
      out.groupBy(_._1).foreach { case (id, spans) =>
        val sorted = spans.sortBy(_._3)
        assert(sorted.map(_._6).sum == sorted.head._2, s"doc $id span lens")
        assert(sorted.head._5 == 0L, s"doc $id first span doc_start")
        sorted.sliding(2).filter(_.length == 2).foreach { w =>
          val (a, b) = (w(0), w(1))
          assert(b._5 == a._5 + a._6, s"doc $id spans not contiguous")
          assert(b._3 == a._3 + 1, s"doc $id skips a sequence")
          assert(b._4 == 0L, s"doc $id continuation must start its sequence")
        }
      }
      // per span: inside the sequence
      out.foreach { case (id, _, _, seqStart, _, len) =>
        assert(seqStart >= 0 && seqStart < 8 && len > 0 && seqStart + len <= 8,
          s"doc $id span outside sequence bounds")
      }
      // global: token mass is conserved across the packing
      assert(out.map(_._6).sum == 3 + 10 + 7 + 25)
      // sequences fill completely except (possibly) the last
      val bySeq = out.groupBy(_._3).map { case (s, xs) => s -> xs.map(_._6).sum }
      val lastSeq = bySeq.keys.max
      bySeq.foreach { case (s, tot) =>
        if (s != lastSeq) assert(tot == 8, s"sequence $s not full: $tot") }
    }
  }

  test("c4Gate: line and doc rules match the published heuristics") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val rows = Seq(
      // 3 good lines → kept
      Row(1L, "one two three.\nfour five six!\nseven eight nine?"),
      // unpunctuated + short lines die; only 1 survivor → not kept
      Row(2L, "no terminal punctuation here\nshort.\nten eleven twelve."),
      // quoted terminal counts; whitespace around lines is trimmed
      Row(3L, "  he said \"stop\" loudly \"\n a b c. \nd e f."),
      // brace ⇒ code ⇒ doc rejected even with 3 good lines
      Row(4L, "one two three.\nfour {five} six.\nseven eight nine."),
      // lorem ipsum rejected, case-insensitive
      Row(5L, "Lorem Ipsum dolor sit.\nfour five six.\nseven eight nine."),
      Row(6L, ""))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = Corpus.c4Gate(df, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) == (("one two three.\nfour five six!\nseven eight nine?", 3L, true)))
    assert(out(2L) == (("ten eleven twelve.", 1L, false)))
    assert(out(3L)._2 == 3L && out(3L)._3)
    assert(out(3L)._1 == "he said \"stop\" loudly \"\na b c.\nd e f.")
    assert(out(4L)._2 == 3L && !out(4L)._3) // lines fine, doc rejected
    assert(out(5L)._2 == 3L && !out(5L)._3)
    assert(out(6L) == (("", 0L, false)))
    assert(out.size == 6)
  }

  test("htmlExtract: script/style/comment removal, link-density boilerplate, entities") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("html", StringType)))
    val prose = "This paragraph is long enough to clear the thirty " +
      "character floor easily."
    val rows = Seq(
      // machinery dies wholesale; prose block survives
      Row(1L, "<html><head><style>p{x:1}</style><script>var a=\"</p>\";" +
        "</script></head><body><!-- c --><p>" + prose + "</p></body></html>"),
      // nav: 3 anchors, tiny text → link density kills it; prose stays
      Row(2L, "<div><a href=\"/\">Home</a> <a href=\"/a\">A</a> " +
        "<a href=\"/b\">B</a></div><p>" + prose + "</p>"),
      // one link inside long prose stays under 1 link / 10 chars
      Row(3L, "<p>" + prose + " With <a href=\"/m\">one link</a> only " +
        "and lots more text around it to dilute the anchor.</p>"),
      // short block dies by minBlockChars even with zero links
      Row(4L, "<p>Too short.</p>"),
      // entities unescape in the fixed order, &amp; last
      Row(5L, "<p>fish &amp; chips cost &lt;five&gt; &quot;euros&quot; " +
        "&#39;today&#39; and&nbsp;always more words here.</p>"),
      Row(6L, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = Corpus.htmlExtract(df, "id", "html")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(out(1L) == ((prose, 1L, 1L, true)))
    assert(out(2L) == ((prose, 2L, 1L, true))) // nav counted, not kept
    assert(out(3L)._3 == 1L && out(3L)._4 &&
      out(3L)._1.contains("one link only"))
    assert(out(4L) == (("", 1L, 0L, false)))
    assert(out(5L)._1 == "fish & chips cost <five> \"euros\" 'today' " +
      "and always more words here.")
    assert(out(6L) == (("", 0L, 0L, false)))
    assert(out.size == 6)
    // the gate is a pure projection: no exchange anywhere in its plan
    val plan = Corpus.htmlExtract(df, "id", "html")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    // outputs pruning (the urlCanonicalize lesson): a counts-only
    // consumer skips the clean_text join+unescape chain behind the
    // barrier, and the columns come back in the CALLER's order
    val counts = Corpus.htmlExtract(df, "id", "html",
      outputs = Seq("kept", "n_blocks_kept"))
    assert(counts.columns.toSeq == Seq("id", "kept", "n_blocks_kept"))
    val cm = counts.collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(cm(2L) == ((true, 1L)) && cm(4L) == ((false, 0L)))
    assert(!counts.queryExecution.executedPlan.toString
      .toLowerCase.contains("clean_text"))
  }

  test("curationFunnel: per-stage retention, monotone, token counts track cleaned text") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    // doc 1: survives both gates (3 terminal lines × 10 words, stoppy)
    val good = (1 to 3).map(_ =>
      "the cat and the dog have fun with that hat.").mkString("\n")
    val rows = Seq(
      Row(1L, good),
      // doc 2: dies at C4 (unpunctuated lines)
      Row(2L, "no terminal punctuation here at all folks\nstill none"),
      // doc 3: passes C4, dies at Gopher (too few words after clean)
      Row(3L, "one two three.\nfour five six.\nseven eight nine."),
      Row(4L, ""))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = Corpus.curationFunnel(df, "id", "text",
        minWords = 30, minStop = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L)._1 == "input" && out(0L)._2 == 4L)
    assert(out(1L)._1 == "c4_gate" && out(1L)._2 == 2L) // docs 1, 3
    assert(out(2L)._1 == "gopher_gate" && out(2L)._2 == 1L) // doc 1
    // tokens: stage 1 counts the CLEANED text (doc1 30 + doc3 9)
    assert(out(1L)._3 == 39L)
    assert(out(2L)._3 == 30L)
    // retention is monotone by construction
    assert(out(0L)._2 >= out(1L)._2 && out(1L)._2 >= out(2L)._2)
    assert(out(0L)._3 >= out(1L)._3 && out(1L)._3 >= out(2L)._3)
  }

  test("htmlLinks: both quote styles, document order, linkless docs emit nothing") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("html", StringType)))
    val rows = Seq(
      Row(1L, "<p>x</p><a href=\"https://a.com/1\">A</a> mid " +
        "<a class='y' href='/rel'>B</a><A HREF=\"http://b.io\">C</A>"),
      Row(2L, "<p>no links at all</p>"),
      Row(3L, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = Corpus.htmlLinks(df, "id", "html")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // document order via link_idx; case-insensitive tag match
    assert(out.toSeq.sortBy(r => (r._1, r._2)) == Seq(
      (1L, 0L, "https://a.com/1"), (1L, 1L, "/rel"), (1L, 2L, "http://b.io")))
  }

  test("htmlAnchorTexts: tag strip, entity chain, empty anchors kept as ''") {
    import spark.implicits._
    val df = Seq(
      (1L, "<a href=\"u1\">Read &amp; learn\n <b>more</b></a>" +
        "<a href='u2'><img src='i.png'/></a>" +
        "<a href=\"u3\">A &lt;tag&gt; &quot;q&quot; &#39;s&#39;</a>"),
      (2L, "<p>linkless</p>"))
      .toDF("id", "html")
    val out = Corpus.htmlAnchorTexts(df, "id", "html")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getString(3))).toSeq.sortBy(r => (r._1, r._2))
    assert(out == Seq(
      (1L, 0L, "u1", "Read & learn more"),
      (1L, 1L, "u2", ""),
      (1L, 2L, "u3", "A <tag> \"q\" 's'")))
  }

  test("anchorTermsTopK: per-target counts, deterministic tie ranks, k cutoff") {
    import spark.implicits._
    val links = Seq(
      ("u1", "fast spark engine"), ("u1", "Fast engine"), ("u1", "engine"),
      ("u2", ""), ("u2", "solo")).toDF("href", "anchor")
    val out = Corpus.anchorTermsTopK(links, "href", "anchor", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq.sortBy(r => (r._1, r._4))
    // u1: engine×3, fast×2 (case-folded), spark×1 cut by k=2;
    // u2: the empty anchor contributes no terms at all
    assert(out == Seq(
      ("u1", "engine", 3L, 1L), ("u1", "fast", 2L, 2L),
      ("u2", "solo", 1L, 1L)))
  }

  test("resolveLinks: RFC 3986 §5.4 normal reference-resolution examples") {
    import spark.implicits._
    // the RFC's own base (authority 'a', path /b/c/d;p, query ?q)
    val base = "http://a/b/c/d;p?q"
    val cases = Seq(
      "g:h" -> "g:h",
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q", // fragment stripped by design
      "g#s" -> "http://a/b/c/g",
      "g?y#s" -> "http://a/b/c/g?y",
      ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x",
      "g;x?y#s" -> "http://a/b/c/g;x?y",
      "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    val out = Corpus.resolveLinks(
        cases.map(_._1).toDF("href").withColumn("base", lit(base)),
        "href", "base")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    cases.foreach { case (href, want) =>
      assert(out(href) == want, s"href '$href'") }
  }

  test("resolveLinks: RFC 3986 §5.4.2 abnormal examples + engine edges") {
    import spark.implicits._
    val base = "http://a/b/c/d;p?q"
    val cases = Seq(
      // .. past root drops (RFC abnormal set)
      "../../../g" -> "http://a/g",
      "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      // fuzz-found regressions, pinned: a `..` may never consume a dot
      // segment the single-pass rules haven't cleared yet…
      "./././.." -> "http://a/b/",
      "cc/./././.." -> "http://a/b/c/",
      "cc/a/../../.." -> "http://a/b/",
      // …and an EMPTY segment is a poppable stack entry
      "x//../y" -> "http://a/b/c/x/y",
      "x///../y" -> "http://a/b/c/x//y",
      // dot-segments in the QUERY are data, not hierarchy
      "g?y/./x" -> "http://a/b/c/g?y/./x",
      "g?y/../x" -> "http://a/b/c/g?y/../x",
      // hierarchical absolute hrefs collapse their own dots (§5.2.2)
      "https://abs.example.com/a/b/../c?z" -> "https://abs.example.com/a/c?z",
      // protocol-relative takes the base scheme, keeps its own path
      "//proto.example.io/a/./b" -> "http://proto.example.io/a/b",
      // opaque schemes pass verbatim
      "mailto:x@example.com" -> "mailto:x@example.com")
    val out = Corpus.resolveLinks(
        cases.map(_._1).toDF("href").withColumn("base", lit(base)),
        "href", "base")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    cases.foreach { case (href, want) =>
      assert(out(href) == want, s"href '$href'") }
  }

  test("resolveLinks: pathless/odd bases, null and schemeless bases") {
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("href", StringType), StructField("base", StringType)))
    val rows = Seq(
      // empty base path ⇒ directory is '/'
      Row("g", "http://example.net"),
      Row("?q=1", "http://example.net"),
      Row("", "HTTP://WWW.Example.COM:80/Path/Page?utm_source=x#frag"),
      // case and port preserved verbatim (canonicalization is later)
      Row("../up", "HTTP://WWW.Example.COM:80/Path/Page?x=1"),
      // null / schemeless base: relative dies, absolute survives
      Row("g", null),
      Row("https://ok.example.org/x", null),
      Row("g", "not a url"),
      Row(null, "http://a/b"))
    val out = Corpus.resolveLinks(spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema), "href", "base")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1))) ->
        Option(r.getString(2))).toMap
    assert(out((Some("g"), Some("http://example.net"))) ==
      Some("http://example.net/g"))
    assert(out((Some("?q=1"), Some("http://example.net"))) ==
      Some("http://example.net?q=1"))
    assert(out((Some(""),
      Some("HTTP://WWW.Example.COM:80/Path/Page?utm_source=x#frag"))) ==
      Some("HTTP://WWW.Example.COM:80/Path/Page?utm_source=x"))
    assert(out((Some("../up"),
      Some("HTTP://WWW.Example.COM:80/Path/Page?x=1"))) ==
      Some("HTTP://WWW.Example.COM:80/up"))
    assert(out((Some("g"), None)) == None)
    assert(out((Some("https://ok.example.org/x"), None)) ==
      Some("https://ok.example.org/x"))
    assert(out((Some("g"), Some("not a url"))) == None)
    assert(out((None, Some("http://a/b"))) == None)
  }

  // ADVICE r12: Java's $ also matches before a trailing '\n' while the
  // oracle's RE2 $ matches only end-of-text; hrefs are captured with a
  // newline-admitting [^"']* class, so a trailing-newline href used to
  // dot-collapse/fragment-strip on the Spark side only. The patterns now
  // anchor with \z — this pins the ALIGNED (RE2) semantics: a trailing
  // newline defeats the end-anchored rules identically on both engines.
  test("resolveLinks: trailing-newline hrefs follow RE2 end-of-text anchoring") {
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("href", StringType), StructField("base", StringType)))
    val rows = Seq(
      Row("g/.\n", "http://h/a/b"),   // end-anchored dot rule must NOT fire
      Row("g#f\n", "http://h/a/b"),   // fragment after \n is not strippable
      Row("g\n", "http://h/a/b"))     // plain carry-through
    val out = Corpus.resolveLinks(spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema), "href", "base")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out("g/.\n") == "http://h/a/g/.\n")
    assert(out("g#f\n") == "http://h/a/g#f\n")
    assert(out("g\n") == "http://h/a/g\n")
  }

  test("trigramNll: Stupid-Backoff ladder — trigram, 0.4·bigram, 0.4²·unigram, 0.4²/N") {
    import spark.implicits._
    val train = Seq((100L, "a b c a b d")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c"), // seen trigram: c3=1, c12(a,b)=2 → ln2
      (2L, "x a b"), // bigram backoff: c23(a,b)=2, c(a)=2 → −ln0.4
      (3L, "x y c"), // unigram backoff: c(c)=1, N=6 → 2·−ln0.4 + ln6
      (4L, "x y z"), // unseen everywhere → 2·−ln0.4 + ln6
      (5L, "a b"))   // too short to score
      .toDF("doc_id", "text")
    val out = Corpus.trigramNll(docs, train, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    val b = 0.916290731874155 // −ln(0.4), the baked literal
    def close(got: Option[Double], want: Double): Boolean =
      got.exists(g => math.abs(g - want) < 1e-9)
    assert(out(1L)._1 == 1L && close(out(1L)._2, math.log(2.0)))
    assert(close(out(2L)._2, b + math.log(2.0) - math.log(2.0)))
    assert(close(out(3L)._2, b + b + math.log(6.0) - math.log(1.0)))
    assert(close(out(4L)._2, b + b + math.log(6.0)))
    assert(out(5L) == ((0L, None)))
  }

  test("pslRegisteredDomains: longest match, wildcard, exception, default rule") {
    import spark.implicits._
    val psl = Seq(
      "// comment lines and blanks are ignored", "",
      "com", "net", "uk", "co.uk", "au", "com.au", "io", "github.io",
      "*.play", "!www.play").toDF("suffix")
    val hosts = Seq(
      "www.example.com",        // plain TLD → example.com
      "news.example.co.uk",     // longest match co.uk beats uk
      "shop.com.au",            // com.au beats au
      "a.b.github.io",          // private-registry suffix → b.github.io
      "GitHub.IO",              // host IS a public suffix → null
      "Foo.Bar.PLAY",           // wildcard *.play → bar.play is the suffix
      "x.www.play",             // exception !www.play → suffix is play
      "cdn.example.org:8080",   // port stripped for matching, kept in key
      "unknowntld",             // default rule: bare TLD, no registrable
      "host.unknowntld").toDF("h")
    val out = Corpus.pslRegisteredDomains(hosts, "h", psl)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), Option(r.getString(2))))).toMap
    assert(out("www.example.com") == (("com", Some("example.com"))))
    assert(out("news.example.co.uk") == (("co.uk", Some("example.co.uk"))))
    assert(out("shop.com.au") == (("com.au", Some("shop.com.au"))))
    assert(out("a.b.github.io") == (("github.io", Some("b.github.io"))))
    assert(out("github.io") == (("github.io", None)))
    assert(out("foo.bar.play") == (("bar.play", Some("foo.bar.play"))))
    assert(out("x.www.play") == (("play", Some("www.play"))))
    // default rule * : org is not in this toy list
    assert(out("cdn.example.org:8080") == (("org", Some("example.org"))))
    assert(out("unknowntld") == (("unknowntld", None)))
    assert(out("host.unknowntld") ==
      (("unknowntld", Some("host.unknowntld"))))
    assert(out.size == 10) // distinct lowercased hosts
  }

  test("urlCanonicalizePsl: same canonical url/host, PSL-resolved rollup key") {
    import spark.implicits._
    val psl = Seq("com", "io", "github.io").toDF("suffix")
    val df = Seq(
      (1L, "https://A.B.GitHub.io/x?utm_source=t&k=1"),
      (2L, "http://www.example.com:80/y"),
      (3L, "not a url")).toDF("id", "url")
    val out = Corpus.urlCanonicalizePsl(df, "id", "url", psl)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.getString(2)),
          Option(r.getString(3))))).toMap
    assert(out(1L) == ((Some("https://a.b.github.io/x?k=1"),
      Some("a.b.github.io"), Some("b.github.io"))))
    // heuristic would also say example.com here; PSL agrees via 'com'
    assert(out(2L) == ((Some("http://www.example.com/y"),
      Some("www.example.com"), Some("example.com"))))
    assert(out(3L) == ((None, None, None)))
  }

  test("vocabCoverage: exact-match OOV counts, floor ppm, zero-token docs report zeros") {
    import spark.implicits._
    val docs = Seq((1L, "the cat sat"), (2L, "zzz qqq"), (3L, ""),
      (4L, "the the unknownword")).toDF("doc_id", "text")
    val vocab = Seq("the", "cat", "sat", "unused").toDF("token")
    val out = Corpus.vocabCoverage(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4))))
      .toMap
    assert(out(1L) == ((3L, 0L, Some(0L), 9L)))
    assert(out(2L) == ((2L, 2L, Some(1000000L), 6L)))
    assert(out(3L) == ((0L, 0L, None, 0L)))
    // 1 OOV of 3 → floor(1e6/3) = 333333
    assert(out(4L) == ((3L, 1L, Some(333333L), 17L)))
    assert(out.size == 4)
  }

  test("urlCanonicalize: case/port/fragment/tracker rules, registered-domain heuristic") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("url", StringType)))
    val rows = Seq(
      Row(1L, "HTTP://WWW.Example.COM:80/Path/Page?utm_source=x&b=2&a=1#frag"),
      Row(2L, "https://news.example.co.uk/a/7?id=7&utm_campaign=z"),
      Row(3L, "https://cdn.static.example.org:8080/lib.js?v=3&utm_medium=y&fbclid=f"),
      Row(4L, "http://example.net"),
      Row(5L, "https://Sub.Domain.Example.com/x%20y?gclid=abc"),
      Row(6L, "not-a-url"), // schemeless → null parts
      Row(7L, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = Corpus.urlCanonicalize(df, "id", "url")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.getString(2)),
          Option(r.getString(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    // scheme+host lowercase, :80 stripped, fragment gone, utm_ gone,
    // params sorted, PATH CASE PRESERVED
    assert(out(1L) == ((Some("http://www.example.com/Path/Page?a=1&b=2"),
      Some("www.example.com"), Some("example.com"), Some(1L))))
    // co.uk → three-label registered domain
    assert(out(2L) == ((Some("https://news.example.co.uk/a/7?id=7"),
      Some("news.example.co.uk"), Some("example.co.uk"), Some(1L))))
    // non-default port kept in host/canon, never in the domain key
    assert(out(3L) == ((Some("https://cdn.static.example.org:8080/lib.js?v=3"),
      Some("cdn.static.example.org:8080"), Some("example.org"), Some(2L))))
    // bare root normalizes to '/'
    assert(out(4L) == ((Some("http://example.net/"),
      Some("example.net"), Some("example.net"), Some(0L))))
    // all params stripped → no '?'; percent-escapes untouched
    assert(out(5L) == ((Some("https://sub.domain.example.com/x%20y"),
      Some("sub.domain.example.com"), Some("example.com"), Some(1L))))
    assert(out(6L) == ((None, None, None, None)))
    assert(out(7L) == ((None, None, None, None)))
    // the rollup groups by the canonical key: two docs, one URL
    val dup = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(1L, "http://a.com/p?utm_source=1"),
        Row(2L, "HTTP://A.COM:80/p"))), schema)
      .withColumn("n_chars", lit(10L))
    val stats = Corpus.domainStats(
        Corpus.urlCanonicalize(dup, "id", "url", carryCols = Seq("n_chars")),
        "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(stats.toSeq == Seq(("a.com", 2L, 1L, 20L, 1L)))
    // outputs come back in the CALLER's requested order — a positional
    // reader must find the columns where it asked for them
    val ord = Corpus.urlCanonicalize(df, "id", "url",
      outputs = Seq("host", "url_canon"))
    assert(ord.columns.toSeq == Seq("id", "host", "url_canon"))
    val o1 = ord.where(col("id") === 1L).collect().head
    assert(o1.getString(1) == "www.example.com" &&
      o1.getString(2) == "http://www.example.com/Path/Page?a=1&b=2")
  }

  test("dedupAgainstIndex drops exactly the indexed content") {
    import graft.functions.Dedup
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val oldRows = Seq(Row(1L, "alpha beta"), Row(2L, "gamma delta"))
    val newRows = Seq(
      Row(10L, "alpha beta"),   // re-crawl of old 1 → dropped
      Row(11L, "epsilon zeta"), // genuinely new → kept
      Row(12L, "gamma delta"),  // re-crawl of old 2 → dropped
      Row(13L, "alpha beta "))  // trailing space ≠ same content → kept
    val old = spark.createDataFrame(spark.sparkContext.parallelize(oldRows, 2), schema)
    val neu = spark.createDataFrame(spark.sparkContext.parallelize(newRows, 2), schema)
    val kept = Dedup.dedupAgainstIndex(neu, "text",
        Dedup.fingerprintIndex(old, "text"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 13L))
    // edit-robust variant: min-shingle fingerprint also catches the
    // trailing-space re-crawl
    val fp = (c: org.apache.spark.sql.Column) =>
      TextFunctions.minShingleFingerprint(c, 2)
    val keptRobust = Dedup.dedupAgainstIndex(neu, "text",
        Dedup.fingerprintIndex(old, "text", fp), fp)
      .collect().map(_.getLong(0)).toSet
    assert(keptRobust == Set(11L))
  }

  test("bpePairCounts: frequency-weighted adjacent char pairs, vocab-first") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    // "low" ×3 (two docs), "lower" ×1, "new" ×1, "a" (too short) ×1
    val rows = Seq(
      Row(1L, "low low lower"),
      Row(2L, "low new a"),
      Row(3L, ""))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val got = Corpus.bpePairCounts(df, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // lo: 3(low) + 1(lower) = 4; ow: 4; we: 1; er: 1; ne: 1; ew: 1
    assert(got == Map("lo" -> 4L, "ow" -> 4L, "we" -> 1L, "er" -> 1L,
      "ne" -> 1L, "ew" -> 1L))
  }

  test("curationReport: per-group funnel matches a driver recount") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("lang", StringType),
      StructField("text", StringType)))
    val good = (1 to 60).map(_ => "word").mkString(" ") + " the"
    val rows = Seq(
      Row(1L, "en", good), Row(2L, "en", "too short the"),
      Row(3L, "zh", good), Row(4L, "zh", null), Row(5L, "zh", ""))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = Corpus.curationReport(df, "id", "lang", "text",
        minWords = 30L, minStop = 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(out("en") == ((2L, 61L + 3L, 1L)))
    assert(out("zh") == ((3L, 61L, 1L)))
    // partitioning-invariant (decimal mean, not float avg)
    val a = Corpus.curationReport(df, "id", "lang", "text", 30L, 1)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val b = Corpus.curationReport(df.repartition(7), "id", "lang", "text", 30L, 1)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(a == b)
  }

  test("gopherGate: each published rule rejects independently") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val good = (1 to 60).map(_ => "sensible").mkString(" ") + " the and"
    val rows = Seq(
      Row(1L, good),                                        // passes all rules
      Row(2L, "the and short text here"),                   // < minWords
      Row(3L, (1 to 60).map(_ => "ab").mkString(" ") + " the and"), // mean len < 3
      Row(4L, (1 to 60).map(_ => "####").mkString(" ") + " the and " +
        (1 to 10).map(_ => "sensible").mkString(" ")),      // symbol ratio + alpha
      Row(5L, (1 to 60).map(_ => "sensible").mkString(" ")), // no stop words
      Row(6L, ""))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = Corpus.gopherGate(df, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5), r.getBoolean(6))).toMap
    assert(out(1L)._6, out(1L).toString)      // kept
    assert(!out(2L)._6 && out(2L)._1 < 50)    // word count
    assert(!out(3L)._6 && out(3L)._2 < 3.0)   // mean word length
    assert(!out(4L)._6 && out(4L)._3 >= 0.1)  // symbol ratio
    assert(!out(5L)._6 && out(5L)._5 == 0)    // stop words
    assert(!out(6L)._6 && out(6L)._1 == 0)    // empty
    // "word has a letter" via lower != upper: digits-only words excluded
    val digits = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(7L, (1 to 60).map(_ => "12345").mkString(" ") + " the and")), 1), schema)
    val d = Corpus.gopherGate(digits, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(4), r.getBoolean(6))).toMap
    assert(d(7L)._1 < 0.1 && !d(7L)._2)       // alpha fraction rejects
  }

  test("dedupWithinDoc keeps first occurrences in order, per doc only") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val rows = Seq(
      Row(1L, "nav body nav nav tail body"),  // repeats collapse, order kept
      Row(2L, "nav"),                          // cross-doc repeat is NOT touched
      Row(3L, ""))                             // empty doc stays empty
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = Corpus.dedupWithinDoc(df, "id", TextFunctions.tokens(col("text")))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("nav body tail", 3L)))
    assert(out(2L) == (("nav", 0L)))
    assert(out(3L) == (("", 0L)))
    // line granularity: same operator, units = split("\n")
    val multiline = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(4L, "header\nbody one\nheader\nbody two\nheader")), 1), schema)
    val l = Corpus.dedupWithinDoc(multiline, "id", split(col("text"), "\n"), "\n")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(l(4L) == (("header\nbody one\nbody two", 2L)))
  }

  test("nearDedupAgainstIndex: banded index catches mutated re-crawls") {
    import graft.functions.Dedup
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val oldRows = Seq(Row(1L, base), Row(2L, "completely different content " +
      "one two three four five six seven eight nine ten eleven twelve"))
    // re-crawl: one word dropped from base; novel: disjoint vocabulary
    val newRows = Seq(
      Row(10L, base.split(" ").patch(7, Nil, 1).mkString(" ")),
      Row(11L, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii hh gg"))
    val old = spark.createDataFrame(spark.sparkContext.parallelize(oldRows, 1), schema)
    val neu = spark.createDataFrame(spark.sparkContext.parallelize(newRows, 1), schema)
    val index = Dedup.minhashBandIndex(old, "text", rowsPerBand = 2)
    val kept = Dedup.nearDedupAgainstIndex(neu, "id", "text", index,
        rowsPerBand = 2)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L), s"got $kept")
  }

  // VERDICT r12 item 4: the band-index append ritual mirrors
  // ivfIndexAppend — stored scheme, map-only append, loud mixed-build
  // refusal.
  test("minhashBandIndexAppend: append == rebuild; mixed schemes refuse") {
    import graft.functions.Dedup
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    def df(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val old = df(Seq(
      Row(1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      Row(2L, "one two three four five six seven eight nine ten eleven")))
    val batch = df(Seq(
      Row(10L, "alpha beta gamma delta epsilon zeta eta theta iota new"),
      Row(11L, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk")))
    val both = df(Seq(
      Row(1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      Row(2L, "one two three four five six seven eight nine ten eleven"),
      Row(10L, "alpha beta gamma delta epsilon zeta eta theta iota new"),
      Row(11L, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk")))
    val (params, index) = Dedup.minhashBandIndexBuild(old, "text",
      shingleN = 3, numHashes = 16, rowsPerBand = 2)
    // append = map-only keys of the batch under the STORED scheme;
    // old ∪ appended must equal a from-scratch rebuild key for key
    val appended = Dedup.minhashBandIndexAppend(params, batch, "text")
    val merged = index.unionByName(appended).distinct()
      .collect().map(_.get(0)).toSet
    val rebuilt = Dedup.minhashBandIndex(both, "text",
        shingleN = 3, numHashes = 16, rowsPerBand = 2)
      .collect().map(_.get(0)).toSet
    assert(merged == rebuilt)
    // the persisted-scheme probe still detects the near-dup re-crawl
    val kept = Dedup.nearDedupAgainstIndex(batch, "id", "text",
        index, shingleN = 3, numHashes = 16, rowsPerBand = 2)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L), s"got $kept")
    // a union of two different schemes' params must refuse loudly
    val (params2, _) = Dedup.minhashBandIndexBuild(old, "text",
      shingleN = 5, numHashes = 16, rowsPerBand = 4)
    val ex = intercept[IllegalArgumentException] {
      Dedup.minhashBandIndexAppend(params.unionByName(params2), batch, "text")
    }
    assert(ex.getMessage.contains("mixed-scheme"))
  }

  test("removeFrequentUnits: a hash collision cannot delete a rare unit") {
    // plant a collision with a deliberately weak hash (first character):
    // "common header" (df=3, boilerplate) collides with "celestial rarity"
    // (df=1) — under hash-only anti-join the rare unit would be deleted;
    // the exact-string recount must keep it (VERDICT r6 #6)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val rows = Seq(
      Row(1L, "common header\ncelestial rarity\nbody one"),
      Row(2L, "common header\nbody two"),
      Row(3L, "common header\nbody three"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val weakHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      u => substring(u, 1, 1) // "common…" and "celestial…" both hash to "c"
    val out = Corpus.removeFrequentUnitsWithHash(df, "id",
        split(col("text"), "\n"), minDf = 2L, joiner = "\n", weakHash)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // boilerplate gone everywhere, the colliding rare unit SURVIVES
    assert(out(1L) == (("celestial rarity\nbody one", 1L)))
    assert(out(2L) == (("body two", 1L)))
    assert(out(3L) == (("body three", 1L)))
  }

  test("trainLinearProbe equals an independent driver GD with decimal-exact sums") {
    val dim = 8; val lr = 1e-4; val rounds = 3
    val data = Seq(
      (1L, "en", "aa bb aa cc"),
      (2L, "de", "bb cc dd"),
      (3L, "en", "cc cc dd ee ff"),
      (4L, "de", ""),                 // no features, still a residual
      (5L, "en", "aa aa aa aa"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("text", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(t => Row(t._1, t._2, t._3)), 3), schema)
    val got = Corpus.trainLinearProbe(df, "doc_id", "text",
        when(col("lang") === "en", 1.0).otherwise(0.0), dim, rounds, lr)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

    // independent reimplementation: same md5 bucketing, double products,
    // decimal(30,15)-exact sums, scalar double updates
    def bucketOf(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 4), 16) % dim
    }
    def dsum(xs: Iterable[Double]): Double = {
      var s = java.math.BigDecimal.ZERO.setScale(15)
      xs.foreach(x => s = s.add(java.math.BigDecimal.valueOf(x)
        .setScale(15, java.math.RoundingMode.HALF_UP)))
      s.doubleValue
    }
    val feats: Map[Long, Map[Int, Long]] = data.map { case (id, _, text) =>
      id -> text.trim.split("\\s+").filter(_.nonEmpty)
        .groupBy(bucketOf).map { case (b, ts) => b -> ts.length.toLong }
    }.toMap
    val y = data.map(t => t._1 -> (if (t._2 == "en") 1.0 else 0.0)).toMap
    val w = Array.fill(dim)(0.0)
    for (_ <- 0 until rounds) {
      val pred = feats.map { case (id, fs) =>
        id -> dsum(fs.map { case (b, c) => w(b) * c.toDouble }) }
      val resid = y.map { case (id, yy) => id -> (pred(id) - yy) }
      val grad = feats.toSeq
        .flatMap { case (id, fs) => fs.map { case (b, c) => b -> (c.toDouble * resid(id)) } }
        .groupBy(_._1).map { case (b, xs) => b -> dsum(xs.map(_._2)) }
      grad.foreach { case (b, g) => w(b) = w(b) - lr * g }
    }
    val expect = w.zipWithIndex.map { case (v, b) =>
      b -> java.math.BigDecimal.valueOf(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue }.toMap
    assert(got.size == dim)
    expect.foreach { case (b, v) =>
      assert(got(b) == v, s"bucket $b: ${got(b)} vs $v") }
    // labels move label-bearing buckets off zero
    assert(got.values.exists(_ != 0.0))
  }

  test("scoreLinearProbe equals a driver dot on the published weights") {
    val dim = 8
    val data = Seq(
      (1L, "en", "aa bb aa cc"),
      (2L, "de", "bb cc dd"),
      (3L, "en", "cc cc dd ee ff"),
      (4L, "de", ""),                 // featureless: must score exactly 0
      (5L, "en", "aa aa aa aa"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("text", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(t => Row(t._1, t._2, t._3)), 3), schema)
    val wdf = Corpus.trainLinearProbe(df, "doc_id", "text",
      when(col("lang") === "en", 1.0).otherwise(0.0), dim, rounds = 3, lr = 1e-4)
    val got = Corpus.scoreLinearProbe(df, "doc_id", "text", wdf, dim)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // driver dot with the SAME published (9-dp-rounded) weights,
    // decimal(30,15)-exact accumulation, 9-dp-rounded output
    val w = wdf.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    def bucketOf(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 4), 16) % dim
    }
    def dsum(xs: Iterable[Double]): Double = {
      var s = java.math.BigDecimal.ZERO.setScale(15)
      xs.foreach(x => s = s.add(java.math.BigDecimal.valueOf(x)
        .setScale(15, java.math.RoundingMode.HALF_UP)))
      s.doubleValue
    }
    val expect = data.map { case (id, _, text) =>
      val fs = text.trim.split("\\s+").filter(_.nonEmpty)
        .groupBy(bucketOf).map { case (b, ts) => b -> ts.length.toLong }
      id -> java.math.BigDecimal.valueOf(
          dsum(fs.map { case (b, c) => w(b) * c.toDouble }))
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    }.toMap
    assert(got == expect)
    assert(got(4L) == 0.0)
  }

  test("urlFeatures: depth/params/ext algebra, ports, idn, schemeless nulls") {
    import spark.implicits._
    val urls = Seq(
      (1L, "https://a.example.com/x/y/z.HTML?a=1&b=2&&c=3"),
      (2L, "http://example.net"),                    // bare host: all zeros
      (3L, "https://cdn.example.org:8080/lib.min.js?v=7"),
      (4L, "http://xn--bcher-kva.example/a%20b/"),   // punycode label
      (5L, "https://10.0.0.1/deep//path/?"),         // digits, empty segs
      (6L, "not a url"),                             // schemeless → nulls
      (7L, "HTTP://HOST.COM:80/File.TXT"))           // default port strips
      .toDF("id", "url")
    val got = Corpus.urlFeatures(urls, "id", "url")
      .collect().map(r => r.getLong(0) -> r).toMap
    def f(id: Long) = {
      val r = got(id)
      (r.getString(2), r.getLong(3), r.getLong(5), r.getLong(6),
        r.getBoolean(7), r.getBoolean(8), r.getString(9))
    }
    assert(f(1L) == (("a.example.com", 3L, 3L, 3L, false, false, "html")))
    assert(f(2L) == (("example.net", 0L, 0L, 2L, false, false, "")))
    assert(f(3L) == (("cdn.example.org:8080", 1L, 1L, 3L, false, false,
      "js")), f(3L).toString) // port kept in host, stripped for labels
    assert(f(4L)._5 == false && f(4L)._6 == true && f(4L)._2 == 1L)
    assert(f(5L) == (("10.0.0.1", 2L, 0L, 4L, true, false, "")),
      f(5L).toString) // empty segments and empty params don't count
    assert((2 to 9).forall(got(6L).isNullAt), "schemeless must be all-null")
    assert(f(7L) == (("host.com", 1L, 0L, 2L, false, false, "txt")))
  }

  test("mojibakeRepair: round-trip, idempotence, hand examples, counts") {
    import spark.implicits._
    // independent WHATWG windows-1252 decoder (NOT Corpus's): indexes
    // transcribed from the Encoding Standard table, undefined bytes →
    // C1 controls — the JDK charset would U+FFFD them
    val whatwg = Map(0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ',
      0x84 -> '„', 0x85 -> '…', 0x86 -> '†',
      0x87 -> '‡', 0x88 -> 'ˆ', 0x89 -> '‰',
      0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
      0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’',
      0x93 -> '“', 0x94 -> '”', 0x95 -> '•',
      0x96 -> '–', 0x97 -> '—', 0x98 -> '˜',
      0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
      0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')
    def corrupt(s: String): String = s.getBytes("UTF-8")
      .map(b => whatwg.getOrElse(b & 0xFF, (b & 0xFF).toChar)).mkString
    // fuzz domain: the documented repairable set (Latin-1 supplement +
    // cp1252 specials + ASCII), MINUS the six artifact lead chars —
    // text already containing Ã/Â/Å/Æ/Ë/â is inherently ambiguous
    val leads = "ÃÂÅÆËâ".toSet
    val targets = Corpus.mojibakePairs.map(_._2).filterNot(t =>
      leads.contains(t.head)).mkString
    val alphabet = targets + "abc XYZ 09.!? "
    val rnd = new scala.util.Random(1509)
    val cases = (1L to 200L).map { i =>
      val n = rnd.nextInt(40)
      (i, (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    }
    val dirty = cases.map { case (i, s) => (i, corrupt(s)) }.toDF("id", "t")
    val got = Corpus.mojibakeRepair(dirty, "id", "t")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    cases.foreach { case (i, s) =>
      assert(got(i)._1 == s, s"round-trip failed for case $i: " +
        s"'${corrupt(s)}' repaired to '${got(i)._1}', want '$s'")
      // count arithmetic: every non-ASCII char in s costs one fix
      val n3 = s.count(c => c.toString.getBytes("UTF-8").length == 3).toLong
      val n2 = s.count(c => c.toString.getBytes("UTF-8").length == 2).toLong
      assert((got(i)._2, got(i)._3) == ((n3, n2)), s"counts for case $i")
      assert(got(i)._4 == (n3 + n2 > 0), s"flag for case $i")
    }
    // idempotence: artifact-free text (ASCII, CJK, already-repaired
    // output) is a fixpoint with zero counts
    val clean = Seq((1L, "plain ascii text."), (2L, "中文テキスト"),
      (3L, "mixed é ü ’ — clean"), (4L, ""), (5L, null.asInstanceOf[String]))
      .toDF("id", "t")
    Corpus.mojibakeRepair(clean, "id", "t").collect().foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L && !r.getBoolean(4),
        s"clean text flagged: $r")
    }
    // hand examples: the classic artifacts
    val hand = Seq((1L, "donâ€™t CafÃ© Â½ â‚¬5")).toDF("id", "t")
    val h = Corpus.mojibakeRepair(hand, "id", "t").head()
    assert(h.getString(1) == "don’t Café ½ €5", h.getString(1))
    assert(h.getLong(2) == 2L && h.getLong(3) == 2L) // ’ € | é ½
  }

  test("fastTextScore equals an independent driver scorer on fuzzed docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(1507)
    val dim = 32
    // dyadic weights (k/1024): exact in double AND at decimal scale 15,
    // so the equivalence pins the hash/feature/fold logic, not cast luck
    val w = Array.fill(dim)((rnd.nextInt(16385) - 8192) / 1024.0)
    val bias = -0.125
    val words = Vector("the", "ein", "fox", "数据", "naïve", "x1", "--",
      "Σmma", "a.b", "q")
    val docs = (1L to 150L).map { i =>
      val n = rnd.nextInt(12)
      (i, (0 until n).map(_ => words(rnd.nextInt(words.length)))
        .mkString(" "))
    } :+ (151L, "") :+ (152L, null.asInstanceOf[String]) :+ (153L, "solo")
    val df = docs.toDF("doc_id", "text")
    val got = Corpus.fastTextScore(df, "doc_id", "text", w.toSeq, bias)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getString(4))))
      .toMap
    def bucketOf(f: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 4), 16) % dim
    }
    def r9(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    docs.foreach { case (id, text) =>
      val toks = Option(text).getOrElse("").trim match {
        case "" => Array.empty[String]
        case t => t.split("\\s+")
      }
      val feats = toks ++ toks.sliding(2).filter(_.length == 2)
        .map(_.mkString(" "))
      var s = java.math.BigDecimal.ZERO.setScale(15)
      feats.foreach(f => s = s.add(java.math.BigDecimal
        .valueOf(w(bucketOf(f))).setScale(15, java.math.RoundingMode.HALF_UP)))
      val score =
        if (feats.nonEmpty) s.doubleValue / feats.length + bias else bias
      val prob = 1.0 / (1.0 + math.exp(-score))
      val label = if (score >= 0) "keep" else "drop"
      assert(got(id) == ((feats.length.toLong, r9(score), r9(prob), label)),
        s"doc $id: got ${got(id)}, want " +
          s"(${feats.length}, ${r9(score)}, ${r9(prob)}, $label)")
    }
    // bigrams=false drops the pair features
    val uni = Corpus.fastTextScore(df.where(col("doc_id") === 3L),
      "doc_id", "text", w.toSeq, bias, bigrams = false).head()
    val base = docs.find(_._1 == 3L).get._2.trim.split("\\s+")
      .filter(_.nonEmpty)
    assert(uni.getLong(1) == base.length.toLong)
  }

  test("unigramNll equals a driver unigram LM with decimal-exact sums") {
    val data = Seq(
      (1L, "aa bb aa cc"),
      (2L, "bb cc dd"),
      (3L, "cc cc dd ee ff"),
      (4L, ""),                        // no tokens: n_tokens 0, null nll
      (5L, "aa aa aa aa"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(t => Row(t._1, t._2)), 3), schema)
    val got = Corpus.unigramNll(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap

    def dsum(xs: Iterable[Double]): Double = {
      var s = java.math.BigDecimal.ZERO.setScale(15)
      xs.foreach(x => s = s.add(java.math.BigDecimal.valueOf(x)
        .setScale(15, java.math.RoundingMode.HALF_UP)))
      s.doubleValue
    }
    val toks = data.map { case (id, t) =>
      id -> t.trim.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val cnt = toks.values.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size }
    val n = cnt.values.sum
    val expect = data.map { case (id, _) =>
      val tf = toks(id).groupBy(identity).map { case (t, xs) => t -> xs.size }
      val nd = tf.values.sum.toLong
      val nll =
        if (nd == 0) None
        else Some(java.math.BigDecimal.valueOf(
            dsum(tf.map { case (t, f) =>
              f.toDouble * (math.log(n.toDouble) - math.log(cnt(t).toDouble)) }) /
              nd.toDouble)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue)
      id -> ((nd, nll))
    }.toMap
    assert(got == expect)
    assert(got(4L) == ((0L, None)))
    // the most repetitive doc (5: one token 4×) has the lowest nll
    val nlls = got.collect { case (id, (_, Some(v))) => id -> v }
    assert(nlls.minBy(_._2)._1 == 5L)
  }

  test("budgetSelectPerGroup equals per-group cumsum; absent groups get default") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("g", StringType),
      StructField("score", DoubleType), StructField("cost", LongType)))
    val rnd = new scala.util.Random(7)
    val rows = (0L until 300L).map(i =>
      Row(i, Seq("en", "zh", "de")(rnd.nextInt(3)), rnd.nextDouble(),
        (rnd.nextInt(90) + 10).toLong))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
    val budgets = Map("en" -> 3000L, "zh" -> 1000L) // de falls to default
    val default = 400L
    val expect = rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._2).flatMap { case (g, rs) =>
        val b = budgets.getOrElse(g, default)
        val sorted = rs.sortBy(t => (-t._3, t._1))
        sorted.scanLeft(0L)(_ + _._4).tail.zip(sorted)
          .map { case (cum, (id, _, _, _)) => id -> ((cum, cum <= b)) }
      }
    for (nb <- Seq(1, 7, 256)) {
      val got = Corpus.budgetSelectPerGroup(df, "id", "g", col("score"),
          col("cost"), budgets, default, nBuckets = nb)
        .collect().map(r => r.getLong(0) -> ((r.getLong(4), r.getBoolean(5)))).toMap
      assert(got == expect, s"nBuckets=$nb drifted from the per-group window")
    }
  }

  test("budgetSelect equals the single-window cumsum at any bucket count") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType),
      StructField("cost", LongType)))
    val rnd = new scala.util.Random(3)
    val rows = (0L until 500L).map(i =>
      Row(i, rnd.nextDouble(), (rnd.nextInt(90) + 10).toLong)) :+
      Row(500L, 0.5, 10L) :+ Row(501L, 0.5, 10L) // exact score ties
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 5), schema)
    val budget = 5000L
    // driver brute force: sort by (score desc, id), inclusive prefix sums
    val sorted = rows.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(t => (-t._2, t._1))
    val expect = sorted.scanLeft(0L)(_ + _._3).tail.zip(sorted)
      .map { case (cum, (id, _, _)) => id -> ((cum, cum <= budget)) }.toMap
    for (nb <- Seq(1, 7, 256)) {
      val got = Corpus.budgetSelect(df, "id", col("score"), col("cost"),
          budget, nBuckets = nb)
        .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
      assert(got == expect, s"nBuckets=$nb drifted from the global window")
    }
    // partitioning-invariant
    val again = Corpus.budgetSelect(df.repartition(11), "id", col("score"),
        col("cost"), budget)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again == expect.map { case (k, v) => k -> v._1 })
    // zero budget selects nothing; huge budget selects everything
    val none = Corpus.budgetSelect(df, "id", col("score"), col("cost"), 0L)
      .collect()
    assert(none.forall(!_.getBoolean(4)))
    val all = Corpus.budgetSelect(df, "id", col("score"), col("cost"), Long.MaxValue / 2)
      .collect()
    assert(all.forall(_.getBoolean(4)))
  }

  test("charEntropy: uniform text maxes, repeated char zeroes, empty is null") {
    import spark.implicits._
    val out = Corpus.charEntropy(
        Seq((1L, "abcd"), (2L, "aaaa"), (3L, ""), (4L, null: String),
          (5L, "aabb")).toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(out(1L)._1 == 4L)
    assert(math.abs(out(1L)._2.get - math.log(4.0)) < 1e-9) // 4 distinct chars
    assert(out(2L) == ((4L, Some(0.0))))                    // one repeated char
    assert(out(3L) == ((0L, None)) && out(4L) == ((0L, None)))
    // H("aabb") = ln 4 − (2·ln2 + 2·ln2)/4 = ln 2
    assert(math.abs(out(5L)._2.get - math.log(2.0)) < 1e-9)
  }

  test("bigramNll: seen / backoff / OOV branches and short-doc totality") {
    import spark.implicits._
    // train corpus: "a b" ×2, "a c" — c1: a=3 b=2 c=1, N=6;
    // c2: (a,b)=2, (a,c)=1
    val train = Seq((101L, "a b"), (102L, "a b"), (103L, "a c"))
      .toDF("id", "text")
    val score = Seq(
      (1L, "a b"),   // seen bigram: nll = ln 3 − ln 2
      (2L, "b b"),   // unseen bigram, b in vocab: −ln.4 + ln 6 − ln 2
      (3L, "a zz"),  // OOV continuation: −ln.4 + ln 6
      (4L, "a"),     // one token → no bigram
      (5L, "")       // empty → no bigram
    ).toDF("id", "text")
    val out = Corpus.bigramNll(score, train, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    val ln04 = 0.916290731874155
    assert(out(1L)._1 == 1L)
    assert(math.abs(out(1L)._2.get - (math.log(3.0) - math.log(2.0))) < 1e-9)
    assert(math.abs(out(2L)._2.get -
      (ln04 + math.log(6.0) - math.log(2.0))) < 1e-9)
    assert(math.abs(out(3L)._2.get - (ln04 + math.log(6.0))) < 1e-9)
    assert(out(4L) == ((0L, None)) && out(5L) == ((0L, None)))
  }

  test("dsirLogWeights: target-like docs rank above pool-like, empty is neutral") {
    import spark.implicits._
    val raw = Seq(
      (1L, "alpha beta alpha beta alpha beta"), // pure target vocabulary
      (2L, "noise junk noise junk noise junk"), // pure pool vocabulary
      (3L, "alpha beta noise junk"),            // mixed
      (4L, "")                                  // featureless
    ).toDF("id", "text")
    val target = raw.where(col("id") === 1L)
    val out = Corpus.dsirLogWeights(raw, target, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // n_feats = tokens + bigrams
    assert(out(1L)._1 == 11L && out(3L)._1 == 7L && out(4L)._1 == 0L)
    // ordering is the contract; absolute sign is smoothing-dependent on
    // a micro-corpus (add-1 over 256 buckets dwarfs single-digit counts)
    assert(out(1L)._2 > out(3L)._2 && out(3L)._2 > out(2L)._2)
    assert(out(2L)._2 < 0.0) // pure-pool vocabulary is unambiguously negative
    assert(out(4L)._2 == 0.0)
  }

  test("temperatureMixture: α=1 identity, α<1 flattens toward uniform") {
    import spark.implicits._
    val rows = (1 to 90).map(i => (i.toLong, "en")) ++
      (91 to 100).map(i => (i.toLong, "sw"))
    val df = rows.toDF("id", "lang")
    val id1 = Corpus.temperatureMixture(df, "lang", alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(id1("en") == 1.0 && id1("sw") == 1.0) // α=1: q = p, weight 1
    val half = Corpus.temperatureMixture(df, "lang", alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // q(sw) = √.1/(√.9+√.1) ≈ 0.25 — rare lang lifted 2.5×, common trimmed
    assert(half("sw")._1 == 10L && half("sw")._4 > 2.0)
    assert(half("en")._4 < 1.0)
    assert(math.abs(half("en")._3 + half("sw")._3 - 1.0) < 1e-9) // q sums to 1
    // composed resample follows the weights deterministically
    val sampled = Corpus.temperatureSample(df, "lang", "id", alpha = 0.5)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled("sw") > 10L && sampled("en") < 90L)
  }

  test("duplicateCoverage: shared spans count once per doc, short docs are null") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),       // bigrams shared with doc 2's prefix
      (2L, "a b c x y"),       // shares "a b", "b c" with doc 1
      (3L, "p q r s t"),       // fully novel
      (4L, "a b")              // shorter than n=2? no — has 1 bigram "a b"
    ).toDF("id", "text")
    val out = Corpus.duplicateCoverage(docs, "id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    // doc 1: grams ab bc cd de → ab,bc duplicated (docs 1,2) → 2/4
    assert(out(1L) == ((4L, 2L, Some(0.5))))
    // doc 2: ab bc cx xy → 2/4
    assert(out(2L) == ((4L, 2L, Some(0.5))))
    assert(out(3L) == ((4L, 0L, Some(0.0))))
    // doc 4: single gram "a b", df("a b") = 3 → fully duplicated
    assert(out(4L) == ((1L, 1L, Some(1.0))))
    // doc shorter than n has no gram: 0 counts, null fraction
    val short = Corpus.duplicateCoverage(
        Seq((9L, "solo")).toDF("id", "text"), "id", "text", n = 2)
      .collect().head
    assert(short.getLong(1) == 0L && short.getLong(2) == 0L && short.isNullAt(3))
  }

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("prioritySample ≡ brute-force priority sampling; estimators = max(w, τ)") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (i, 1L + (i * 37L) % 500L))
    val df = rows.toDF("id", "w")
    val k = 20
    val got = Corpus.prioritySample(df, "id", col("w"), k, seed = "tst")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)

    // independent reimplementation: 20-bit md5 draw, 2^-20 fixed point
    val scale = 1L << 20
    val pri = rows.map { case (id, w) =>
      val u = java.lang.Long.parseLong(md5hex(s"tst:$id").substring(0, 5), 16) + 1L
      (id, w, (w * scale * scale) / u)
    }
    val ranked = pri.sortBy { case (id, _, p) => (-p, id) }
    val tau = ranked(k)._3 // (k+1)-th priority
    val expect = ranked.take(k)
      .map { case (id, w, p) => (id, w, p, math.max(w * scale, tau)) }
      .sortBy(_._1)
    assert(got.toSeq == expect)
    // structural facts: τ bounds every selected priority; est ≥ w
    assert(got.forall { case (_, _, p, _) => p >= tau })
    assert(got.forall { case (_, w, _, e) => e >= w * scale })
    // unbiasedness smoke (deterministic under the fixed seed): Σ est over
    // the sample tracks Σ w — k=20 of 300 concentrated weights, so a
    // ±50 % band is far outside priority sampling's standard error.
    // This band is what catches a scale/draw-range mismatch: a wrong
    // fixed-point scale still ranks identically but yanks τ out of
    // weight units and the estimator sum collapses to ~Σ top-k w.
    val estSum = got.map(_._4).sum.toDouble / scale
    val total = rows.map(_._2).sum.toDouble
    assert(estSum > total * 0.5 && estSum < total * 1.5,
      s"estimator sum $estSum vs true total $total")
  }

  test("epochShuffle: exact permutation, deterministic, epoch-independent") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, s"p$i")).toDF("id", "payload")
    val e1 = Corpus.epochShuffle(df, "id", epoch = 1, nBuckets = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // exact permutation of [0, n)
    assert(e1.values.toSeq.sorted == (0L until 500L))
    // matches the reference order: sort by (h mod 16, h, id)
    val ref = (1L to 500L).map { id =>
      val h = java.lang.Long.parseLong(
        md5hex(s"shuf:1:$id").substring(0, 12), 16)
      (id, h % 16, h)
    }.sortBy { case (id, b, h) => (b, h, id) }
      .zipWithIndex.map { case ((id, _, _), pos) => id -> pos.toLong }.toMap
    assert(e1 == ref)
    // a different epoch is a different permutation (and still exact)
    val e2 = Corpus.epochShuffle(df, "id", epoch = 2, nBuckets = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(e2.values.toSeq.sorted == (0L until 500L))
    assert(e1 != e2)
    // bucket count does not change the distributional contract
    val e1b = Corpus.epochShuffle(df, "id", epoch = 1, nBuckets = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(e1b.values.toSeq.sorted == (0L until 500L))
  }

  test("pmiTopK: exact counts, exact-rational ranking, hand computation") {
    import spark.implicits._
    // corpus engineered so "x y" is a strong collocation and "a b" weak
    val lines = Seq.fill(6)("x y") ++ Seq.fill(6)("a b") ++
      Seq.fill(10)("a c") ++ Seq.fill(10)("d b") ++ Seq("e f")
    val df = lines.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = Corpus.pmiTopK(df, "text", k = 10, minCount = 5L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // every doc is one bigram: N = 33; c_x=c_y=6, c_a=c_b=16, c_c=c_d=10
    // ("e","f") is below minCount and must not appear
    val want = Seq( // ranked by c_ab·N/(c_a·c_b): 5.5 > {a c, d b: 2.0625} > 0.77
      ("x", "y", 6L, 6L, 6L, 33L),
      ("a", "c", 10L, 16L, 10L, 33L), // equal ratios — tie on w1
      ("d", "b", 10L, 10L, 16L, 33L),
      ("a", "b", 6L, 16L, 16L, 33L))
    assert(got.toSeq == want)
    assert(got.head._1 == "x" && got.head._2 == "y")
  }

  test("prioritySample: different seed → different sample; bad weight fails loudly") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, 1L + i % 7L)).toDF("id", "w")
    val a = Corpus.prioritySample(df, "id", col("w"), 10, seed = "s1")
      .collect().map(_.getLong(0)).toSet
    val b = Corpus.prioritySample(df, "id", col("w"), 10, seed = "s2")
      .collect().map(_.getLong(0)).toSet
    assert(a != b, "independent seeds almost surely draw different samples")
    val bad = (1L to 5L).map(i => (i, 0L)).toDF("id", "w")
    val e = intercept[Exception] {
      Corpus.prioritySample(bad, "id", col("w"), 2).collect()
    }
    assert(e.getMessage != null)
  }

  test("prioritySampleByGroup ≡ independent prioritySample per group; small groups take all") {
    import spark.implicits._
    // three groups with distinct sizes: 200, 120, and 8 (< k) rows
    val rows = (1L to 200L).map(i => (i, "en", 1L + (i * 37L) % 500L)) ++
      (201L to 320L).map(i => (i, "fr", 1L + (i * 53L) % 300L)) ++
      (321L to 328L).map(i => (i, "xx", 10L * i))
    val df = rows.toDF("id", "lang", "w")
    val k = 15
    val got = Corpus.prioritySampleByGroup(df, "id", col("w"), "lang", k,
        seed = "tst")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .groupBy(_._1).map { case (g, a) => g -> a.map(t =>
        (t._2, t._3, t._4, t._5)).sortBy(_._1).toSeq }
    // the per-group result IS prioritySample run on that group's slice:
    // seeding is key-only, so draws are identical on the filtered frame
    for (g <- Seq("en", "fr", "xx")) {
      val solo = Corpus.prioritySample(df.where(col("lang") === g)
          .select("id", "w"), "id", col("w"), k, seed = "tst")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1).toSeq
      assert(got(g) == solo, s"group $g diverges from the per-slice sample")
    }
    // the < k group is taken whole with τ = 0 ⇒ est_fp = w · 2^20 exactly
    assert(got("xx").size == 8)
    assert(got("xx").forall { case (_, w, _, e) => e == w * (1L << 20) })
  }

  test("applyChanges: last-writer-wins, delete, insert, pass-through") {
    import spark.implicits._
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (4L, "d", 40L), (5L, "e", 50L)).toDF("id", "text", "n")
    val nulS = lit(null).cast("string"); val nulL = lit(null).cast("long")
    val changes = Seq(
      (2L, 1L, "upsert", Some("b1"), Some(21L)),
      (2L, 2L, "upsert", Some("b2"), Some(22L)), // wins over seq 1
      (3L, 1L, "delete", None, None),            // id 3 gone
      (4L, 1L, "delete", None, None),
      (4L, 2L, "upsert", Some("d2"), Some(42L)), // upsert after delete wins
      (6L, 1L, "upsert", Some("new"), Some(60L)) // insert
    ).toDF("id", "seq", "op", "text", "n")
    val out = Corpus.applyChanges(base, changes, "id", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a", 10L), (2L, "b2", 22L),
      (4L, "d2", 42L), (5L, "e", 50L), (6L, "new", 60L)))
    // delete with the highest seq beats a stale upsert
    val del = Seq((1L, 1L, "upsert", Some("zz"), Some(99L)),
      (1L, 2L, "delete", None, None)).toDF("id", "seq", "op", "text", "n")
    val out2 = Corpus.applyChanges(base, del, "id", "seq", "op")
      .collect().map(_.getLong(0)).sorted
    assert(out2.toSeq == Seq(2L, 3L, 4L, 5L))
    // missing payload column is a contract violation, caught eagerly
    val bad = Seq((1L, 1L, "upsert", "zz")).toDF("id", "seq", "op", "text")
    intercept[IllegalArgumentException] {
      Corpus.applyChanges(base, bad, "id", "seq", "op")
    }
  }

  test("temporalSplit: per-key embargo anchors at last train row, boundaries strict") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("k", LongType),
      StructField("us", LongType)))
    val rows = Seq(
      Row(1L, 1L, 90L),   // train (90 < 100)
      Row(2L, 1L, 120L),  // embargoed (last=90, 120 < 140)
      Row(3L, 1L, 140L),  // eval: strict bound (140 !< 140)
      Row(4L, 2L, 110L),  // eval: key 2 has NO train rows → no embargo
      Row(5L, 3L, 100L),  // eval: cutoff itself is eval-side, no key-3 train
      Row(6L, 4L, null))  // null ts → null split
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .select(col("id"), col("k"), timestamp_micros(col("us")).as("ts"))
    val out = Corpus.temporalSplit(df, "k", "ts",
        cutoffUs = 100L, embargoUs = 50L)
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out == Map(
      1L -> Some("train"), 2L -> Some("embargoed"), 3L -> Some("eval"),
      4L -> Some("eval"), 5L -> Some("eval"), 6L -> None))
  }

  test("temporalSplit ≡ driver brute force on seeded random events") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(23)
    val cutoff = 500L
    val embargo = 120L
    val rows = Seq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
    val lastTrain = rows.filter(_._3 < cutoff).groupBy(_._2)
      .view.mapValues(_.map(_._3).max).toMap
    val expect = rows.map { case (id, k, us) =>
      id -> (if (us < cutoff) "train"
        else if (lastTrain.get(k).exists(lt => us < lt + embargo)) "embargoed"
        else "eval")
    }.toMap
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("k", LongType),
      StructField("us", LongType)))
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))),
        schema)
      .select(col("id"), col("k"), timestamp_micros(col("us")).as("ts"))
    val got = Corpus.temporalSplit(df, "k", "ts", cutoff, embargo)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == expect)
    // the whole point: every embargoed row would otherwise leak as eval
    assert(got.values.count(_ == "embargoed") > 0, "fixture never embargoed")
  }

  test("diversitySignals: ratios exact, single-token and empty docs null out") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b"),   // toks 4/2 distinct; bigrams: "a b","b a","a b" → 3/2
      (2L, "x"),         // one token: no bigrams
      (3L, ""),          // no tokens at all
      (4L, "p q r")      // all distinct: ttr 1e6, bigrams 2/2
    ).toDF("doc_id", "text")
    val out = Corpus.diversitySignals(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)),
          if (r.isNullAt(6)) None else Some(r.getLong(6))))).toMap
    assert(out(1L) == ((4L, 2L, 3L, 2L, Some(500000L), Some(666666L))))
    assert(out(2L) == ((1L, 1L, 0L, 0L, Some(1000000L), None)))
    assert(out(3L) == ((0L, 0L, 0L, 0L, None, None)))
    assert(out(4L) == ((3L, 3L, 2L, 2L, Some(1000000L), Some(1000000L))))
  }

  test("tokenShiftTopK: rate-difference order, one-sided tokens, equal rates shift zero") {
    import spark.implicits._
    val a = Seq("x x x y", "z").toDF("text")      // N_a = 5
    val b = Seq("x y y y y", "w w w w w").toDF("text") // N_b = 10
    val out = Corpus.tokenShiftTopK(a, b, "text", k = 10)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getDecimal(5).longValueExact))).toList
    // shifts: x |3·10−1·5|=25, y |1·10−4·5|=10, z |1·10−0|=10,
    // w |0−5·5|=25 — ties: (w before x at 25), (y before z at 10)
    assert(out == List(
      ("w", (0L, 5L, 25L)), ("x", (3L, 1L, 25L)),
      ("y", (1L, 4L, 10L)), ("z", (1L, 0L, 10L))))
  }

  test("retrievalEval: hits/first-rank/ppm metrics, no-rel queries excluded, dup qrels collapse") {
    import spark.implicits._
    val ranked = Seq(
      ("q1", 9L, 1L), ("q1", 2L, 2L), ("q1", 3L, 3L), // k=2 cuts rank 3
      ("q2", 5L, 1L), ("q2", 8L, 2L),
      ("q4", 1L, 1L)) // q4's relevant doc is not ranked at all
      .toDF("q", "doc", "rank")
    val qrels = Seq(
      ("q1", 2L), ("q1", 2L), ("q1", 3L), ("q1", 4L), // dup (q1,2) collapses
      ("q2", 5L),
      ("q3", 6L),  // q3 never ranked: still reported (hits 0)
      ("q4", 7L))
      .toDF("q", "doc")
    val out = Corpus.retrievalEval(ranked, qrels, "q", "doc", "rank", k = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getLong(4), r.getLong(5)))).toMap
    assert(out == Map(
      // q1: rel {2,3,4}, top-2 = {9,2} → 1 hit at rank 2
      "q1" -> ((3L, 1L, Some(2L), 500000L, 333333L)),
      "q2" -> ((1L, 1L, Some(1L), 500000L, 1000000L)),
      "q3" -> ((1L, 0L, None, 0L, 0L)),
      "q4" -> ((1L, 0L, None, 0L, 0L))))
  }

  test("rendezvousShard: moved keys go ONLY to the new shard, ~1/(n+1) of them") {
    import spark.implicits._
    val keys = (0 until 500).map(i => Tuple1(s"doc-$i-${i * 31}"))
      .toDF("k")
    val both = Corpus.rendezvousShard(
        Corpus.rendezvousShard(keys, "k", 16, "s16"), "k", 17, "s17")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    // the rendezvous stability guarantee, EXACT: adding shard 16 can
    // only change a key's argmax if 16 wins it — a moved key moves to
    // the new shard, never between old ones
    val moved = both.filter { case (_, a, b) => a != b }
    assert(moved.forall(_._3 == 16),
      s"keys moved between OLD shards: ${moved.filterNot(_._3 == 16).take(3).toSeq}")
    // expected moved fraction 1/17 ≈ 5.9%; 500 draws → generous bounds
    assert(moved.length > 8 && moved.length < 62, s"moved ${moved.length}/500")
    // every old shard gets keys (500 keys / 16 shards — an empty shard
    // would mean a biased hash)
    assert(both.map(_._2).distinct.length == 16)
    // deterministic: same input, same assignment
    val again = Corpus.rendezvousShard(keys, "k", 16, "s16")
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(both.forall { case (k, a, _) => again(k) == a })
  }
}
