package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.functions.{Corpus, TextFunctions}

class MatchExpressionsSpec extends SparkSpec {

  /** Per-phrase replace()-count reference: leftmost greedy
    * non-overlapping occurrences, each phrase independent.
    */
  private def bruteCounts(text: String, phrases: Seq[String]): Seq[Long] =
    phrases.map { p =>
      var n = 0L; var from = 0
      var i = text.indexOf(p, from)
      while (i >= 0) { n += 1; from = i + p.length; i = text.indexOf(p, from) }
      n
    }

  private val phrases = Seq("scan", "scan merge", "merge part", "aa", "été")

  test("multi_match_counts ≡ per-phrase replace-count on overlapping and unicode input") {
    val texts = Seq(
      "the fast key order sort table scan merge part window",
      "scan merge part scan merge part",
      "aaaa baa aa",
      "un été chaud, étéété",
      "", "no hits here")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(texts.zipWithIndex.map {
        case (t, i) => Row(i.toLong, t) }),
      StructType(Seq(StructField("id", LongType), StructField("t", StringType))))
    val got = df.select(col("id"),
        TextFunctions.blocklistCounts(col("t"), phrases).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == bruteCounts(t, phrases),
        s"text '$t': ${got(i.toLong)} vs ${bruteCounts(t, phrases)}")
    }
    // the load-bearing cases, pinned explicitly:
    //  - overlapping DIFFERENT phrases both count ("scan merge"+"merge part")
    assert(got(1L)(1) == 2L && got(1L)(2) == 2L)
    //  - self-overlap does NOT recount ("aa" in "aaaa" = 2, not 3;
    //    whole line "aaaa baa aa" = 2 + 1 + 1)
    assert(got(2L)(3) == 4L)
    //  - "scan" inside "scan merge" still counts (independent phrases)
    assert(got(1L)(0) == 2L)
  }

  test("multi_match_counts: null text → null; SQL registration agrees with DSL") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, null), Row(2L, "scan scan"))),
      StructType(Seq(StructField("id", LongType), StructField("t", StringType))))
    val rows = df.select(TextFunctions.blocklistCounts(col("t"), Seq("scan")))
      .collect()
    assert(rows.exists(_.isNullAt(0)))
    assert(rows.exists(r => !r.isNullAt(0) && r.getSeq[Long](0) == Seq(2L)))
    df.createOrReplaceTempView("mm_docs")
    graft.GraftSession.registerFunctions(spark)
    val viaSql = spark.sql(
      "SELECT multi_match_counts(t, array('scan', 'an')) FROM mm_docs WHERE id = 2")
      .collect().head.getSeq[Long](0)
    assert(viaSql == Seq(2L, 2L))
  }

  test("blocklistCensus rolls up per phrase; blocklistFilter gates on total hits") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "bad phrase here and bad phrase there"),
        Row(2L, "clean document"),
        Row(3L, "bad phrase once, worse thing twice: worse thing"),
        Row(4L, null))),
      StructType(Seq(StructField("id", LongType), StructField("t", StringType))))
    val census = Corpus.blocklistCensus(df, "t",
        Seq("bad phrase", "worse thing", "absent"))
      .orderBy("phrase").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(census.toSeq == Seq(("bad phrase", 2L, 3L), ("worse thing", 1L, 2L)))
    val kept = Corpus.blocklistFilter(df, "t", Seq("bad phrase", "worse thing"))
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(2L, 4L))
    // doc 1 has exactly 2 total hits (kept at maxHits=2); doc 3 has 3
    val lax = Corpus.blocklistFilter(df, "t", Seq("bad phrase", "worse thing"),
        maxHits = 2L)
      .collect().map(_.getLong(0)).sorted
    assert(lax.toSeq == Seq(1L, 2L, 4L))
  }

  test("unicode_normalize: NFC composes, NFD decomposes, NFKC folds compat") {
    val dec = "cafe\u0301"      // decomposed e + combining acute
    val pre = "caf\u00e9"       // precomposed \u00e9
    val lig = "\ufb01le"        // fi ligature (compatibility char)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, dec), Row(2L, pre), Row(3L, lig),
        Row(4L, "plain ascii"), Row(5L, null))),
      StructType(Seq(StructField("id", LongType), StructField("t", StringType))))
    import graft.functions.TextFunctions.unicodeNormalize
    val out = df.select(col("id"),
        unicodeNormalize(col("t"), "NFC").as("nfc"),
        unicodeNormalize(col("t"), "NFD").as("nfd"),
        unicodeNormalize(col("t"), "NFKC").as("nfkc"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else (r.getString(1), r.getString(2), r.getString(3)))).toMap
    assert(out(1L) == ((pre, dec, pre)))
    assert(out(2L) == ((pre, dec, pre)))
    assert(out(3L) == ((lig, lig, "file"))) // NFC keeps the ligature, NFKC folds it
    assert(out(4L) == (("plain ascii", "plain ascii", "plain ascii")))
    assert(out(5L) == null)
    // normalized dedup keys collapse the two encodings (the point of the op)
    val keys = df.where(col("id").isin(1L, 2L))
      .select(xxhash64(unicodeNormalize(col("t"), "NFC"))).distinct().count()
    assert(keys == 1L)
    // SQL registration + bad form fails loudly
    graft.GraftSession.registerFunctions(spark)
    df.createOrReplaceTempView("un_docs")
    assert(spark.sql("SELECT unicode_normalize(t, 'NFC') FROM un_docs WHERE id = 1")
      .collect().head.getString(0) == pre)
    val e = intercept[Exception] {
      spark.sql("SELECT unicode_normalize(t, 'NFX') FROM un_docs").collect()
    }
    assert(e.getMessage.contains("NFX") || e.getCause != null)
  }

  test("automaton scales: 1000-phrase list, counts still exact") {
    val many = (0 until 1000).map(i => s"tok$i")
    val text = "tok7 tok42 tok7 tok999 tok1000 tok99"
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, text))),
      StructType(Seq(StructField("id", LongType), StructField("t", StringType))))
    val got = df.select(TextFunctions.blocklistCounts(col("t"), many))
      .collect().head.getSeq[Long](0)
    assert(got == bruteCounts(text, many))
    // "tok100" is a prefix of "tok1000" — the automaton must count the
    // embedded shorter phrase ("tok1000" contains tok100), like indexOf
    assert(got(100) == 1L && got(999) == 1L && got(7) == 2L)
  }
}
