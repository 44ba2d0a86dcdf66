package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Properties for the round-11 curation/eval operators, sampled with
  * fixed seeds (the scalatest/scalacheck bridge isn't on the offline
  * classpath — the StatsPropertySpec pattern).
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  // --- urlCanonicalize: idempotence ------------------------------------
  // The canonical form is a fixed point: canonicalizing an already
  // canonical URL changes nothing. This is the property that makes the
  // column safe as a join/dedup key across pipeline stages that may
  // re-canonicalize defensively.
  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "ftp")
    www <- Gen.oneOf("", "www.", "WWW.")
    host <- Gen.oneOf("Example.COM", "a.b.example.co.uk", "x.io",
      "cdn.site.org", "localhost")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.oneOf("", "/", "/A/b", "/x%20y", "/p/q/r")
    params <- Gen.someOf(Seq("a=1", "b=2", "utm_source=x", "gclid=g",
      "z", "utm_campaign=c", "id=9"))
    frag <- Gen.oneOf("", "#frag", "#a/b?c")
  } yield {
    val q = if (params.isEmpty) "" else "?" + params.mkString("&")
    s"$scheme://$www$host$port$path$q$frag"
  }

  test("urlCanonicalize: canon is a fixed point on 60 sampled URLs") {
    val urls = (1 to 60).map(i => urlGen(Gen.Parameters.default,
      Seed(i.toLong)).get)
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
    val once = Corpus.urlCanonicalize(df, "id", "url")
      .select(col("id"), col("url_canon"), col("host"),
        col("registered_domain"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    val again = Corpus.urlCanonicalize(
        once.toSeq.map { case (i, (c, _, _)) => (i, c) }.toDF("id", "url"),
        "id", "url")
      .select(col("id"), col("url_canon"), col("host"),
        col("registered_domain"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    once.foreach { case (i, v) =>
      assert(again(i) == v, s"not a fixed point for ${urls(i.toInt - 0)}")
    }
  }

  // --- bpeByteEncode: losslessness on arbitrary Unicode ----------------
  // Valid-string generator spanning ASCII, Latin accents, CJK, and
  // 4-byte supplementary codepoints (built from code points, so no
  // lone surrogates — those aren't valid strings to begin with).
  private val wordGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 8)
    cps <- Gen.listOfN(n, Gen.oneOf(
      Gen.chooseNum('a'.toInt, 'z'.toInt),
      Gen.oneOf("éüñßçø".map(_.toInt)),
      Gen.oneOf("漢字日本語中".map(_.toInt)),
      Gen.oneOf(0x1F989, 0x1F600, 0x10348))) // owl, grin, Gothic hwair
  } yield cps.flatMap(Character.toChars(_).toSeq).mkString

  test("bpeByteEncode: decode(encode(text)) == normalized text on 40 sampled docs") {
    val docs = (1 to 40).map { i =>
      val nWords = Gen.chooseNum(0, 6)
        .apply(Gen.Parameters.default, Seed(i.toLong)).get
      val words = Gen.listOfN(nWords, wordGen)
        .apply(Gen.Parameters.default, Seed(1000L + i)).get
      (i.toLong, words.mkString(" "))
    }
    val out = Corpus.bpeByteEncode(docs.toDF("doc_id", "text"),
        "doc_id", "text", merges = Nil)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    docs.foreach { case (i, txt) =>
      val norm = txt.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(out(i) == norm, s"doc $i: '$txt'")
    }
  }

  // --- interpolate: segment form == naive reference --------------------
  private def refInterpolate(obs: Seq[(Long, Double)], maxGap: Long)
      : Map[Long, (Option[Double], String)] = {
    val sorted = obs.sortBy(_._1)
    val byT = sorted.toMap
    if (sorted.isEmpty) Map.empty
    else (sorted.head._1 to sorted.last._1).map { t =>
      byT.get(t) match {
        case Some(v) => t -> ((Some(v), "obs"))
        case None =>
          val (pt, pv) = sorted.takeWhile(_._1 < t).last
          val (nt, nv) = sorted.dropWhile(_._1 < t).head
          if (nt - pt <= maxGap)
            t -> ((Some(pv + (nv - pv) *
              ((t - pt).toDouble / (nt - pt).toDouble)), "interp"))
          else t -> ((None, "gap"))
      }
    }.toMap
  }

  test("interpolate == naive per-bucket reference on 12 sampled series") {
    (1 to 12).foreach { seed =>
      val n = Gen.chooseNum(1, 12)
        .apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val ts = Gen.listOfN(n, Gen.chooseNum(-20L, 20L))
        .apply(Gen.Parameters.default, Seed(100L + seed)).get.distinct
      val obs = ts.zipWithIndex.map { case (t, j) => (t, (j * 7 % 11).toDouble) }
      val maxGap = Gen.oneOf(2L, 3L, Long.MaxValue)
        .apply(Gen.Parameters.default, Seed(200L + seed)).get
      val df = obs.map { case (t, v) => (1L, t, v) }.toDF("k", "t", "v")
        .repartition(3)
      val got = Events.interpolate(df, "k", "t", "v", maxGap)
        .collect().map(r => r.getLong(1) ->
          ((if (r.isNullAt(2)) None else Some(r.getDouble(2)),
            r.getString(3)))).toMap
      val want = refInterpolate(obs, maxGap)
      assert(got == want, s"seed=$seed obs=$obs maxGap=$maxGap")
    }
  }
}
