package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RFC 9309 robots exclusion: group selection (robotsParse) and the
  * longest-match wildcard gate (robotsGate), with the regex-translation
  * matcher fuzzed against an independent greedy wildcard reference (no
  * regex) — the resolveLinks/htmlExtract lesson applied to the third
  * URL-family matcher.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  test("robotsParse: groups, comments, shared UA blocks, star fallback, empty rules drop") {
    val txt = Seq(
      "# global comment",
      "User-agent: *",
      "Disallow: /private/   # trailing comment",
      "Allow:", //                  empty value → no rule (RFC)
      "Crawl-delay: 10", //         unknown directive ignored
      "",
      "User-agent: graftbot",
      "User-Agent: otherbot", //    consecutive UA lines share the block
      "disallow: /graft/", //       case-insensitive directive
      "Allow: /graft/ok",
      "",
      "User-agent: GRAFTBOT", //    second group for the agent MERGES (RFC)
      "Disallow: /extra/"
    ).mkString("\n")
    val df = Seq(("Ex.com", txt)).toDF("host", "robots")
    def rules(agent: String) =
      Corpus.robotsParse(df, "host", "robots", agent).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rules("*") == Set(("ex.com", "disallow", "/private/")))
    assert(rules("graftbot") == Set(
      ("ex.com", "disallow", "/graft/"), ("ex.com", "allow", "/graft/ok"),
      ("ex.com", "disallow", "/extra/")))
    assert(rules("otherbot") == Set(
      ("ex.com", "disallow", "/graft/"), ("ex.com", "allow", "/graft/ok")))
    // an agent with no exact group falls back to the * groups
    assert(rules("nobody") == Set(("ex.com", "disallow", "/private/")))
  }

  test("robotsParse: CRLF bodies, blank lines inside a UA run, duplicate hosts refuse") {
    // the real-world HTTP case: CRLF line endings must not poison
    // agent tokens or patterns (Spark's trim strips spaces only)
    val crlfBody = "User-agent: *\r\nDisallow: /private/ # staff\r\n"
    val crlf = Corpus.robotsParse(
        Seq(("ex.com", crlfBody)).toDF("host", "robots"),
        "host", "robots", "*")
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(crlf == Set(("disallow", "/private/")))
    // a UTF-8 BOM before the first User-agent line must not defeat the
    // prefix match — an unstripped BOM would drop every rule and fail
    // the politeness gate OPEN (everything allowed)
    val bom = Corpus.robotsParse(
        Seq(("ex.com", "\uFEFF" + crlfBody)).toDF("host", "robots"),
        "host", "robots", "*")
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(bom == Set(("disallow", "/private/")))
    assert(Corpus.robotsSitemaps(
        Seq(("ex.com", "\uFEFFSitemap: https://ex.com/s.xml"))
          .toDF("host", "robots"), "host", "robots")
      .collect().map(_.getString(1)).toSet
      == Set("https://ex.com/s.xml"))
    // RFC 9309 grammar: blank/comment lines between User-agent lines
    // do NOT split the group-start run — both agents share the rules
    val gapped = Seq(
      "User-agent: graftbot",
      "",
      "# both bots share this block",
      "User-agent: otherbot",
      "Disallow: /x").mkString("\n")
    Seq("graftbot", "otherbot").foreach { ag =>
      val got = Corpus.robotsParse(
          Seq(("h.com", gapped)).toDF("host", "robots"),
          "host", "robots", ag)
        .collect().map(r => (r.getString(1), r.getString(2))).toSet
      assert(got == Set(("disallow", "/x")), s"agent $ag")
    }
    // two bodies for one host would interleave line numbering and
    // scramble groups silently — must refuse loudly instead
    val e = intercept[Exception] {
      Corpus.robotsParse(
          Seq(("dup.com", "User-agent: *\nDisallow: /a"),
            ("dup.com", "User-agent: *\nDisallow: /b"))
            .toDF("host", "robots"),
          "host", "robots", "*")
        .collect()
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("multiple robots bodies"), chain)
  }

  test("robotsSitemaps: agent-independent, CRLF-tolerant, URL colons survive") {
    val txt = Seq(
      "Sitemap: https://ex.com/sitemap.xml\r", //  CRLF line
      "User-agent: *",
      "Disallow: /x",
      "sitemap: https://ex.com/news.xml # comment", // ci key, comment
      "Sitemap:", //                                   empty → dropped
      "Sitemap: https://ex.com/sitemap.xml" //         duplicate collapses
    ).mkString("\n")
    val got = Corpus.robotsSitemaps(
        Seq(("Ex.com", txt)).toDF("host", "robots"), "host", "robots")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("ex.com", "https://ex.com/sitemap.xml"),
      ("ex.com", "https://ex.com/news.xml")))
  }

  test("robotsGate: RFC 9309 precedence table") {
    // (rules on this URL's host, path+query, expected allowed)
    val cases: Seq[(Seq[(String, String)], String, Boolean)] = Seq(
      (Seq("allow" -> "/p", "disallow" -> "/"), "/page", true),
      (Seq("allow" -> "/folder", "disallow" -> "/folder"), "/folder/x", true),
      (Seq("allow" -> "/page", "disallow" -> "/*.htm"), "/page.htm", false),
      (Seq("allow" -> "/$", "disallow" -> "/"), "/", true),
      (Seq("allow" -> "/$", "disallow" -> "/"), "/x", false),
      (Seq.empty, "/anything", true)) // no rules for the host → allowed
    val rules = cases.zipWithIndex.flatMap { case ((rs, _, _), i) =>
      rs.map { case (d, p) => (s"h$i.com", d, p) }
    } :+ (("unrelated.com", "disallow", "/")) // someone else's rules
    val urls = cases.zipWithIndex.map { case ((_, path, _), i) =>
      (i.toLong, s"http://h$i.com$path")
    }
    val out = Corpus.robotsGate(urls.toDF("id", "url"), "id", "url",
        rules.toDF("host", "directive", "pattern"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    cases.zipWithIndex.foreach { case ((_, path, want), i) =>
      assert(out(i.toLong) == want, s"case $i path $path")
    }
  }

  test("robotsCrawlDelay: group choice, max-merge, lenient values, run ends") {
    val bodies = Seq(
      // exact group beats *, decimal value
      ("a.com", "User-agent: *\nCrawl-delay: 10\n" +
        "User-agent: bot\nDisallow: /x\nCrawl-delay: 2.5"),
      // star-only: malformed ignored, max of survivors
      ("b.com", "User-agent: *\nCrawl-delay: 1\nCrawl-delay: zip\n" +
        "Crawl-delay: 4"),
      // exact group exists WITHOUT the directive: star must not leak
      ("c.com", "User-agent: bot\nDisallow: /a\n" +
        "User-agent: *\nCrawl-delay: 7"),
      // UA run shares the block; negative drops
      ("d.com", "User-agent: other\nUser-agent: bot\n" +
        "Crawl-delay: -3\nCrawl-delay: 0.5"),
      // a crawl-delay line ENDS a UA run (de-facto rule line): the
      // first UA's delay must NOT attach to the second UA's group
      ("e.com", "User-agent: *\nCrawl-delay: 9\n" +
        "User-agent: bot\nDisallow: /y"),
      // CRLF + comments + case-insensitive directive
      ("f.com", "user-AGENT: bot # ours\r\ncrawl-DELAY: 3 # slow\r\n"))
      .toDF("host", "robots")
    val got = Corpus.robotsCrawlDelay(bodies, "host", "robots", "bot")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a.com" -> 2.5, "b.com" -> 4.0, "d.com" -> 0.5,
      "f.com" -> 3.0), got.toString)
    // multiple bodies for one host refuse loudly
    val dup = Seq(("x.com", "User-agent: *\nCrawl-delay: 1"),
      ("x.com", "User-agent: *\nCrawl-delay: 2")).toDF("host", "robots")
    val e = intercept[Exception] {
      Corpus.robotsCrawlDelay(dup, "host", "robots").collect()
    }
    assert(Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString
      .contains("one body per host"))
  }

  test("robotsGate: RFC 3986 percent-encoding normalization") {
    // (rules for this case's host, path, expected allowed)
    val cases: Seq[(Seq[(String, String)], String, Boolean)] = Seq(
      // %2F stays distinct from a literal slash — in BOTH directions
      (Seq("disallow" -> "/a%2Fb"), "/a/b", true),
      (Seq("disallow" -> "/a/b"), "/a%2Fb", true),
      (Seq("disallow" -> "/a%2Fb"), "/a%2Fb", false),
      // hex case normalizes: %2f in the rule matches %2F in the path
      (Seq("disallow" -> "/a%2fb"), "/a%2Fb", false),
      (Seq("disallow" -> "/a%2Fb"), "/a%2fb", false),
      // unreserved octets decode on both sides: %7E == ~, %61 == a
      (Seq("disallow" -> "/%7Euser/*"), "/~user/docs", false),
      (Seq("disallow" -> "/~user/*"), "/%7Euser/docs", false),
      (Seq("disallow" -> "/%61dmin"), "/admin", false),
      // %2A never becomes a wildcard (reserved octet stays encoded)
      (Seq("disallow" -> "/x%2Ay"), "/xZZy", true),
      (Seq("disallow" -> "/x%2Ay"), "/x%2Ay", false),
      // malformed % is a literal octet, not an error
      (Seq("disallow" -> "/50%"), "/50%", false),
      (Seq("disallow" -> "/50%2"), "/50%2", false))
    val rules = cases.zipWithIndex.flatMap { case ((rs, _, _), i) =>
      rs.map { case (d, p) => (s"n$i.com", d, p) }
    }
    val urls = cases.zipWithIndex.map { case ((_, path, _), i) =>
      (i.toLong, s"http://n$i.com$path")
    }
    val out = Corpus.robotsGate(urls.toDF("id", "url"), "id", "url",
        rules.toDF("host", "directive", "pattern"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(4),
        r.getString(3)))).toMap
    cases.zipWithIndex.foreach { case ((_, path, want), i) =>
      assert(out(i.toLong)._1 == want,
        s"case $i path $path: ${out(i.toLong)}")
    }
    // the returned pathq is the NORMALIZED form actually matched
    assert(out(5L)._2 == "/~user/docs", out(5L)._2)
    assert(out(4L)._2 == "/a%2Fb", out(4L)._2)
  }

  /** Independent greedy wildcard matcher — segments between `*` found
    * leftmost in order, optional `$` pins the last segment to the end.
    * No java.util.regex anywhere.
    */
  private def refMatch(pattern: String, target: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val core = if (anchored) pattern.dropRight(1) else pattern
    val segs = core.split("\\*", -1).toList
    if (!target.startsWith(segs.head)) return false
    var pos = segs.head.length
    val mids = if (anchored) segs.tail.dropRight(1) else segs.tail
    for (sg <- mids) {
      val at = target.indexOf(sg, pos)
      if (at < 0) return false
      pos = at + sg.length
    }
    if (!anchored) true
    else if (segs.size == 1) pos == target.length
    else target.length - segs.last.length >= pos && target.endsWith(segs.last)
  }

  test("robots matcher == independent greedy wildcard reference on 250 pairs") {
    val segGen = Gen.stringOf(Gen.oneOf('a', 'b', '/', '.', 'h', 't', 'm'))
    val patGen: Gen[String] = for {
      n <- Gen.choose(1, 4)
      segs <- Gen.listOfN(n, segGen)
      lead <- Gen.oneOf("/", "*", "/*")
      anchor <- Gen.oneOf("", "$")
    } yield (lead + segs.mkString("*") + anchor)
    val pathGen: Gen[String] = for {
      segs <- Gen.listOfN(3, segGen)
      q <- Gen.oneOf("", "?id=1", "?a=b.htm")
    } yield "/" + segs.mkString("/") + q
    val cases = (1 to 250).map { i =>
      val p = patGen(Gen.Parameters.default, Seed(i.toLong)).get
      val t = pathGen(Gen.Parameters.default, Seed(10000L + i)).get
      (p, t)
    }.filter(_._1.nonEmpty)
    val rules = cases.zipWithIndex.map { case ((p, _), i) =>
      (s"h$i.com", "disallow", p)
    }.toDF("host", "directive", "pattern")
    val urls = cases.zipWithIndex.map { case ((_, t), i) =>
      (i.toLong, s"http://h$i.com$t")
    }.toDF("id", "url")
    val out = Corpus.robotsGate(urls, "id", "url", rules)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    cases.zipWithIndex.foreach { case ((p, t), i) =>
      assert(out(i.toLong) == !refMatch(p, t),
        s"pattern '$p' target '$t' engineAllowed=${out(i.toLong)}")
    }
  }
}
