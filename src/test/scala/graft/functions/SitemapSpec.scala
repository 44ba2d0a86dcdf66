package graft.functions

import graft.SparkSpec

/** sitemaps.org document parsing (sitemapParse) — the second half of
  * the crawl-seed chain robotsSitemaps starts: urlset / sitemapindex
  * roots, field trimming on pretty-printed bodies, the XML entity
  * chain on loc, the explicit two-pass index recursion, and the
  * fail-loud error posture (the robots fail-open lesson).
  */
class SitemapSpec extends SparkSpec {
  import spark.implicits._

  private def parse(rows: (Long, String)*) =
    Corpus.sitemapParse(rows.toSeq.toDF("id", "xml"), "id", "xml")

  test("urlset: fields, pretty-print trimming, entity unescape, lenient priority") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc> https://ex.com/p?id=1&amp;ref=home </loc>
        |    <lastmod>2026-08-01T10:00:00Z</lastmod>
        |    <changefreq>Daily</changefreq>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><loc>https://ex.com/q&apos;s</loc><priority>high</priority></url>
        |</urlset>""".stripMargin
    val got = parse((7L, xml)).orderBy("entry_idx").collect()
    assert(got.length == 2)
    val r0 = got(0)
    assert(r0.getLong(0) == 7L && r0.getLong(1) == 0L)
    assert(r0.getString(2) == "url")
    // &amp; unescapes (the spec REQUIRES & in URLs be escaped) and the
    // pretty-printer's surrounding whitespace trims away
    assert(r0.getString(3) == "https://ex.com/p?id=1&ref=home")
    assert(r0.getString(4) == "2026-08-01T10:00:00Z")
    assert(r0.getString(5) == "daily") // enum case normalized
    assert(r0.getDouble(6) == 0.8)
    val r1 = got(1)
    assert(r1.getString(3) == "https://ex.com/q's")
    assert(r1.isNullAt(4) && r1.isNullAt(5))
    assert(r1.isNullAt(6)) // malformed priority → null, not an error
  }

  test("sitemapindex: child sitemap URLs as kind=sitemap; explicit two-pass recursion") {
    val index =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        | <sitemap><loc>https://ex.com/maps/a.xml.gz</loc>
        |   <lastmod>2026-07-01</lastmod></sitemap>
        | <sitemap><loc>https://ex.com/maps/b.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val pass1 = parse((1L, index)).orderBy("entry_idx").collect()
    assert(pass1.map(_.getString(2)).toSeq == Seq("sitemap", "sitemap"))
    assert(pass1.map(_.getString(3)).toSeq ==
      Seq("https://ex.com/maps/a.xml.gz", "https://ex.com/maps/b.xml"))
    assert(pass1(0).getString(4) == "2026-07-01")
    // pass 2 = the caller fetches those locs and re-parses: index rows
    // never mix with url rows, so the recursion is an explicit join
    val child = """<urlset><url><loc>https://ex.com/1</loc></url></urlset>"""
    val pass2 = parse(pass1.map(r => (r.getLong(1), child)).toIndexedSeq: _*)
      .collect()
    assert(pass2.length == 2 && pass2.forall(_.getString(2) == "url"))
  }

  test("fail-loud posture: rootless bodies and loc-less entries refuse under strict") {
    def chain(e: Throwable): String = Iterator.iterate(e)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    // a non-empty body with no recognizable root is a scrambled fetch —
    // silently parsing it to zero entries would evaporate a site
    val noRoot = intercept[Exception] {
      parse((3L, "<html>this is not a sitemap</html>")).collect()
    }
    assert(chain(noRoot).contains("no urlset/sitemapindex root"), chain(noRoot))
    // loc is the one REQUIRED field (sitemaps.org) — a loc-less entry
    // refuses rather than vanishing
    val noLoc = intercept[Exception] {
      parse((4L, "<urlset><url><lastmod>2026</lastmod></url></urlset>"))
        .collect()
    }
    assert(chain(noLoc).contains("entry without <loc>"), chain(noLoc))
    // salvage mode: both drop silently instead
    val salvage = Corpus.sitemapParse(
      Seq((3L, "<html>junk</html>"),
        (4L, "<urlset><url><lastmod>2026</lastmod></url>" +
          "<url><loc>https://ex.com/ok</loc></url></urlset>"))
        .toDF("id", "xml"), "id", "xml", strict = false)
      .collect()
    assert(salvage.map(r => (r.getLong(0), r.getString(3))).toSet ==
      Set((4L, "https://ex.com/ok")))
    // null / blank bodies are "nothing fetched", not a parse failure —
    // zero rows in EITHER mode, no error
    assert(parse((5L, null), (6L, "  \n")).collect().isEmpty)
    // a BOM-prefixed body parses like its stripped twin (robots lesson)
    assert(parse((8L,
      "\uFEFF<urlset><url><loc>https://ex.com/x</loc></url></urlset>"))
      .collect().map(_.getString(3)).toSeq == Seq("https://ex.com/x"))
  }

  // --- revisitSchedule: the policy rung after the parse -----------------

  private def sched(rows: Seq[(String, String, String, java.lang.Long)],
                    k: Int = 3) =
    Corpus.revisitSchedule(
      rows.toDF("host", "url", "changefreq", "last_crawl"),
      "host", "url", "changefreq", "last_crawl",
      nowSec = 1000000L, perHostK = k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
      .sortBy(r => (r._1, r._3))

  test("revisitSchedule: tiers, the never rule, the daily default") {
    val L = (x: Long) => java.lang.Long.valueOf(x)
    val out = sched(Seq(
      // never fetched \u2192 tier 0, first regardless of others' overdue
      ("h1", "u/new", "hourly", null),
      // hourly, crawled 10ks ago \u2192 overdue 10000-3600 = 6400
      ("h1", "u/hr", "hourly", L(990000L)),
      // daily, crawled 90ks ago \u2192 overdue 90000-86400 = 3600
      ("h1", "u/day", "daily", L(910000L)),
      // daily, crawled 50ks ago \u2192 not due (50000 < 86400)
      ("h1", "u/fresh", "daily", L(950000L)),
      // never + crawled once \u2192 not due, ever
      ("h1", "u/never", "never", L(1L)),
      // unknown changefreq \u2192 daily default; 100ks ago \u2192 due
      ("h2", "u/odd", "sometimes", L(900000L)),
      // null changefreq \u2192 daily default; 10ks ago \u2192 not due
      ("h2", "u/nullcf", null, L(990000L))))
    assert(out == Seq(
      ("h1", "u/new", 1L, None),
      ("h1", "u/hr", 2L, Some(6400L)),
      ("h1", "u/day", 3L, Some(3600L)),
      ("h2", "u/odd", 1L, Some(13600L))), out.toString)
  }

  test("revisitSchedule: perHostK cuts the per-host tail, not other hosts") {
    val L = (x: Long) => java.lang.Long.valueOf(x)
    val rows = (1 to 5).map(i =>
      ("h1", s"u/$i", "always", L(1000000L - i * 10))) :+
      (("h2", "u/only", "always", L(999990L)))
    val out = sched(rows, k = 2)
    // always \u2192 interval 0, overdue = now - last: u/5 most overdue
    assert(out == Seq(
      ("h1", "u/5", 1L, Some(50L)), ("h1", "u/4", 2L, Some(40L)),
      ("h2", "u/only", 1L, Some(10L))), out.toString)
  }
}
