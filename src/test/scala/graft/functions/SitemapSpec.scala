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
}
