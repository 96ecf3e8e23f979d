package graft

import graft.operators.Sitemaps

/** Sitemap XML parsing: entry splitting (urlset wrapper excluded),
  * optional-field defaults, entity decoding, whitespace trimming,
  * index files, malformed/empty input. */
class SitemapsSpec extends SparkSpec {
  import spark.implicits._

  private def urls(xml: String) =
    Sitemaps.urlEntries(Seq((1L, xml)).toDF("id", "xml"), "id", "xml")
      .collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(3), r.getString(4), r.getString(5)))
      .toSeq

  test("urlset wrapper is not an entry; entries keep file order") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>http://h/1</loc></url>
        |<url><loc>http://h/2</loc><priority>0.5</priority></url>
        |</urlset>""".stripMargin
    assert(urls(xml) === Seq(
      (0, "http://h/1", "", "", ""),
      (1, "http://h/2", "", "", "0.5")))
  }

  test("entities decode (amp last), loc whitespace trims, missing loc is empty") {
    val xml =
      "<url>\n  <loc>\n    http://h/a?x=1&amp;y=2&amp;lt;\n  </loc>\n" +
        "<lastmod> 2024-02-03 </lastmod></url>" +
        "<url><lastmod>2024</lastmod></url>" // no <loc>
    assert(urls(xml) === Seq(
      // &amp;lt; decodes ONE level to the literal &lt; (not '<')
      (0, "http://h/a?x=1&y=2&lt;", "2024-02-03", "", ""),
      (1, "", "2024", "", "")))
  }

  test("index files: <sitemap> children parse with the same shape") {
    val xml =
      """<sitemapindex>
        |<sitemap><loc>http://h/sitemap1.xml</loc><lastmod>2024-01-01</lastmod></sitemap>
        |<sitemap><loc>http://h/sitemap2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val got = Sitemaps.indexEntries(Seq((9L, xml)).toDF("id", "xml"), "id", "xml")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (9L, 0, "http://h/sitemap1.xml", "2024-01-01"),
      (9L, 1, "http://h/sitemap2.xml", "")))
    // url entries of an index file: none (tags don't cross-match)
    assert(urls(xml) === Seq.empty)
  }

  test("null / empty / tagless bodies produce no rows") {
    assert(urls("") === Seq.empty)
    assert(urls("plain text, no xml") === Seq.empty)
    val got = Sitemaps.urlEntries(
      Seq((1L, null: String)).toDF("id", "xml"), "id", "xml").collect()
    assert(got.isEmpty)
  }

  test("feeds: RSS items and Atom entries parse to the unified shape") {
    import graft.operators.Feeds
    val rss =
      """<rss><channel><title>chan</title>
        |<item><title>T &amp; t</title><link> http://h/1 </link>
        |<guid isPermaLink="false">g1</guid><pubDate>D1</pubDate></item>
        |<item><link>http://h/2</link></item>
        |</channel></rss>""".stripMargin
    val gotR = Feeds.rssItems(Seq((1L, rss)).toDF("id", "xml"), "id", "xml")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5)))
    assert(gotR.toSeq === Seq(
      (0, "http://h/1", "T & t", "g1", "D1"),
      (1, "http://h/2", "", "", "")))
    val atom =
      """<feed><title>ft</title>
        |<entry><title>A</title><link rel="self" href="http://h/feed.xml"/>
        |<link rel="alternate" href="http://h/a1"/>
        |<id>i1</id><updated>U1</updated></entry>
        |<entry><link href='http://h/a2'/></entry>
        |</feed>""".stripMargin
    val gotA = Feeds.atomEntries(Seq((1L, atom)).toDF("id", "xml"), "id", "xml")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5)))
    assert(gotA.toSeq === Seq(
      (0, "http://h/a1", "A", "i1", "U1"),
      (1, "http://h/a2", "", "", "")))
    // empty / null / feed-level-only bodies produce no rows
    assert(Feeds.rssItems(Seq((1L, "<rss><channel><title>only</title></channel></rss>"))
      .toDF("id", "xml"), "id", "xml").count() === 0L)
    assert(Feeds.atomEntries(Seq((1L, null: String)).toDF("id", "xml"), "id", "xml")
      .count() === 0L)
  }

  test("the parse plan is exchange-free (scan-local fan-out)") {
    val df = Sitemaps.urlEntries(
      Seq((1L, "<url><loc>http://h/</loc></url>")).toDF("id", "xml"), "id", "xml")
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "sitemap parsing must be partition-local")
  }
}
