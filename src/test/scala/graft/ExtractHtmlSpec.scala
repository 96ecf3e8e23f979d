package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** HTML main-content extraction: container/comment removal, block
  * splitting, entity decode order, the integer link-density rule, and
  * malformed-markup degradation. */
class ExtractHtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String, minChars: Int = 25): String =
    Seq(Tuple1(html)).toDF("h")
      .select(TextAnalysis.extractHtml(col("h"), minChars).as("t"))
      .collect()(0).getString(0)

  private val pad = "with plenty of padding text to pass the length rule"

  test("scripts, styles, comments, and semantic boilerplate containers drop with content") {
    val html =
      s"""<html><head><title>t</title><script>var p = "</p> fake content $pad";</script>
         |<style>p { color: red } /* $pad */</style></head>
         |<body><!-- secret comment $pad -->
         |<nav>Primary navigation menu $pad</nav>
         |<header>Site header banner $pad</header>
         |<p>Real article body one $pad</p>
         |<aside>Related links sidebar $pad</aside>
         |<footer>Copyright footer $pad</footer>
         |</body></html>""".stripMargin
    assert(extract(html) === s"Real article body one $pad")
    // a decoy </p> inside the script string was removed WITH the
    // script (container removal precedes block splitting)
  }

  test("block tags split lines; inline tags strip in place; case-insensitive") {
    val html = s"<DIV>First block line here $pad</DIV>" +
      s"<P>Second with <B>bold</B> and <span class='x'>span</span> kept $pad</P>"
    assert(extract(html) ===
      s"First block line here $pad\nSecond with bold and span kept $pad")
  }

  test("entities decode after stripping, &amp; last; entity-encoded markup stays text") {
    val html = s"<p>A &lt;script&gt; tag &amp; the literal &amp;lt; stay text," +
      s" &quot;q&quot; &#39;a&#39;&nbsp;end $pad</p>"
    assert(extract(html) ===
      s"""A <script> tag & the literal &lt; stay text, "q" 'a' end $pad""")
  }

  test("link-density: an all-anchor line >= minChars drops; prose with one link survives") {
    val nav = "<p><a href='/a'>A long all anchor navigation line of links</a></p>"
    val prose = s"<p>Prose sentence citing <a href='/r'>a ref</a> inline $pad</p>"
    assert(extract(nav + prose) ===
      s"Prose sentence citing a ref inline $pad")
  }

  test("minChars rule: short lines drop at the default, survive when lowered") {
    val html = "<li>Nav</li><li>Links</li><p>short line</p>"
    assert(extract(html) === "")
    assert(extract(html, minChars = 3) === "Nav\nLinks\nshort line")
  }

  test("malformed markup degrades safely: unclosed tags, bare angle brackets, null") {
    // unclosed tag at end of input strips to end of line
    assert(extract(s"<p>Line before a dangling $pad <div class=") ===
      s"Line before a dangling $pad")
    // a bare < or > in prose is text, not a tag (tags open only at
    // `<` + letter, the HTML tokenizer rule)
    assert(extract(s"<p>Comparing 3 < 5 and 5 > 2 in prose $pad</p>") ===
      s"Comparing 3 < 5 and 5 > 2 in prose $pad")
    // never-closed container falls through to line rules
    assert(extract(s"<nav>Unclosed nav so line rules apply $pad") ===
      s"Unclosed nav so line rules apply $pad")
    // null input extracts to empty
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("h")
      .select(TextAnalysis.extractHtml(col("h")).as("t")).collect()(0).getString(0)
    assert(n === "")
  }

  test("htmlMetaContent: attribute orders, first-wins, entities, decoys, absent keys") {
    def meta(html: String, key: String): String =
      Seq(Tuple1(html)).toDF("h")
        .select(TextAnalysis.htmlMetaContent(col("h"), key).as("m"))
        .collect()(0).getString(0)
    val page =
      """<html><head>
        |<meta property="og:title" content="First &amp; real">
        |<meta content="second" property="og:title">
        |<meta content="content-first — desc" property="og:description">
        |<meta name="description" content="named form">
        |<META PROPERTY="article:published_time" CONTENT="2024-01-02T03:04:05Z">
        |</head><body>og:image <p>meta property="og:image" in text</p></body></html>""".stripMargin
    assert(meta(page, "og:title") === "First & real")        // first tag wins
    assert(meta(page, "og:description") === "content-first — desc") // order free
    assert(meta(page, "description") === "named form")       // name= spelling
    assert(meta(page, "article:published_time") === "2024-01-02T03:04:05Z") // case-insensitive
    assert(meta(page, "og:image") === "")                    // body text is no tag
    assert(meta(page, "og.title") === "")                    // '.' literal, not wildcard
    assert(meta(null.asInstanceOf[String] + "", "og:title") === "")
    intercept[IllegalArgumentException] {
      TextAnalysis.htmlMetaContent(col("h"), "bad key!")
    }
  }

  test("pipeline page_meta step: keys become columns; collision fails loud") {
    import java.nio.file.Files
    val (src, out) = (Files.createTempDirectory("graft-pm-src").toString,
      Files.createTempDirectory("graft-pm-out").toString)
    (1L to 3L).map { i =>
      (i, s"""<html><head><meta property="og:title" content="T$i">""" +
        s"""<meta property="article:published_time" content="2024-05-0${i}T00:00:00Z">""" +
        "</head><body>x</body></html>")
    }.toDF("doc_id", "text").write.parquet(s"$src/pages.parquet")
    val yaml = Files.createTempFile("graft-pipe-pm", ".yaml")
    Files.writeString(yaml,
      """pipeline: pm
        |id: doc_id
        |text: text
        |steps:
        |  - name: meta
        |    op: page_meta
        |    input: pages
        |    params: { keys: "og:title,article:published_time" }
        |""".stripMargin)
    Cli.run(Seq("pipeline", yaml.toString, src, out), spark)
    val got = spark.read.parquet(s"$out/meta")
      .select("doc_id", "og_title", "article_published_time").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(got.toSeq === (1L to 3L).map(i =>
      (i, s"T$i", s"2024-05-0${i}T00:00:00Z")).toSeq)
  }

  test("htmlTitle: first title, entities decoded, inner tags stripped; absent -> empty") {
    def title(html: String): String =
      Seq(Tuple1(html)).toDF("h")
        .select(TextAnalysis.htmlTitle(col("h")).as("t"))
        .collect()(0).getString(0)
    assert(title("<html><head><title> A &amp; B <b>bold</b>  site </title></head></html>")
      === "A & B bold site")
    assert(title("<HEAD><TITLE>caps</TITLE><title>second</title></HEAD>") === "caps")
    assert(title("<p>no head at all</p>") === "")
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("h")
      .select(TextAnalysis.htmlTitle(col("h")).as("t")).collect()(0).getString(0)
    assert(n === "")
  }

  test("whitespace collapses per line; blank interior lines vanish") {
    val html = s"<p>  spaced   out\t line $pad </p><p>   </p><p>Second line $pad</p>"
    assert(extract(html) === s"spaced out line $pad\nSecond line $pad")
  }

  test("htmlMetaRobots: first tag wins either attribute order; absent -> empty") {
    def mr(html: String): String =
      Seq(Tuple1(html)).toDF("h")
        .select(TextAnalysis.htmlMetaRobots(col("h")).as("m"))
        .collect()(0).getString(0)
    assert(mr("<meta name=\"robots\" content=\" NOINDEX , nofollow \">")
      === "noindex,nofollow")
    assert(mr("<META content='none' name='robots'>") === "none") // content first
    // first meta-robots tag wins over a later contradicting one
    assert(mr("<meta name='robots' content='all'>" +
      "<meta name='robots' content='noindex'>") === "all")
    // an unrelated meta never matches
    assert(mr("<meta name=\"viewport\" content=\"nofollow\">") === "")
    assert(mr("<p>no meta</p>") === "")
  }

  test("htmlCanonical: first canonical link either order, entities decoded") {
    def cn(html: String): String =
      Seq(Tuple1(html)).toDF("h")
        .select(TextAnalysis.htmlCanonical(col("h")).as("c"))
        .collect()(0).getString(0)
    assert(cn("<link rel=\"canonical\" href=\"/a?x=1&amp;y=2\">") === "/a?x=1&y=2")
    assert(cn("<LINK href='/first' rel='canonical'><link rel='canonical' href='/second'>")
      === "/first")
    assert(cn("<link rel=\"stylesheet\" href=\"/css\">") === "")
  }

  test("extractFollowLinks: rel token match, page-level nofollow, empty hrefs drop") {
    def fl(html: String): Seq[String] =
      Seq(Tuple1(html)).toDF("h")
        .select(TextAnalysis.extractFollowLinks(col("h")).as("l"))
        .collect()(0).getSeq[String](0)
    val page = "<a href=\"/keep\">a</a><a rel=\"nofollow\" href=\"/drop\">b</a>" +
      "<a rel=\"external nofollow noopener\" href=\"/drop2\">c</a>" +
      "<a rel=\"nofollower\" href=\"/keep2\">d</a>" + // token boundary: keeps
      "<a rel=nofollow href=\"/drop3\">g</a>" + // UNQUOTED rel also drops
      "<a href=\"\">e</a><a name=\"anchor-only\">f</a>"
    assert(fl(page) === Seq("/keep", "/keep2"))
    // page-level nofollow kills every outlink
    assert(fl("<meta name='robots' content='noindex,nofollow'>" + page) === Seq.empty)
    assert(fl("<meta name='robots' content='noindex'>" + page) === Seq("/keep", "/keep2"))
  }
}
