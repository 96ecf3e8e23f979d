package graft

import org.apache.spark.sql.functions._
import graft.operators.Warc

/** WARC record parsing: Content-Length byte accounting (delimiter
  * decoys in payloads), CRLF/LF tolerance, case-insensitive headers,
  * fail-loud malformed captures, HTTP body split. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(
      typ: String, uri: String, payload: String, extra: String = ""): String =
    s"WARC/1.0\r\nWARC-Type: $typ\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") + extra +
      s"Content-Length: ${payload.length}\r\n\r\n$payload\r\n\r\n"

  test("byte accounting: a payload containing WARC/1.0 and blank lines parses whole") {
    val decoy = "line one\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nline two"
    val content = rec("response", "http://a/", decoy) + rec("metadata", "", "tail")
    val got = Warc.parseString(7L, content)
    assert(got.map(r => (r.rec_idx, r.warc_type, r.target_uri, r.payload)) === Seq(
      (0, "response", "http://a/", decoy),
      (1, "metadata", "", "tail")))
    assert(got.head.content_length === decoy.length.toLong)
  }

  test("bare-LF line endings and case-insensitive headers parse") {
    val content = "warc/.." // not a record — build LF form explicitly
    val lf = s"WARC/1.0\ncontent-length: 4\nWARC-TARGET-URI: http://b/\nWarc-Type: response\n\nbody\n\n"
    val got = Warc.parseString(1L, lf)
    assert(got.map(r => (r.warc_type, r.target_uri, r.payload)) ===
      Seq(("response", "http://b/", "body")))
    assert(content.nonEmpty) // silence unused warning path
  }

  test("malformed captures fail loudly with doc id and position") {
    // missing Content-Length
    val e1 = intercept[IllegalArgumentException] {
      Warc.parseString(3L, "WARC/1.0\r\nWARC-Type: response\r\n\r\nbody")
    }
    assert(e1.getMessage.contains("Content-Length") && e1.getMessage.contains("doc 3"))
    // length past end of input (truncated capture)
    val e2 = intercept[IllegalArgumentException] {
      Warc.parseString(4L, "WARC/1.0\r\nContent-Length: 99\r\n\r\nshort")
    }
    assert(e2.getMessage.contains("runs past"))
    // garbage instead of a version line
    val e3 = intercept[IllegalArgumentException] {
      Warc.parseString(5L, "HTTP/1.1 200 OK\r\n\r\n")
    }
    assert(e3.getMessage.contains("WARC/"))
    // non-numeric length
    val e4 = intercept[IllegalArgumentException] {
      Warc.parseString(6L, "WARC/1.0\r\nContent-Length: ten\r\n\r\n")
    }
    assert(e4.getMessage.contains("bad Content-Length"))
  }

  test("httpBody: header split both line conventions; non-HTTP payloads pass whole") {
    val rows = Seq(
      (1L, "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>body</html>"),
      (2L, "HTTP/1.1 404 Not Found\nServer: x\n\nmissing"),
      (3L, "bare resource content with\r\n\r\nblank lines kept"),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "p")
      .select(col("id"), Warc.httpBody(col("p")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) === "<html>body</html>")
    assert(rows(2L) === "missing")
    assert(rows(3L) === "bare resource content with\r\n\r\nblank lines kept")
    assert(rows(4L) === "")
  }

  test("httpStatus/httpHeader: case-insensitive lookup bounded by the header block") {
    val rows = Seq(
      (1L, "HTTP/1.1 301 Moved\r\ncontent-type:  text/html ;x=1 \r\nServer: s\r\n\r\n" +
        "Content-Type: body-decoy"), // body text must NOT match
      (2L, "HTTP/1.0 200 OK\nCONTENT-TYPE: a/b\n\nok"),
      (3L, "not http at all\r\nContent-Type: nope\r\n\r\nx"))
      .toDF("id", "p")
      .select(col("id"), Warc.httpStatus(col("p")).as("s"),
        Warc.httpHeader(col("p"), "Content-Type").as("ct"))
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), r.getString(2)))).toMap
    assert(rows(1L) === ((Some(301), "text/html ;x=1")))
    assert(rows(2L) === ((Some(200), "a/b")))
    assert(rows(3L) === ((None, "")))
    val e = intercept[IllegalArgumentException] {
      Warc.httpHeader(col("p"), "bad name!")
    }
    assert(e.getMessage.contains("header name"))
  }

  test("dechunk: framing decodes, extensions/trailers drop, malformed raises") {
    assert(Warc.dechunk("5\r\nhello\r\n6;ext=z\r\n world\r\n0\r\nTrailer: t\r\n\r\n")
      === "hello world")
    assert(Warc.dechunk("a\nLF framing\n0\n") === "LF framing")
    assert(Warc.dechunk("0\r\n\r\n") === "")
    val e1 = intercept[IllegalArgumentException] { Warc.dechunk("zz\r\nx\r\n0\r\n\r\n") }
    assert(e1.getMessage.contains("bad chunk size"))
    val e2 = intercept[IllegalArgumentException] { Warc.dechunk("ff\r\nshort\r\n0\r\n\r\n") }
    assert(e2.getMessage.contains("runs past"))
    val e3 = intercept[IllegalArgumentException] { Warc.dechunk("5\r\nhelloXX") }
    assert(e3.getMessage.contains("missing line break"))
  }

  test("httpBodyDechunked: chunked responses decode, plain ones pass through") {
    val rows = Seq(
      (1L, "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
        "3\r\nabc\r\n3\r\ndef\r\n0\r\n\r\n"),
      (2L, "HTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\nplain"))
      .toDF("id", "p")
      .select(col("id"), Warc.httpBodyDechunked(col("p")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) === "abcdef")
    assert(rows(2L) === "plain")
  }

  test("distributed parse matches the core and stays scan-local") {
    val warcs = (1L to 10L).map { i =>
      (i, rec("response", s"http://h/$i", s"HTTP/1.1 200 OK\r\n\r\npage $i") +
        rec("request", s"http://h/$i", "GET / HTTP/1.1"))
    }.toDF("doc_id", "warc")
    val ds = Warc.parseRecords(warcs, "doc_id", "warc")
    assert(ds.count() === 20L)
    val got = ds.filter(col("warc_type") === "response")
      .select(col("doc_id"), Warc.httpBody(col("payload")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (1L to 10L).foreach(i => assert(got(i) === s"page $i"))
    val plan = ds.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"warc parse shuffled:\n$plan")
  }

  test("pipeline warc step: records explode, filter to response, chain into extract_html") {
    import java.nio.file.Files
    val (src, out) = (Files.createTempDirectory("graft-warc-src").toString,
      Files.createTempDirectory("graft-warc-out").toString)
    val pad = "with enough words to pass the content length rule here"
    val pages = (1L to 8L).map { i =>
      (i, rec("warcinfo", "", "software: graft") +
        rec("response", s"http://h/$i",
          "HTTP/1.1 200 OK\r\n\r\n" +
            s"<html><body><nav><a href='/'>Home</a></nav><p>Camera ready article $i $pad</p></body></html>"))
    }.toDF("doc_id", "text")
    pages.write.parquet(s"$src/captures.parquet")
    val yaml = Files.createTempFile("graft-pipe-warc", ".yaml")
    Files.writeString(yaml,
      """pipeline: crawl_front
        |id: doc_id
        |text: text
        |steps:
        |  - name: records
        |    op: warc
        |    input: captures
        |  - name: content
        |    op: extract_html
        |""".stripMargin)
    Cli.run(Seq("pipeline", yaml.toString, src, out), spark)
    val got = spark.read.parquet(s"$out/content")
    assert(got.count() === 8L) // warcinfo filtered, one response each
    val texts = got.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (1L to 8L).foreach(i => assert(texts(i) === s"Camera ready article $i $pad"))
    assert(got.columns.contains("target_uri"))
  }

  test("pipeline warc step: multi-record captures raise by default; rekey derives unique ids") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("graft-warc-multi").toString
    // every capture holds TWO response records — duplicate ids
    val twoPage = (1L to 4L).map { i =>
      (i, rec("response", s"http://h/$i/a", s"HTTP/1.1 200 OK\r\n\r\npage $i a") +
        rec("response", s"http://h/$i/b", s"HTTP/1.1 200 OK\r\n\r\npage $i b"))
    }.toDF("doc_id", "text")
    twoPage.write.parquet(s"$src/captures.parquet")
    def yamlFor(params: String) = {
      val y = Files.createTempFile("graft-warc-rekey", ".yaml")
      Files.writeString(y,
        s"""pipeline: multi
           |id: doc_id
           |text: text
           |steps:
           |  - name: records
           |    op: warc
           |    input: captures
           |$params
           |""".stripMargin)
      y
    }
    // default: fail loud instead of silently corrupting downstream
    val ex = intercept[Exception] {
      Cli.run(Seq("pipeline", yamlFor("").toString, src,
        Files.createTempDirectory("graft-warc-out2").toString), spark)
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(chain(ex).contains("more than one kept record"), chain(ex))
    // rekey: unique ids, capture_id kept, both pages present
    val out = Files.createTempDirectory("graft-warc-out3").toString
    Cli.run(Seq("pipeline",
      yamlFor("    params: { rekey: \"true\" }").toString, src, out), spark)
    val got = spark.read.parquet(s"$out/records")
    assert(got.count() === 8L)
    assert(got.select("doc_id").distinct().count() === 8L, "rekeyed ids must be unique")
    val back = got.select("capture_id", "rec_idx", "doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    back.foreach { case (cap, idx, id) => assert(id === cap * 65536L + idx) }
  }
}
