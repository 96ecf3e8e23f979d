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

  // ------------------------------------------------------- byte path

  private def recBytes(
      typ: String, uri: String, payload: Array[Byte], extra: String = ""): Array[Byte] = {
    val header =
      s"WARC/1.0\r\nWARC-Type: $typ\r\n" +
        (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") + extra +
        s"Content-Length: ${payload.length}\r\n\r\n"
    header.getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  test("parseBytes: multi-byte UTF-8 slices by octets where the string path mis-slices") {
    // 'café — ✓' is 8 UTF-16 units but 13 UTF-8 bytes: the byte path
    // must slice 13; feeding the same capture DECODED to the string
    // path makes Content-Length over-reach into the terminator and die
    val body = "café — ✓"
    val bytes = body.getBytes("UTF-8")
    assert(bytes.length > body.length, "fixture must actually be multi-byte")
    val capture = recBytes("response", "http://h/é", bytes) ++
      recBytes("metadata", "", "tail".getBytes("UTF-8"))
    val got = Warc.parseBytes(9L, capture)
    assert(got.map(r => (r.rec_idx, r.warc_type, r.target_uri,
      new String(r.payload, "UTF-8"))) === Seq(
      (0, "response", "http://h/é", body),
      (1, "metadata", "", "tail")))
    assert(got.head.content_length === bytes.length.toLong)
    // the string path on the decoded capture: 13 counted as UTF-16
    // units over-reads past the body into the record terminator and
    // the next version-line check fails loud — exactly the documented
    // string-column caveat
    val e = intercept[IllegalArgumentException] {
      Warc.parseString(9L, new String(capture, "UTF-8"))
    }
    assert(e.getMessage.contains("WARC/"))
  }

  test("parseBytes: raw binary payloads (NULs, invalid UTF-8) slice exactly") {
    val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0x00, 0x00, 0xFF.toByte, 0x00)
    val capture = recBytes("resource", "http://h/img.png", png)
    val got = Warc.parseBytes(2L, capture)
    assert(got.size === 1)
    assert(got.head.payload.toSeq === png.toSeq)
    assert(got.head.content_length === png.length.toLong)
    // truncation still fail-loud in octets
    val e = intercept[IllegalArgumentException] {
      Warc.parseBytes(3L, capture.dropRight(6))
    }
    assert(e.getMessage.contains("runs past"))
  }

  test("gzip members: per-record members decode and parse; garbage fails loud") {
    val r1 = recBytes("response", "http://h/1", "HTTP/1.1 200 OK\r\n\r\nnaïve body".getBytes("UTF-8"))
    val r2 = recBytes("metadata", "", "m".getBytes("UTF-8"))
    val members = Warc.gzipMember(r1) ++ Warc.gzipMember(r2)
    // member round-trip at the byte level
    assert(Warc.gunzipMembers(members).toSeq === (r1 ++ r2).toSeq)
    val df = Seq((1L, members)).toDF("doc_id", "warc")
    val got = Warc.parseRecordsBytes(df, "doc_id", "warc", gzipped = true).collect()
    assert(got.map(_.warc_type).toSeq === Seq("response", "metadata"))
    assert(new String(got(0).payload, "UTF-8").endsWith("naïve body"))
    // corruption INSIDE a member (deflate stream / CRC) raises with
    // the doc id
    val corrupt = members.clone()
    corrupt(members.length / 2) = (corrupt(members.length / 2) ^ 0x5A).toByte
    val bad = Seq((7L, corrupt)).toDF("doc_id", "warc")
    val e = intercept[Exception] {
      Warc.parseRecordsBytes(bad, "doc_id", "warc", gzipped = true).collect()
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(chain(e).contains("gzip decode failed") || chain(e).contains("WARC parse"),
      chain(e))
  }

  test("gunzipMembers: trailing garbage, corrupted boundary, bad trailer, and bombs all fail loud") {
    val r1 = recBytes("response", "http://h/1", "HTTP/1.1 200 OK\r\n\r\nbody one".getBytes("UTF-8"))
    val r2 = recBytes("metadata", "", "m2".getBytes("UTF-8"))
    val m1 = Warc.gzipMember(r1)
    val members = m1 ++ Warc.gzipMember(r2)
    // trailing garbage after the last trailer: GZIPInputStream would
    // silently stop; the manual framer raises
    val eGarbage = intercept[java.io.IOException] {
      Warc.gunzipMembers(members ++ "definitely not gzip bytes".getBytes("UTF-8"))
    }
    assert(eGarbage.getMessage.contains("bad gzip magic"), eGarbage.getMessage)
    // short trailing garbage (under a header's width) also raises
    val eShort = intercept[java.io.IOException] {
      Warc.gunzipMembers(members ++ "junk".getBytes("UTF-8"))
    }
    assert(eShort.getMessage.contains("truncated gzip header"), eShort.getMessage)
    // a corrupted member BOUNDARY (second member's magic damaged)
    // would silently drop every subsequent record under
    // GZIPInputStream's probe-and-swallow; here it raises
    val boundary = members.clone()
    boundary(m1.length) = 0x00
    val eBoundary = intercept[java.io.IOException](Warc.gunzipMembers(boundary))
    assert(eBoundary.getMessage.contains("bad gzip magic"), eBoundary.getMessage)
    // a flipped CRC byte in the trailer raises (payload bytes intact)
    val badCrc = members.clone()
    badCrc(m1.length - 8) = (badCrc(m1.length - 8) ^ 0x7F).toByte
    val eCrc = intercept[java.io.IOException](Warc.gunzipMembers(badCrc))
    assert(eCrc.getMessage.contains("CRC32 mismatch"), eCrc.getMessage)
    // a flipped ISIZE byte raises
    val badIsize = members.clone()
    badIsize(m1.length - 1) = (badIsize(m1.length - 1) ^ 0x7F).toByte
    val eIsize = intercept[java.io.IOException](Warc.gunzipMembers(badIsize))
    assert(eIsize.getMessage.contains("ISIZE mismatch"), eIsize.getMessage)
    // a truncated member raises rather than returning a partial decode
    val eTrunc = intercept[java.io.IOException] {
      Warc.gunzipMembers(members.dropRight(12))
    }
    assert(eTrunc.getMessage.nonEmpty)
    // bomb guard: a highly-compressible member stops at the bound
    // instead of materializing the full expansion
    val bomb = Warc.gzipMember(Array.fill[Byte](1 << 20)('a'))
    val eBomb = intercept[java.io.IOException] {
      Warc.gunzipMembers(bomb, maxOut = 1 << 16)
    }
    assert(eBomb.getMessage.contains("gzip bomb"), eBomb.getMessage)
    // FNAME/FCOMMENT/FEXTRA header fields parse (constructed member
    // with all optional fields present around the same deflate body)
    val payload = "optional header fields".getBytes("UTF-8")
    val plain = Warc.gzipMember(payload)
    val deflateAndTrailer = java.util.Arrays.copyOfRange(plain, 10, plain.length)
    val extra = Array[Byte](3, 0, 'x', 'y', 'z')
    val full = Array[Byte](0x1f, 0x8b.toByte, 8, (4 | 8 | 16).toByte,
      0, 0, 0, 0, 0, 0) ++
      Array[Byte](extra.length.toByte, 0) ++ extra ++
      ("name.txt".getBytes("UTF-8") :+ 0.toByte) ++
      ("a comment".getBytes("UTF-8") :+ 0.toByte) ++
      deflateAndTrailer
    assert(Warc.gunzipMembers(full).toSeq === payload.toSeq)
  }

  test("parseRecordsBytes stays scan-local and null bytes parse to no records") {
    val warcs = (1L to 6L).map { i =>
      (i, recBytes("response", s"http://h/$i",
        s"HTTP/1.1 200 OK\r\n\r\npage $i".getBytes("UTF-8")))
    }.toDF("doc_id", "warc")
      .unionByName(Seq((99L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "warc"))
    val ds = Warc.parseRecordsBytes(warcs, "doc_id", "warc")
    assert(ds.count() === 6L)
    val plan = ds.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"binary warc parse shuffled:\n$plan")
  }

  test("decodeHttpPayload: declared charsets, replace-not-throw, byte-level chunk reassembly") {
    def http(headers: String, body: Array[Byte]): Array[Byte] =
      s"HTTP/1.1 200 OK\r\n$headers\r\n\r\n".getBytes("UTF-8") ++ body
    // latin-1 page: a blind UTF-8 decode would mojibake 0xE9/0xBD
    val latin = http("Content-Type: text/html; charset=ISO-8859-1",
      Array(0x63, 0x61, 0x66, 0xE9, 0x20, 0xBD).map(_.toByte))
    assert(Warc.decodeHttpPayload(latin) === "café ½")
    // quoted charset and case-insensitivity
    assert(Warc.decodeHttpPayload(http(
      "content-type: text/html; CHARSET=\"iso-8859-1\"",
      Array(0xE9.toByte))) === "é")
    // unknown charset falls back to UTF-8; malformed bytes REPLACE
    assert(Warc.decodeHttpPayload(http("Content-Type: a/b; charset=klingon-42",
      "ok".getBytes("UTF-8"))) === "ok")
    assert(Warc.decodeHttpPayload(http("Content-Type: text/plain",
      Array(0xFF.toByte, 'x'.toByte))) === "�x")
    // chunked with a chunk boundary INSIDE a multi-byte char: byte
    // reassembly must precede decoding
    val word = "a—b".getBytes("UTF-8") // 5 bytes, dash = 3
    val chunked = http(
      "Content-Type: text/html; charset=utf-8\r\nTransfer-Encoding: chunked",
      "2\r\n".getBytes("UTF-8") ++ word.take(2) ++ "\r\n".getBytes("UTF-8") ++
        "3\r\n".getBytes("UTF-8") ++ word.drop(2) ++ "\r\n0\r\n\r\n".getBytes("UTF-8"))
    assert(Warc.decodeHttpPayload(chunked) === "a—b")
    // NO header charset: the <meta charset> prescan of the first 1024
    // bytes governs (WHATWG convention); the HTTP header WINS when
    // both declare; a meta tag past the prescan window is ignored
    val metaBody = "<meta charset=iso-8859-1><p>caf".getBytes("UTF-8") ++
      Array(0xE9.toByte) ++ "</p>".getBytes("UTF-8")
    assert(Warc.decodeHttpPayload(http("Content-Type: text/html", metaBody))
      === "<meta charset=iso-8859-1><p>café</p>")
    assert(Warc.decodeHttpPayload(http(
      "Content-Type: text/html; charset=utf-8",
      "<meta charset=iso-8859-1>ok".getBytes("UTF-8")))
      === "<meta charset=iso-8859-1>ok") // header precedence
    // an UNSUPPORTED header charset must not shadow a valid <meta>
    // declaration: the page still decodes as latin-1, not UTF-8 fallback
    assert(Warc.decodeHttpPayload(http(
      "Content-Type: text/html; charset=klingon-42",
      "<meta charset=iso-8859-1>caf".getBytes("UTF-8") ++ Array(0xE9.toByte)))
      === "<meta charset=iso-8859-1>café")
    // an ILLEGAL charset name (isSupported would throw) is treated as
    // unsupported, not an error
    assert(Warc.decodeHttpPayload(http(
      "Content-Type: text/html; charset=-bad",
      "ok".getBytes("UTF-8"))) === "ok")
    val farMeta = (" " * 1100).getBytes("UTF-8") ++
      "<meta charset=iso-8859-1>".getBytes("UTF-8") ++ Array(0xE9.toByte)
    assert(Warc.decodeHttpPayload(http("Content-Type: text/html", farMeta))
      .endsWith("�")) // outside the window: UTF-8 + replacement
    // non-HTTP payload: whole bytes as UTF-8; headers-only: UTF-8 whole
    assert(Warc.decodeHttpPayload("naïve resource".getBytes("UTF-8")) === "naïve resource")
    assert(Warc.decodeHttpPayload("HTTP/1.1 204 No Content".getBytes("UTF-8"))
      === "HTTP/1.1 204 No Content")
    // malformed chunk framing still fail-loud at the byte level
    val bad = http("Transfer-Encoding: chunked", "zz\r\nx".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] { Warc.decodeHttpPayload(bad) }
    assert(e.getMessage.contains("bad chunk size"))
  }

  test("pipeline warc step: binary captures decode bodies by their declared charset") {
    import java.nio.file.Files
    val (src, out) = (Files.createTempDirectory("graft-warccs-src").toString,
      Files.createTempDirectory("graft-warccs-out").toString)
    val latinBody = Array(0x63, 0x61, 0x66, 0xE9).map(_.toByte) // "café" latin-1
    val pages = (1L to 3L).map { i =>
      val payload =
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=iso-8859-1\r\n\r\n"
          .getBytes("UTF-8") ++ latinBody
      (i, recBytes("response", s"http://h/$i", payload))
    }.toDF("doc_id", "text")
    pages.write.parquet(s"$src/captures.parquet")
    val yaml = Files.createTempFile("graft-pipe-warccs", ".yaml")
    Files.writeString(yaml,
      """pipeline: charset_front
        |id: doc_id
        |text: text
        |steps:
        |  - name: records
        |    op: warc
        |    input: captures
        |""".stripMargin)
    Cli.run(Seq("pipeline", yaml.toString, src, out), spark)
    val got = spark.read.parquet(s"$out/records").select("text").collect()
    assert(got.map(_.getString(0)).toSeq === Seq.fill(3)("café"))
  }

  test("pipeline warc step: binary gzip captures parse through the byte path") {
    import java.nio.file.Files
    val (src, out) = (Files.createTempDirectory("graft-warcb-src").toString,
      Files.createTempDirectory("graft-warcb-out").toString)
    val pages = (1L to 5L).map { i =>
      val r1 = recBytes("warcinfo", "", "software: graft".getBytes("UTF-8"))
      val r2 = recBytes("response", s"http://h/$i",
        s"HTTP/1.1 200 OK\r\n\r\narticle naïve — $i".getBytes("UTF-8"))
      (i, Warc.gzipMember(r1) ++ Warc.gzipMember(r2))
    }.toDF("doc_id", "text")
    pages.write.parquet(s"$src/captures.parquet")
    val yaml = Files.createTempFile("graft-pipe-warcb", ".yaml")
    Files.writeString(yaml,
      """pipeline: crawl_front_bin
        |id: doc_id
        |text: text
        |steps:
        |  - name: records
        |    op: warc
        |    input: captures
        |    params: { gzip: "true" }
        |""".stripMargin)
    Cli.run(Seq("pipeline", yaml.toString, src, out), spark)
    val got = spark.read.parquet(s"$out/records")
    assert(got.count() === 5L)
    val texts = got.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (1L to 5L).foreach(i => assert(texts(i) === s"article naïve — $i"))
    // gzip over a STRING column is a spec error, not a runtime surprise
    val yaml2 = Files.createTempFile("graft-pipe-warcb2", ".yaml")
    Files.writeString(yaml2,
      """pipeline: bad_gzip
        |id: doc_id
        |text: text
        |steps:
        |  - name: records
        |    op: warc
        |    input: captures
        |    params: { gzip: "true" }
        |""".stripMargin)
    val src2 = Files.createTempDirectory("graft-warcb-src2").toString
    (1L to 2L).map(i => (i, "WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n"))
      .toDF("doc_id", "text").write.parquet(s"$src2/captures.parquet")
    val e = intercept[Exception] {
      Cli.run(Seq("pipeline", yaml2.toString, src2,
        Files.createTempDirectory("graft-warcb-out2").toString), spark)
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(chain(e).contains("requires a BINARY"), chain(e))
  }

  test("httpBodyBytes: raw body octets survive untouched — headers off, chunked reassembled, never decoded") {
    val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x00, 0xFF.toByte, 0xFE.toByte, 0x00)
    val resp = "HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n".getBytes("UTF-8") ++ png
    assert(Warc.httpBodyBytes(resp).toSeq === png.toSeq)
    // chunked binary body: byte-level reassembly, no charset involved
    val chunked = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "4\r\n").getBytes("UTF-8") ++ png.take(4) ++ "\r\n4\r\n".getBytes("UTF-8") ++
      png.drop(4) ++ "\r\n0\r\n\r\n".getBytes("UTF-8")
    assert(Warc.httpBodyBytes(chunked).toSeq === png.toSeq)
    // non-HTTP payload passes whole
    assert(Warc.httpBodyBytes(png).toSeq === png.toSeq)
  }

  test("pipeline warc step binaryPayload: media records carry exact body octets beside the text") {
    import java.nio.file.Files
    val (src, out) = (Files.createTempDirectory("graft-warcm-src").toString,
      Files.createTempDirectory("graft-warcm-out").toString)
    val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0x00, 0xFF.toByte, 0x00, 0xFE.toByte)
    val pages = (1L to 4L).map { i =>
      val resp = recBytes("response", s"http://h/$i",
        "HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n".getBytes("UTF-8") ++ png)
      val res = recBytes("resource", s"http://h/$i/raw.png", png)
      (i, resp ++ res)
    }.toDF("doc_id", "text")
    pages.write.parquet(s"$src/captures.parquet")
    val yaml = Files.createTempFile("graft-pipe-warcm", ".yaml")
    Files.writeString(yaml,
      """pipeline: media_front
        |id: doc_id
        |text: text
        |steps:
        |  - name: records
        |    op: warc
        |    input: captures
        |    params: { types: "response,resource", binaryPayload: "true", rekey: "true" }
        |""".stripMargin)
    Cli.run(Seq("pipeline", yaml.toString, src, out), spark)
    val got = spark.read.parquet(s"$out/records")
    assert(got.count() === 8)
    // every record's payload column holds the EXACT image octets —
    // response records with headers split off, resource records whole
    got.select("warc_type", "payload").collect().foreach { r =>
      assert(r.getAs[Array[Byte]](1).toSeq === png.toSeq,
        s"${r.getString(0)} payload octets")
    }
  }

  test("pipeline: capture -> binaryPayload -> media_stats decodes in-capture images end to end") {
    import java.nio.file.Files
    import graft.operators.Multimodal
    val (src, out) = (Files.createTempDirectory("graft-warcms-src").toString,
      Files.createTempDirectory("graft-warcms-out").toString)
    // REAL decodable PNGs wrapped as HTTP responses inside WARC captures
    val imgs = Multimodal.syntheticImages(
      Seq(1L, 2L, 3L).toDF("doc_id"), "doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    val pages = imgs.toSeq.map { case (i, png) =>
      (i, recBytes("response", s"http://h/$i.png",
        "HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n".getBytes("UTF-8") ++ png))
    }.toDF("doc_id", "text")
    pages.write.parquet(s"$src/captures.parquet")
    val yaml = Files.createTempFile("graft-pipe-warcms", ".yaml")
    Files.writeString(yaml,
      """pipeline: capture_media
        |id: doc_id
        |text: text
        |steps:
        |  - name: records
        |    op: warc
        |    input: captures
        |    params: { binaryPayload: "true" }
        |  - name: meta
        |    op: media_stats
        |""".stripMargin)
    Cli.run(Seq("pipeline", yaml.toString, src, out), spark)
    val got = spark.read.parquet(s"$out/meta")
      .select("doc_id", "mime", "width", "height", "pixel_md5").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    // cross-check against decoding the ORIGINAL bytes directly: the
    // capture -> record -> body-octets path lost nothing
    val want = Multimodal.decodeImage(
        imgs.toSeq.toDF("doc_id", "payload")).toDF()
      .select("doc_id", "width", "height", "pixel_md5").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (id, (mime, w, h, md5)) =>
      assert(mime === "image/png")
      assert((w, h, md5) === want(id), s"doc $id decode metadata")
    }
  }

  test("pipeline revisit archive: an unchanged re-fetch archives as a revisit record — its bytes stored once across nights") {
    import java.nio.file.{Files, Paths}
    def tmp(p: String) = Files.createTempDirectory(p).toString
    val (src, state) = (tmp("graft-rv-src"), tmp("graft-rv-state"))
    val (out1, out2) = (tmp("graft-rv-out1"), tmp("graft-rv-out2"))
    val T1 = 1700000000L
    def yamlFor(now: Long, date: String, refers: String): String = {
      val y = Files.createTempFile("graft-pipe-revisit", ".yaml")
      Files.writeString(y,
        s"""pipeline: nightly_archive
           |id: doc_id
           |text: text
           |steps:
           |  - name: annotated
           |    op: change_detect
           |    input: pages
           |    params: { mode: admit, url: url, now: "$now", buckets: "4", keep: all }
           |  - name: spread
           |    op: shuffle_shards
           |    params: { shards: "1", salt: rv1 }
           |  - name: archived
           |    op: export_warc
           |    params: { uri: url, recordType: response, date: "$date",
           |              revisitWhen: content_changed""".stripMargin +
          (if (refers.nonEmpty) s""", refersToDate: "$refers" }""" else " }") + "\n")
      y.toString
    }
    def writePages(rows: Seq[(Long, String, String)]): Unit = {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$src/pages.parquet"))
      rows.toDF("doc_id", "url", "text").write.parquet(s"$src/pages.parquet")
    }
    def archiveBytes(out: String): Array[Byte] = Files.readAllBytes(
      Paths.get(out, "exports", "archived", "shard=0", "capture.warc.gz"))
    val bText = "beta page two stays byte-identical"
    // night 1: both pages new -> two full response records
    writePages(Seq((1L, "http://h/a", "alpha page one"), (2L, "http://h/b", bText)))
    Cli.run(Seq("pipeline", yamlFor(T1, "2024-03-01T00:00:00Z", ""),
      src, out1, "--state", state), spark)
    val n1 = Warc.parseBytes(0L, Warc.gunzipMembers(archiveBytes(out1)))
    assert(n1.map(_.warc_type).sorted === Seq("response", "response"))
    // night 2: /a revised, /b identical -> response + revisit
    writePages(Seq((1L, "http://h/a", "alpha page REVISED"), (2L, "http://h/b", bText)))
    Cli.run(Seq("pipeline",
      yamlFor(T1 + 86400L, "2024-03-02T00:00:00Z", "2024-03-01T00:00:00Z"),
      src, out2, "--state", state), spark)
    val bytes2 = archiveBytes(out2)
    val n2 = Warc.parseBytes(0L, Warc.gunzipMembers(bytes2))
      .map(r => r.target_uri -> r).toMap
    assert(n2("http://h/a").warc_type === "response")
    assert(new String(n2("http://h/a").payload, "UTF-8") === "alpha page REVISED")
    assert(n2("http://h/b").warc_type === "revisit")
    assert(n2("http://h/b").content_length === 0L)
    // the revisit metadata resolves the dedup: profile, digest of the
    // UNCHANGED payload, and the prior capture's date
    val rv = Warc.parseRevisits(
        Seq((7L, bytes2)).toDF("doc_id", "warc"), "doc_id", "warc", gzipped = true)
      .collect()
    assert(rv.length === 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val bDigest = md.digest(bText.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    assert(rv.head.target_uri === "http://h/b")
    assert(rv.head.profile === Warc.RevisitProfileIdenticalDigest)
    assert(rv.head.payload_digest === s"md5:$bDigest")
    assert(rv.head.refers_to_date === "2024-03-01T00:00:00Z")
    // storage dedup: the unchanged payload's bytes live in night 1's
    // archive only — night 2 never re-stores them
    def containsBytes(hay: Array[Byte], needle: Array[Byte]): Boolean =
      (0 to hay.length - needle.length).exists(i =>
        needle.indices.forall(j => hay(i + j) == needle(j)))
    val needle = bText.getBytes("UTF-8")
    assert(containsBytes(Warc.gunzipMembers(archiveBytes(out1)), needle))
    assert(!containsBytes(Warc.gunzipMembers(bytes2), needle))
  }

  test("pipeline export_warc: archives write sharded .warc.gz and ingest back through the warc step") {
    import java.nio.file.{Files, Paths}
    val (src, out, out2) = (Files.createTempDirectory("graft-warcw-src").toString,
      Files.createTempDirectory("graft-warcw-out").toString,
      Files.createTempDirectory("graft-warcw-out2").toString)
    val pages = (1L to 9L).map { i =>
      (i, s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" +
        s"fetched naïve — page $i", s"http://h/$i")
    }.toDF("doc_id", "text", "url")
    pages.write.parquet(s"$src/fetched.parquet")
    val yaml = Files.createTempFile("graft-pipe-warcw", ".yaml")
    Files.writeString(yaml,
      """pipeline: archive
        |id: doc_id
        |text: text
        |steps:
        |  - name: spread
        |    op: shuffle_shards
        |    input: fetched
        |    params: { shards: "3", salt: wa1 }
        |  - name: archived
        |    op: export_warc
        |    params: { uri: url, recordType: response, date: "2024-02-03T04:05:06Z" }
        |""".stripMargin)
    Cli.run(Seq("pipeline", yaml.toString, src, out), spark)
    // manifest covers every row; shard files parse back to the exact
    // payload bytes in pos order, with the declared type/uri/date
    val manifest = spark.read.parquet(s"$out/archived")
      .select("doc_id", "shard", "pos", "n_bytes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(manifest.length === 9)
    val byDoc = (1L to 9L).map(i =>
      i -> ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" +
        s"fetched naïve — page $i")).toMap
    manifest.map(_._2).distinct.foreach { sh =>
      val bytes = Files.readAllBytes(
        Paths.get(out, "exports", "archived", s"shard=$sh", "capture.warc.gz"))
      val recs = Warc.parseBytes(sh.toLong, Warc.gunzipMembers(bytes))
      val wantDocs = manifest.filter(_._2 == sh).sortBy(_._3).map(_._1)
      assert(recs.map(r => new String(r.payload, "UTF-8")).toSeq ===
        wantDocs.map(byDoc).toSeq, s"shard $sh payloads in pos order")
      assert(recs.forall(_.warc_type == "response"))
      assert(recs.map(_.target_uri).toSet ===
        wantDocs.map(i => s"http://h/$i").toSet)
    }
    // loop closure: the produced archives ingest through the warc
    // step's binary gzip path and recover the page text
    val readBack = manifest.map(_._2).distinct.sorted.toSeq.map { sh =>
      (sh.toLong, Files.readAllBytes(
        Paths.get(out, "exports", "archived", s"shard=$sh", "capture.warc.gz")))
    }.toDF("doc_id", "text")
    val src2 = Files.createTempDirectory("graft-warcw-src2").toString
    readBack.write.parquet(s"$src2/captures.parquet")
    val yaml2 = Files.createTempFile("graft-pipe-warcw2", ".yaml")
    Files.writeString(yaml2,
      """pipeline: rearchive
        |id: doc_id
        |text: text
        |steps:
        |  - name: records
        |    op: warc
        |    input: captures
        |    params: { gzip: "true", rekey: "true" }
        |""".stripMargin)
    Cli.run(Seq("pipeline", yaml2.toString, src2, out2), spark)
    val texts = spark.read.parquet(s"$out2/records")
      .select("text").collect().map(_.getString(0)).toSet
    assert(texts === (1L to 9L).map(i => s"fetched naïve — page $i").toSet)
    // deterministic re-export: rerun is byte-identical per shard
    val outB = Files.createTempDirectory("graft-warcw-outB").toString
    Cli.run(Seq("pipeline", yaml.toString, src, outB), spark)
    manifest.map(_._2).distinct.foreach { sh =>
      val a = Files.readAllBytes(
        Paths.get(out, "exports", "archived", s"shard=$sh", "capture.warc.gz"))
      val b = Files.readAllBytes(
        Paths.get(outB, "exports", "archived", s"shard=$sh", "capture.warc.gz"))
      assert(java.util.Arrays.equals(a, b), s"shard $sh not byte-deterministic")
    }
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

  test("writeShards: a revisit row with a NULL/empty digest fails in-plan naming the target URI, before any shard file stages") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-baddigest").toString
    val rows = Seq(
      (0, 0L, "response", "http://h/ok", "body".getBytes("UTF-8"), false, "aa" * 16),
      (0, 1L, "response", "http://h/bad", Array.emptyByteArray, true, null.asInstanceOf[String]))
      .toDF("shard", "pos", "warc_type", "target_uri", "payload", "revisit", "payload_digest")
    val e = intercept[Exception] {
      graft.sources.WarcSink.writeShards(rows, "payload", dir, 1, "2024-03-01T00:00:00Z")
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("http://h/bad") && chain.contains("payload_digest"),
      s"expected the offending URI in: $chain")
    // the check runs in the map stage feeding the shard exchange —
    // nothing may have been staged or committed
    val staged = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
    assert(staged.isEmpty, s"shard files written despite the in-plan failure: ${staged.mkString(", ")}")
  }

  test("pipeline revisit archive: refersToDateFrom points every revisit at the PAYLOAD-BEARING capture across many nights") {
    import java.nio.file.{Files, Paths}
    def tmp(p: String) = Files.createTempDirectory(p).toString
    val (src, state) = (tmp("graft-rv3-src"), tmp("graft-rv3-state"))
    val D1 = 1709251200L // 2024-03-01T00:00:00Z
    def dateOf(ts: Long): String =
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
        .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.ofEpochSecond(ts))
    def yamlFor(now: Long): String = {
      val y = Files.createTempFile("graft-pipe-rv3", ".yaml")
      Files.writeString(y,
        s"""pipeline: nightly_archive3
           |id: doc_id
           |text: text
           |steps:
           |  - name: annotated
           |    op: change_detect
           |    input: pages
           |    params: { mode: admit, url: url, now: "$now", buckets: "4", keep: all }
           |  - name: spread
           |    op: shuffle_shards
           |    params: { shards: "1", salt: rv3 }
           |  - name: archived
           |    op: export_warc
           |    params: { uri: url, recordType: response, date: "${dateOf(now)}",
           |              revisitWhen: content_changed,
           |              refersToDateFrom: content_fp_ts }
           |""".stripMargin)
      y.toString
    }
    def night(now: Long, pages: Seq[(Long, String, String)]): Map[String, Warc.WarcRevisit] = {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$src/pages.parquet"))
      pages.toDF("doc_id", "url", "text").write.parquet(s"$src/pages.parquet")
      val out = tmp("graft-rv3-out")
      Cli.run(Seq("pipeline", yamlFor(now), src, out, "--state", state), spark)
      val bytes = Files.readAllBytes(
        Paths.get(out, "exports", "archived", "shard=0", "capture.warc.gz"))
      Warc.parseRevisits(Seq((1L, bytes)).toDF("doc_id", "warc"),
          "doc_id", "warc", gzipped = true)
        .collect().map(r => r.target_uri -> r).toMap
    }
    val (aV1, b) = ("alpha v1", "beta stays identical forever")
    // night 1: both new -> no revisits
    assert(night(D1, Seq((1L, "http://h/a", aV1), (2L, "http://h/b", b))).isEmpty)
    // night 2: /a changed, /b unchanged -> /b revisit refers to D1
    val n2 = night(D1 + 86400, Seq((1L, "http://h/a", "alpha v2"), (2L, "http://h/b", b)))
    assert(n2.keySet === Set("http://h/b"))
    assert(n2("http://h/b").refers_to_date === dateOf(D1))
    // night 3: BOTH unchanged -> /b still refers to D1 (the response
    // record, NOT night 2's payload-less revisit); /a refers to D2
    // (the night its content last changed)
    val n3 = night(D1 + 2 * 86400, Seq((1L, "http://h/a", "alpha v2"), (2L, "http://h/b", b)))
    assert(n3.keySet === Set("http://h/a", "http://h/b"))
    assert(n3("http://h/b").refers_to_date === dateOf(D1),
      "an unchanged page must keep referring to the payload-bearing capture")
    assert(n3("http://h/a").refers_to_date === dateOf(D1 + 86400))
  }
}
