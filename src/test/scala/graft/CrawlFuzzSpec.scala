package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{TextAnalysis, Warc}

/** Adversarial-input robustness for the crawl front-end: the WARC
  * parser and the HTML extractor face the open internet, so they get
  * property-level fuzzing on top of their example specs — parse is a
  * LEFT INVERSE of rendering for arbitrary payloads (including
  * payloads that look like WARC structure), and extraction never
  * throws, never emits a below-threshold line, and is deterministic
  * on arbitrary junk. */
class CrawlFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  // payloads deliberately include record-structure look-alikes
  private val payloadGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(Gen.asciiPrintableStr, Gen.const("WARC/1.0"),
      Gen.const("Content-Length: 3"), Gen.const(""), Gen.const("\r")))
      .map(_.mkString("\n")),
    Gen.stringOf(Gen.oneOf('a', 'é', '中', '\n', '\r', '<', '>', '&', ' ')))

  test("property: WARC parse is a left inverse of record rendering for ANY payloads") {
    def render(ps: List[String]): String = ps.zipWithIndex.map { case (p, i) =>
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://x/$i\r\n" +
        s"Content-Length: ${p.length}\r\n\r\n$p\r\n\r\n"
    }.mkString
    val prop = Prop.forAll(Gen.listOfN(3, payloadGen)) { ps =>
      val got = Warc.parseString(1L, render(ps))
      got.map(_.payload) == ps &&
        got.map(_.rec_idx) == ps.indices.toList &&
        got.forall(_.warc_type == "response")
    }
    check("warc-roundtrip", prop)
  }

  test("property: byte-path parse is a left inverse of rendering for ARBITRARY byte payloads, gzipped or plain") {
    val byteArrayGen: Gen[Array[Byte]] = Gen.oneOf(
      Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      payloadGen.map(_.getBytes("UTF-8")), // incl. multi-byte UTF-8
      Gen.const("WARC/1.0\r\nContent-Length: 3\r\n\r\n".getBytes("UTF-8")))
    def render(ps: List[Array[Byte]]): Array[Byte] =
      ps.zipWithIndex.flatMap { case (p, i) =>
        (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://x/$i\r\n" +
          s"Content-Length: ${p.length}\r\n\r\n").getBytes("UTF-8") ++
          p ++ "\r\n\r\n".getBytes("UTF-8")
      }.toArray
    val prop = Prop.forAll(Gen.listOfN(3, byteArrayGen), Gen.oneOf(false, true)) {
      (ps, gz) =>
        val plain = render(ps)
        // one gzip member per record — the CommonCrawl layout
        val capture =
          if (gz) ps.flatMap(p => Warc.gzipMember(render(List(p)))).toArray
          else plain
        val content = if (gz) Warc.gunzipMembers(capture) else capture
        val got = Warc.parseBytes(1L, content)
        got.map(_.payload.toSeq) == ps.map(_.toSeq) &&
          got.map(_.rec_idx) == ps.indices.toList &&
          got.map(_.content_length) == ps.map(_.length.toLong) &&
          got.forall(_.warc_type == "response")
    }
    check("warc-bytes-roundtrip", prop)
  }

  test("property: the REAL renderer round-trips through gzip members and parse for arbitrary payloads") {
    val byteArrayGen: Gen[Array[Byte]] = Gen.oneOf(
      Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      payloadGen.map(_.getBytes("UTF-8")))
    val prop = Prop.forAll(Gen.listOfN(3, byteArrayGen)) { ps =>
      val members = ps.zipWithIndex.flatMap { case (p, i) =>
        Warc.gzipMember(Warc.renderRecordBytes(
          "response", s"http://x/$i", "2024-01-01T00:00:00Z", p))
      }.toArray
      val got = Warc.parseBytes(1L, Warc.gunzipMembers(members))
      got.map(_.payload.toSeq) == ps.map(_.toSeq) &&
        got.map(_.target_uri) == ps.indices.map(i => s"http://x/$i").toList &&
        got.forall(_.warc_type == "response") &&
        // determinism: rendering again is byte-identical
        members.toSeq == ps.zipWithIndex.flatMap { case (p, i) =>
          Warc.gzipMember(Warc.renderRecordBytes(
            "response", s"http://x/$i", "2024-01-01T00:00:00Z", p))
        }
    }
    check("warc-render-roundtrip", prop)
  }

  test("property: byte-path parse on arbitrary junk bytes either parses or raises — never hangs or index-errors") {
    val junkBytes: Gen[Array[Byte]] = Gen.oneOf(
      Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      payloadGen.map(_.getBytes("UTF-8")))
    val prop = Prop.forAll(junkBytes) { b =>
      try { Warc.parseBytes(0L, b); true }
      catch { case _: IllegalArgumentException => true }
    }
    check("warc-bytes-junk", prop, n = 120)
  }

  test("property: WARC parse on arbitrary junk either parses or raises — never hangs or index-errors") {
    val prop = Prop.forAll(payloadGen) { s =>
      try { Warc.parseString(0L, s); true }
      catch { case _: IllegalArgumentException => true }
      // anything else (StringIndexOutOfBounds, NumberFormat, stack
      // overflow) fails the property
    }
    check("warc-junk", prop, n = 120)
  }

  test("property: extractHtml never throws, never emits a short line, and is deterministic") {
    val htmlish: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.const("<div>"), Gen.const("</p>"), Gen.const("<script>"),
      Gen.const("</script>"), Gen.const("<a href='/x'>link text</a>"),
      Gen.const("&amp;"), Gen.const("&#39;"), Gen.const("<"), Gen.const(">"),
      Gen.const("<nav>"), Gen.const("<!--"), Gen.const("-->"),
      Gen.stringOf(Gen.oneOf('a', ' ', '\n', 'é', '中'))))
      .map(_.mkString(" "))
    val prop = Prop.forAll(htmlish) { h =>
      val out = Seq(Tuple1(h)).toDF("h")
        .select(TextAnalysis.extractHtml(col("h"), minChars = 10).as("t"))
        .collect()(0).getString(0)
      val out2 = Seq(Tuple1(h)).toDF("h")
        .select(TextAnalysis.extractHtml(col("h"), minChars = 10).as("t"))
        .collect()(0).getString(0)
      out == out2 &&
        (out.isEmpty || out.split("\n").forall(l =>
          l.codePointCount(0, l.length) >= 10 && l == l.trim))
    }
    check("extract-html", prop, n = 40)
  }
}
