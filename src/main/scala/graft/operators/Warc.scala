package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 / WARC/1.x) record parsing — the step BEFORE
  * [[TextAnalysis.extractHtml]] in a real crawl pipeline: a
  * CommonCrawl-style capture file is a concatenation of records, each
  * a `WARC/1.x` version line, CRLF-separated named headers, a blank
  * line, then EXACTLY `Content-Length` bytes of payload followed by
  * two blank lines.
  *
  * Parsing is LENGTH-ACCOUNTED, not regex-split: the payload is
  * sliced by the declared `Content-Length`, so a body containing the
  * literal text `WARC/1.0` (quoted markup, nested captures) can never
  * split a record — the failure mode any delimiter-based splitter
  * has. Over this STRING column the length counts UTF-16 units, which
  * equals bytes for the ASCII/Latin-1 captures the gates construct; a
  * byte-exact binary-column variant would run the same core over
  * `Array[Byte]` (spec'd contract, CrawlFuzzSpec round-trips
  * arbitrary payloads under it). The
  * scan shape is the [[Multimodal]] convention: one `mapPartitions`
  * pass, per-record output fan-out bounded by input size, no shuffle,
  * no driver involvement.
  *
  * Fail-loud contract: a record missing `Content-Length`, a
  * non-numeric length, a length past the end of input, or a version
  * line that is not `WARC/` raises with the document id and byte
  * offset — a silently mis-sliced crawl poisons every downstream
  * operator. Header names are case-insensitive (the spec); both CRLF
  * and bare LF line endings are accepted (real-world tolerance);
  * trailing garbage after the last record raises.
  */
object Warc {

  /** One parsed record. `payload` is the raw record block (an HTTP
    * message for `response` records — see [[httpBody]]). */
  final case class WarcRecord(
      doc_id: Long,
      rec_idx: Int,
      warc_type: String,
      target_uri: String,
      content_length: Long,
      payload: String
  )

  /** Parse every record of each row's WARC content (string column).
    * Output one row per record, in capture order (`rec_idx`). */
  def parseRecords(warcs: DataFrame, idCol: String, warcCol: String): Dataset[WarcRecord] = {
    val spark = warcs.sparkSession
    import spark.implicits._
    warcs.select(col(idCol).cast("long"), col(warcCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, content0) =>
          val content = if (content0 == null) "" else content0
          parseString(id, content)
        }
      }
  }

  /** The parser core, exposed for specs: records of one capture
    * string. */
  private[graft] def parseString(id: Long, content: String): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    def lineEnd(from: Int): Int = {
      val nl = content.indexOf('\n', from)
      if (nl < 0) content.length else nl
    }
    def lineAt(from: Int): (String, Int) = {
      val end = lineEnd(from)
      val raw = content.substring(from, end)
      (if (raw.endsWith("\r")) raw.dropRight(1) else raw,
        math.min(end + 1, content.length))
    }
    var idx = 0
    while (pos < content.length) {
      // skip inter-record blank lines
      val (probe, afterProbe) = lineAt(pos)
      if (probe.isEmpty) pos = afterProbe
      else {
        require(probe.startsWith("WARC/"),
          s"WARC parse: doc $id byte $pos: expected a WARC/ version line, " +
            s"got '${probe.take(40)}' — mis-sliced or non-WARC input")
        pos = afterProbe
        // headers until the blank line
        val headers = scala.collection.mutable.HashMap.empty[String, String]
        var headerDone = false
        while (!headerDone) {
          require(pos < content.length,
            s"WARC parse: doc $id: input ends inside record $idx's headers")
          val (h, after) = lineAt(pos)
          pos = after
          if (h.isEmpty) headerDone = true
          else {
            val sep = h.indexOf(':')
            require(sep > 0,
              s"WARC parse: doc $id record $idx: malformed header line '${h.take(40)}'")
            headers(h.substring(0, sep).trim.toLowerCase) = h.substring(sep + 1).trim
          }
        }
        val lenStr = headers.getOrElse("content-length",
          throw new IllegalArgumentException(
            s"WARC parse: doc $id record $idx has no Content-Length header — " +
              "cannot slice the payload"))
        val len = lenStr.toLongOption.filter(_ >= 0).getOrElse(
          throw new IllegalArgumentException(
            s"WARC parse: doc $id record $idx: bad Content-Length '$lenStr'"))
        require(pos + len <= content.length,
          s"WARC parse: doc $id record $idx: Content-Length $len runs past " +
            s"end of input (${content.length - pos} bytes left) — truncated capture")
        val payload = content.substring(pos, pos + len.toInt)
        pos += len.toInt
        out += WarcRecord(
          doc_id = id, rec_idx = idx,
          warc_type = headers.getOrElse("warc-type", ""),
          target_uri = headers.getOrElse("warc-target-uri", ""),
          content_length = len, payload = payload)
        idx += 1
      }
    }
    out.toSeq
  }

  /** The body of an HTTP message payload (a `response` record wraps
    * `HTTP/1.1 200 OK` + headers + blank line + entity body): text
    * after the first blank line, or the whole payload when no HTTP
    * header block is present (a `resource`/`conversion` record carries
    * the bare content). Pure Column expression — codegen'd, no UDF —
    * using a two-branch locate over both line conventions. */
  def httpBody(payload: Column): Column = {
    val p = coalesce(payload, lit(""))
    val crlf = locate("\r\n\r\n", p)
    val lf   = locate("\n\n", p)
    // earliest present separator wins; HTTP/ prefix required for a
    // header block — otherwise the payload IS the body
    val sepAt = when(crlf > 0 && (lf === 0 || crlf < lf), crlf + lit(3))
      .when(lf > 0, lf + lit(1))
      .otherwise(lit(0))
    when(p.startsWith("HTTP/") && sepAt > 0, p.substr(sepAt + 1, length(p)))
      .otherwise(p)
  }
}
