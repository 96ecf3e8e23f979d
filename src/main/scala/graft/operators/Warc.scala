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
  * has. Two parse surfaces share the core:
  *
  *  - [[parseRecordsBytes]] — the BYTE-EXACT path over a `binary`
  *    column: `Content-Length` counts octets exactly as WARC/HTTP
  *    declare them, so multi-byte UTF-8 bodies and raw binary
  *    payloads (images, gzip members) slice correctly. With
  *    `gzipped = true` the column holds a real `.warc.gz` capture —
  *    concatenated per-record gzip members (the CommonCrawl layout) —
  *    decoded scan-locally via `java.util.zip` before slicing. This
  *    is the real-input front door.
  *  - [[parseRecords]] — the STRING-column convenience: lengths count
  *    UTF-16 units, which equals bytes only for ASCII/Latin-1
  *    captures (the in-plan constructed gates); anything non-Latin-1
  *    belongs on the binary path.
  *
  * The scan shape is the [[Multimodal]] convention either way: one
  * `mapPartitions` pass, per-record output fan-out bounded by input
  * size, no shuffle, no driver involvement.
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

  /** One parsed record off the byte-exact path. `payload` is the raw
    * record block bytes; decode with `payload.cast("string")` (Spark
    * casts binary → string as UTF-8) when the content is text, or
    * keep the bytes for media/[[Multimodal]] consumers. */
  final case class WarcRecordBytes(
      doc_id: Long,
      rec_idx: Int,
      warc_type: String,
      target_uri: String,
      content_length: Long,
      payload: Array[Byte]
  )

  /** Parse every record of each row's WARC capture BYTES — the
    * byte-exact path real `.warc(.gz)` input takes. `gzipped = true`
    * first decodes the row's concatenated gzip members
    * ([[gunzipMembers]] — CommonCrawl writes one member per record;
    * any member concatenation that yields the capture is accepted).
    * Output one row per record, in capture order (`rec_idx`). */
  def parseRecordsBytes(
      warcs: DataFrame, idCol: String, warcCol: String, gzipped: Boolean = false
  ): Dataset[WarcRecordBytes] = {
    val spark = warcs.sparkSession
    import spark.implicits._
    warcs.select(col(idCol).cast("long"), col(warcCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, b0) =>
          val raw = if (b0 == null) Array.emptyByteArray else b0
          val content =
            if (gzipped && raw.nonEmpty)
              try gunzipMembers(raw)
              catch {
                case e: java.io.IOException =>
                  throw new IllegalArgumentException(
                    s"WARC parse: doc $id: gzip decode failed — ${e.getMessage}", e)
              }
            else raw
          parseBytes(id, content)
        }
      }
  }

  /** Default decompressed-size bound per capture row for
    * [[gunzipMembers]] — 1 GiB. A crawled `.warc.gz` is untrusted
    * content; an adversarial member ("gzip bomb") can expand a few KB
    * into many GB and OOM the task, so inflation stops fail-loud at
    * this bound. Real CommonCrawl captures are far under it. */
  val MaxGunzipBytes: Long = 1L << 30

  /** Decode a byte array of CONCATENATED gzip members to the
    * concatenated payload. Members are framed MANUALLY (RFC 1952
    * header → raw-deflate `Inflater` → CRC32/ISIZE trailer) rather
    * than via `GZIPInputStream`, because OpenJDK's multi-member probe
    * swallows IOExceptions while looking for the next header and
    * returns end-of-stream — a corrupted member boundary or trailing
    * garbage would silently drop every subsequent record. Here EVERY
    * input byte must be consumed by a well-formed member: bad magic,
    * truncated streams, CRC/ISIZE mismatches, and trailing garbage all
    * raise. Scan-local; decompressed output is bounded by `maxOut`
    * ([[MaxGunzipBytes]]) and raises beyond it (bomb guard). */
  private[graft] def gunzipMembers(
      bytes: Array[Byte], maxOut: Long = MaxGunzipBytes): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(
      math.max(64, math.min(bytes.length.toLong * 4, 1L << 20).toInt))
    var off = 0
    var member = 0
    def fail(msg: String): Nothing = throw new java.io.IOException(
      s"gzip member $member at input byte $off: $msg")
    def le32(p: Int): Long =
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    while (off < bytes.length) {
      // RFC 1952 fixed header + optional fields
      if (bytes.length - off < 10) fail("truncated gzip header")
      if ((bytes(off) & 0xff) != 0x1f || (bytes(off + 1) & 0xff) != 0x8b)
        fail(f"bad gzip magic 0x${bytes(off) & 0xff}%02x${bytes(off + 1) & 0xff}%02x " +
          "— corrupted member boundary or trailing garbage")
      if ((bytes(off + 2) & 0xff) != 8) fail("unsupported compression method")
      val flg = bytes(off + 3) & 0xff
      off += 10
      if ((flg & 4) != 0) { // FEXTRA
        if (bytes.length - off < 2) fail("truncated FEXTRA length")
        off += 2 + ((bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8))
        if (off > bytes.length) fail("truncated FEXTRA")
      }
      def skipZString(): Unit = {
        while (off < bytes.length && bytes(off) != 0) off += 1
        if (off >= bytes.length) fail("unterminated header string")
        off += 1
      }
      if ((flg & 8) != 0) skipZString()  // FNAME
      if ((flg & 16) != 0) skipZString() // FCOMMENT
      if ((flg & 2) != 0) {              // FHCRC
        off += 2
        if (off > bytes.length) fail("truncated FHCRC")
      }
      // raw deflate body
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(bytes, off, bytes.length - off)
        val buf = new Array[Byte](1 << 16)
        val crc = new java.util.zip.CRC32()
        var memberOut = 0L
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch {
              case e: java.util.zip.DataFormatException =>
                fail(s"corrupt deflate stream — ${e.getMessage}")
            }
          if (n == 0 && !inf.finished()) fail(
            if (inf.needsDictionary()) "deflate stream demands a preset dictionary"
            else "truncated deflate stream")
          if (n > 0) {
            memberOut += n
            if (out.size().toLong + n > maxOut)
              fail(s"decompressed size exceeds the $maxOut-byte bound — " +
                "refusing to inflate further (gzip bomb?)")
            out.write(buf, 0, n)
            crc.update(buf, 0, n)
          }
        }
        off += inf.getBytesRead.toInt
        if (bytes.length - off < 8) fail("truncated gzip trailer")
        if (le32(off) != crc.getValue) fail("CRC32 mismatch")
        if (le32(off + 4) != (memberOut & 0xffffffffL)) fail("ISIZE mismatch")
        off += 8
      } finally inf.end()
      member += 1
    }
    out.toByteArray
  }

  /** One gzip member around `bytes` — the writer-side inverse of
    * [[gunzipMembers]] for specs and constructed gates (CommonCrawl
    * writes each record as its own member so a reader can seek to a
    * member boundary and start there). `java.util.zip.GZIPOutputStream`
    * emits MTIME=0, so the member bytes are deterministic. */
  private[graft] def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 32)
    val g = new java.util.zip.GZIPOutputStream(bos)
    try g.write(bytes) finally g.close()
    bos.toByteArray
  }

  /** Render ONE record's bytes — the writer-side inverse of
    * [[parseBytes]] for the fields it carries (CrawlFuzzSpec pins
    * parse∘render = id). Mandatory WARC/1.0 headers are included:
    * `WARC-Date` is the caller's capture instant (explicit — a
    * wall-clock read would break byte-deterministic re-export), and
    * `WARC-Record-ID` is a DETERMINISTIC urn:uuid derived from the
    * record's own content (md5 of type|uri|date|payload) — two runs
    * over the same capture render byte-identical archives, and two
    * distinct records collide only if md5 does. */
  private[graft] def renderRecordBytes(
      warcType: String, targetUri: String, date: String, payload: Array[Byte]
  ): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(s"$warcType|$targetUri|$date|".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.update(payload)
    val h = md.digest().map(b => f"${b & 0xff}%02x").mkString
    val rid = s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
      s"${h.substring(16, 20)}-${h.substring(20, 32)}"
    val header =
      s"WARC/1.0\r\nWARC-Type: $warcType\r\n" +
        s"WARC-Record-ID: <urn:uuid:$rid>\r\nWARC-Date: $date\r\n" +
        (if (targetUri.nonEmpty) s"WARC-Target-URI: $targetUri\r\n" else "") +
        s"Content-Length: ${payload.length}\r\n\r\n"
    header.getBytes(java.nio.charset.StandardCharsets.UTF_8) ++ payload ++
      "\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The WARC 1.1 §6.7.2 revisit profile URI for "the payload was
    * byte-identical to an earlier capture" — the archival-dedup record
    * the big public crawls write instead of storing an unchanged page
    * twice. */
  val RevisitProfileIdenticalDigest =
    "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"

  /** Render ONE `revisit` record — the archival side of change
    * detection ([[Recrawl.changeVerdicts]]): a re-fetch whose content
    * fingerprint matched the previous capture stores NO payload
    * (`Content-Length: 0`), only the identical-payload-digest profile,
    * the digest itself (`md5:<hex>` — the same md5 content address the
    * dedup/change machinery uses), and `WARC-Refers-To-Date`, the
    * capture instant of the record it deduplicates against (omitted
    * when unknown). Record id is DETERMINISTIC like
    * [[renderRecordBytes]]' (md5 of the revisit identity), so re-export
    * is byte-identical. */
  private[graft] def renderRevisitBytes(
      targetUri: String, date: String, payloadDigest: String, refersToDate: String
  ): Array[Byte] = {
    require(payloadDigest.nonEmpty,
      "renderRevisitBytes: a revisit record needs the payload digest " +
        "it deduplicates by")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(s"revisit|$targetUri|$date|$payloadDigest|$refersToDate"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val h = md.digest().map(b => f"${b & 0xff}%02x").mkString
    val rid = s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
      s"${h.substring(16, 20)}-${h.substring(20, 32)}"
    // WARC/1.1, not 1.0: both the identical-payload-digest profile URI
    // and WARC-Refers-To-Date were introduced in WARC 1.1 — strict
    // validators flag them on a 1.0 record
    val header =
      s"WARC/1.1\r\nWARC-Type: revisit\r\n" +
        s"WARC-Record-ID: <urn:uuid:$rid>\r\nWARC-Date: $date\r\n" +
        (if (targetUri.nonEmpty) s"WARC-Target-URI: $targetUri\r\n" else "") +
        s"WARC-Profile: $RevisitProfileIdenticalDigest\r\n" +
        s"WARC-Payload-Digest: md5:$payloadDigest\r\n" +
        (if (refersToDate.nonEmpty) s"WARC-Refers-To-Date: $refersToDate\r\n" else "") +
        "Content-Length: 0\r\n\r\n"
    header.getBytes(java.nio.charset.StandardCharsets.UTF_8) ++
      "\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The byte-exact parser core, exposed for specs: records of one
    * capture's bytes. Identical state machine to [[parseString]], with
    * offsets, `Content-Length`, and payload slices all in OCTETS —
    * header lines decode as UTF-8 (the WARC/1.1 header charset); the
    * payload is never decoded at all. */
  private[graft] def parseBytes(id: Long, content: Array[Byte]): Seq[WarcRecordBytes] =
    parseRawBytes(id, content).zipWithIndex.map { case ((headers, payload), idx) =>
      WarcRecordBytes(
        doc_id = id, rec_idx = idx,
        warc_type = headers.getOrElse("warc-type", ""),
        target_uri = headers.getOrElse("warc-target-uri", ""),
        content_length = payload.length.toLong, payload = payload)
    }

  /** The raw parse: (lowercased header map, payload octets) per
    * record, capture order — [[parseBytes]] and [[parseRevisits]]
    * project their shapes from this one state machine. */
  private def parseRawBytes(
      id: Long, content: Array[Byte]): Seq[(Map[String, String], Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Map[String, String], Array[Byte])]
    val n = content.length
    var pos = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < n && content(i) != '\n') i += 1
      i
    }
    def lineAt(from: Int): (String, Int) = {
      val end = lineEnd(from)
      val stop = if (end > from && content(end - 1) == '\r') end - 1 else end
      (new String(content, from, stop - from, java.nio.charset.StandardCharsets.UTF_8),
        math.min(end + 1, n))
    }
    var idx = 0
    while (pos < n) {
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
          require(pos < n,
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
        require(pos + len <= n,
          s"WARC parse: doc $id record $idx: Content-Length $len runs past " +
            s"end of input (${n - pos} bytes left) — truncated capture")
        val payload = java.util.Arrays.copyOfRange(content, pos, pos + len.toInt)
        pos += len.toInt
        out += ((headers.toMap, payload))
        idx += 1
      }
    }
    out.toSeq
  }

  /** One revisit record's dedup metadata. */
  final case class WarcRevisit(
      doc_id: Long,
      rec_idx: Int,
      target_uri: String,
      profile: String,
      payload_digest: String,
      refers_to_date: String
  )

  /** The `revisit` records of each row's capture BYTES with their
    * dedup headers (`WARC-Profile`, `WARC-Payload-Digest`,
    * `WARC-Refers-To-Date`) — what an archive consumer needs to
    * resolve a deduplicated capture against the referred-to record.
    * `rec_idx` is the record's position in the WHOLE capture (response
    * records count), so revisits join back to [[parseRecordsBytes]]
    * rows positionally. Scan-local mapPartitions like the main
    * parse. */
  def parseRevisits(
      warcs: DataFrame, idCol: String, warcCol: String, gzipped: Boolean = false
  ): Dataset[WarcRevisit] = {
    val spark = warcs.sparkSession
    import spark.implicits._
    warcs.select(col(idCol).cast("long"), col(warcCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, b0) =>
          val raw = if (b0 == null) Array.emptyByteArray else b0
          val content =
            if (gzipped && raw.nonEmpty)
              try gunzipMembers(raw)
              catch {
                case e: java.io.IOException =>
                  throw new IllegalArgumentException(
                    s"WARC parse: doc $id: gzip decode failed — ${e.getMessage}", e)
              }
            else raw
          parseRawBytes(id, content).zipWithIndex.collect {
            case ((h, _), idx) if h.getOrElse("warc-type", "") == "revisit" =>
              WarcRevisit(id, idx,
                h.getOrElse("warc-target-uri", ""),
                h.getOrElse("warc-profile", ""),
                h.getOrElse("warc-payload-digest", ""),
                h.getOrElse("warc-refers-to-date", ""))
          }
        }
      }
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

  /** The status code of an HTTP message payload (`HTTP/1.1 200 OK` →
    * 200), NULL when the payload is not an HTTP message. Codegen'd. */
  def httpStatus(payload: Column): Column =
    nullif(regexp_extract(coalesce(payload, lit("")),
      "^HTTP/[0-9.]+ ([0-9]{3})", 1), lit("")).cast("int")

  /** The HEADER block of an HTTP message payload — the status line +
    * headers BEFORE the first blank line — or `""` when the payload is
    * not an HTTP message ([[httpHeader]] must never match body text
    * that merely looks like a header). */
  private def httpHeaderBlock(payload: Column): Column = {
    val p = coalesce(payload, lit(""))
    val crlf = locate("\r\n\r\n", p)
    val lf   = locate("\n\n", p)
    val endAt = when(crlf > 0 && (lf === 0 || crlf < lf), crlf - 1)
      .when(lf > 0, lf - 1)
      .otherwise(length(p))
    when(p.startsWith("HTTP/"), p.substr(lit(1), endAt)).otherwise(lit(""))
  }

  /** A named HTTP header's value (case-insensitive, whitespace-
    * trimmed), `""` when absent or when the payload is not an HTTP
    * message; when a header repeats, the FIRST occurrence wins.
    * `name` is restricted to the header-name alphabet so it embeds
    * into the pattern verbatim. Codegen'd. */
  def httpHeader(payload: Column, name: String): Column = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '-'),
      s"header name must be [A-Za-z0-9-]+, got '$name'")
    regexp_replace(
      regexp_extract(httpHeaderBlock(payload), s"(?i)\\n$name:([^\\r\\n]*)", 1),
      "^\\s+|\\s+$", "")
  }

  /** Decode `Transfer-Encoding: chunked` framing: `hexsize[;ext]CRLF
    * data CRLF` repeated, a `0` chunk, then optional trailers. Over
    * this STRING column sizes count UTF-16 units (== bytes for the
    * ASCII/Latin-1 captures the gates construct — the [[parseString]]
    * caveat). Fail-loud on malformed framing: a silently mis-sliced
    * body poisons every downstream operator. */
  private[graft] def dechunk(body: String): String = {
    val sb = new java.lang.StringBuilder
    var pos = 0
    var done = false
    while (!done) {
      val nl = body.indexOf('\n', pos)
      require(nl >= 0, s"chunked body: no newline after chunk size at offset $pos")
      val rawLine = body.substring(pos, if (nl > pos && body.charAt(nl - 1) == '\r') nl - 1 else nl)
      val sizeHex = rawLine.takeWhile(_ != ';').trim // chunk extensions ignored
      val size =
        try Integer.parseInt(sizeHex, 16)
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"chunked body: bad chunk size '${rawLine.take(20)}' at offset $pos")
        }
      require(size >= 0, s"chunked body: negative chunk size at offset $pos")
      pos = nl + 1
      if (size == 0) done = true // trailers (if any) are dropped
      else {
        require(pos + size <= body.length,
          s"chunked body: chunk of $size runs past end of input at offset $pos")
        sb.append(body, pos, pos + size)
        pos += size
        // the CRLF/LF after the chunk data
        if (pos < body.length && body.charAt(pos) == '\r') pos += 1
        require(pos < body.length && body.charAt(pos) == '\n',
          s"chunked body: missing line break after chunk data at offset $pos")
        pos += 1
      }
    }
    sb.toString
  }

  private val dechunkUdf = udf { (b: String) => if (b == null) null else dechunk(b) }

  /** [[dechunk]] over raw OCTETS — chunked framing declares sizes in
    * bytes, so on the byte-exact path the frames must be removed
    * BEFORE any charset decode (a multi-byte body dechunked after
    * decoding would miscount every size). Same fail-loud contract. */
  private[graft] def dechunkBytes(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    val n = body.length
    var pos = 0
    var done = false
    while (!done) {
      var nl = pos
      while (nl < n && body(nl) != '\n') nl += 1
      require(nl < n, s"chunked body: no newline after chunk size at offset $pos")
      val stop = if (nl > pos && body(nl - 1) == '\r') nl - 1 else nl
      val rawLine = new String(body, pos, stop - pos,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val sizeHex = rawLine.takeWhile(_ != ';').trim
      val size =
        try Integer.parseInt(sizeHex, 16)
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"chunked body: bad chunk size '${rawLine.take(20)}' at offset $pos")
        }
      require(size >= 0, s"chunked body: negative chunk size at offset $pos")
      pos = nl + 1
      if (size == 0) done = true
      else {
        require(pos + size <= n,
          s"chunked body: chunk of $size runs past end of input at offset $pos")
        out.write(body, pos, size)
        pos += size
        if (pos < n && body(pos) == '\r') pos += 1
        require(pos < n && body(pos) == '\n',
          s"chunked body: missing line break after chunk data at offset $pos")
        pos += 1
      }
    }
    out.toByteArray
  }

  /** Decode an HTTP payload's raw bytes to BODY TEXT honoring the
    * message's own declarations — the byte-path twin of
    * [[httpBodyDechunked]], and the step real multi-charset input
    * needs (CommonCrawl is full of `ISO-8859-1`/`windows-1252` pages
    * a blind UTF-8 cast would mojibake):
    *
    *  - the header block (ASCII by RFC 9112; parsed through a
    *    latin-1 view that cannot throw) is split off;
    *  - `Transfer-Encoding: chunked` framing is removed at the BYTE
    *    level (sizes count octets — decoding first would miscount
    *    any multi-byte body);
    *  - a UTF-8/UTF-16 byte-order mark OUTRANKS every declaration
    *    (the WHATWG encoding-sniffing precedence) and is stripped;
    *  - otherwise body bytes decode with the `charset=` parameter of
    *    `Content-Type` when the JVM supports it; when the HEADER
    *    declares none, the first 1024 body bytes are prescanned for
    *    an HTML `<meta … charset=…>` declaration (the WHATWG
    *    byte-prescan convention — a large share of real pages declare
    *    charset only in markup; the header wins when both exist, the
    *    HTTP precedence rule); else UTF-8. Either way malformed
    *    sequences REPLACE (U+FFFD), never throw — one broken page
    *    must not kill a 100 TB scan;
    *  - a non-HTTP payload decodes whole as UTF-8 (the
    *    resource/conversion-record convention).
    */
  /** Split an HTTP message's bytes into (header block as a latin-1
    * string, raw body bytes with chunked framing removed). None when
    * the payload is not an HTTP message or has no body separator —
    * callers treat the whole payload as the content then. */
  private[graft] def httpSplitBytes(
      bytes: Array[Byte]): Option[(String, Array[Byte])] = {
    val n = bytes.length
    val isHttp = n >= 5 && bytes(0) == 'H' && bytes(1) == 'T' &&
      bytes(2) == 'T' && bytes(3) == 'P' && bytes(4) == '/'
    if (!isHttp) return None
    // earliest of \r\n\r\n | \n\n bounds the header block
    var i = 0
    var hdrEnd = -1
    var bodyStart = -1
    while (bodyStart < 0 && i < n) {
      if (bytes(i) == '\n') {
        if (i + 1 < n && bytes(i + 1) == '\n') { hdrEnd = i; bodyStart = i + 2 }
        else if (i + 2 < n && bytes(i + 1) == '\r' && bytes(i + 2) == '\n') {
          hdrEnd = i; bodyStart = i + 3
        }
      }
      i += 1
    }
    if (bodyStart < 0) return None // headers only / truncated
    val headers = new String(bytes, 0, hdrEnd,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    var body = java.util.Arrays.copyOfRange(bytes, bodyStart, n)
    val te = TransferEncodingPat
      .findFirstMatchIn(headers).map(_.group(1).toLowerCase(java.util.Locale.ROOT))
    if (te.exists(_.contains("chunked"))) body = dechunkBytes(body)
    Some((headers, body))
  }

  /** The HTTP BODY's raw octets — header block split off, chunked
    * framing removed, NOTHING decoded: what a media consumer wants
    * from a `response` record carrying an image (decoding would
    * shred the bytes). Non-HTTP payloads pass whole (the
    * resource-record convention). */
  private[graft] def httpBodyBytes(bytes: Array[Byte]): Array[Byte] =
    httpSplitBytes(bytes).map(_._2).getOrElse(bytes)

  private val bodyBytesUdf =
    udf { (b: Array[Byte]) => if (b == null) null else httpBodyBytes(b) }

  /** [[httpBodyBytes]] as a Column over a binary payload. */
  def httpBodyBytesCol(payload: Column): Column = bodyBytesUdf(payload)

  // hoisted hot-path patterns: decodeHttpPayload/httpSplitBytes run
  // once per RECORD in the charset-decode scan, and compiling these
  // per call dominated the per-row work (the r13 bench regression —
  // java.util.regex.Pattern is thread-safe once compiled, matchers
  // are per-call)
  private val TransferEncodingPat = "(?im)^transfer-encoding:(.*)$".r
  private val ContentTypePat = "(?im)^content-type:(.*)$".r
  private val CharsetPat = "(?i)charset\\s*=\\s*[\"']?([A-Za-z0-9_:.+-]+)".r
  private val MetaCharsetPat =
    "(?is)<meta[^>]{0,512}?charset\\s*=\\s*[\"']?([A-Za-z0-9_:.+-]+)".r

  private[graft] def decodeHttpPayload(bytes: Array[Byte]): String = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    def decode(b: Array[Byte], cs: java.nio.charset.Charset): String =
      cs.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
        .decode(java.nio.ByteBuffer.wrap(b)).toString
    val split = httpSplitBytes(bytes)
    if (split.isEmpty) return decode(bytes, utf8)
    val (headers, body) = split.get
    // a byte-order mark outranks every declaration (the WHATWG
    // encoding-sniffing precedence) and is stripped from the text
    if (body.length >= 3 && body(0) == 0xEF.toByte &&
        body(1) == 0xBB.toByte && body(2) == 0xBF.toByte)
      return decode(java.util.Arrays.copyOfRange(body, 3, body.length), utf8)
    if (body.length >= 2 && body(0) == 0xFF.toByte && body(1) == 0xFE.toByte)
      return decode(java.util.Arrays.copyOfRange(body, 2, body.length),
        java.nio.charset.StandardCharsets.UTF_16LE)
    if (body.length >= 2 && body(0) == 0xFE.toByte && body(1) == 0xFF.toByte)
      return decode(java.util.Arrays.copyOfRange(body, 2, body.length),
        java.nio.charset.StandardCharsets.UTF_16BE)
    def supported(name: String): Boolean =
      try java.nio.charset.Charset.isSupported(name)
      catch { case _: java.nio.charset.IllegalCharsetNameException => false }
    // the header only SHADOWS the meta prescan when the JVM can
    // actually decode with it — an unrecognized header charset (e.g.
    // a vendor alias) must fall through to a valid <meta charset>
    // declaration rather than mojibake the page as UTF-8
    val headerCs = ContentTypePat.findFirstMatchIn(headers)
      .map(_.group(1)).flatMap(ct => CharsetPat.findFirstMatchIn(ct).map(_.group(1)))
      .filter(supported)
    // no usable header: WHATWG-style prescan of the first 1024 body
    // bytes (charset declarations are ASCII; a latin-1 view cannot throw)
    val metaCs =
      if (headerCs.nonEmpty) None
      else {
        val head = new String(body, 0, math.min(1024, body.length),
          java.nio.charset.StandardCharsets.ISO_8859_1)
        MetaCharsetPat.findFirstMatchIn(head).map(_.group(1)).filter(supported)
      }
    val cs = headerCs.orElse(metaCs)
      .map(java.nio.charset.Charset.forName)
      .getOrElse(utf8)
    decode(body, cs)
  }

  private val bodyCharsetUdf =
    udf { (b: Array[Byte]) => if (b == null) null else decodeHttpPayload(b) }

  /** [[decodeHttpPayload]] as a Column over a binary payload — the
    * scan-local per-record decode of the byte-exact path (off the
    * codegen path like [[httpBodyDechunked]]'s chunked branch;
    * bounded per-record work, no shuffle). */
  def httpBodyCharset(payload: Column): Column = bodyCharsetUdf(payload)

  /** [[httpBody]], with `Transfer-Encoding: chunked` framing decoded
    * when the header declares it (the wire form is useless downstream).
    * The chunked branch is a scan-local UDF — bounded per-record work
    * off the codegen path only for records that actually chunk. */
  def httpBodyDechunked(payload: Column): Column =
    when(lower(httpHeader(payload, "Transfer-Encoding")).contains("chunked"),
      dechunkUdf(httpBody(payload)))
      .otherwise(httpBody(payload))
}
