package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Sharded `.warc.gz` capture writer — the ARCHIVAL side of the crawl
  * loop ([[graft.operators.Warc.parseRecordsBytes]] is the read
  * side): per shard, ONE `capture.warc.gz` holding the shard's
  * records in `pos` order — response/resource records render
  * WARC/1.0 ([[graft.operators.Warc.renderRecordBytes]] —
  * deterministic record ids, caller-supplied capture date) and
  * revisit records WARC/1.1 ([[graft.operators.Warc
  * .renderRevisitBytes]]; `WARC-Refers-To-Date` is a 1.1 field) —
  * each wrapped as its OWN gzip member, the CommonCrawl layout that
  * lets a reader seek to a member boundary and start there.
  *
  * Write discipline is [[TokenBinary.writeShards]]'s: the Hadoop
  * FileSystem API (`file://`/`hdfs://` alike), one task per shard,
  * attempt-unique temp file renamed into place on shard completion —
  * duplicate speculative attempts can never interleave, and a re-run
  * over the same input is byte-identical (the render is
  * deterministic end to end).
  */
object WarcSink {

  /** Write per-shard `.warc.gz` captures under `dir`. Input must carry
    * `shard` (int-castable), `pos` (long-castable), `warc_type`,
    * `target_uri` (strings; NULLs render empty), and `payloadCol`
    * (binary). `date` is the capture instant in the WARC-Date format
    * (`YYYY-MM-DDThh:mm:ssZ`), explicit for determinism.
    *
    * Archival dedup: when the input carries a `revisit` column
    * (boolean), TRUE rows render as WARC `revisit` records
    * ([[graft.operators.Warc.renderRevisitBytes]] —
    * identical-payload-digest profile, NO payload stored) using the
    * mandatory `payload_digest` column (md5 hex of the unchanged
    * payload) and the optional `refers_to_date` column (the prior
    * capture's WARC-Date; empty/NULL omits the header). This is how a
    * nightly archive stores an unchanged re-fetch without duplicating
    * its bytes. */
  def writeShards(
      df: DataFrame, payloadCol: String, dir: String, nShards: Int, date: String
  ): Unit = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(date.matches("\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}Z"),
      s"date must be WARC-Date shaped (YYYY-MM-DDThh:mm:ssZ), got '$date'")
    val targetDir = dir
    val dateV = date
    val hasRevisit = df.columns.contains("revisit")
    if (hasRevisit)
      require(df.columns.contains("payload_digest"),
        "writeShards: a 'revisit' column needs a 'payload_digest' column " +
          "(md5 hex of the deduplicated payload)")
    val revisitCols =
      if (hasRevisit) Seq(
        coalesce(col("revisit").cast("boolean"), lit(false)).as("revisit"),
        // a revisit row without its digest must fail IN-PLAN, naming
        // the row (target URI) — renderRevisitBytes' require would
        // only fire mid-write inside foreachPartition, after shard
        // files may have been staged, with no row context. The check
        // runs in the map stage feeding the shard exchange, so it
        // aborts before the write stage opens a single file.
        when(coalesce(col("revisit").cast("boolean"), lit(false)) &&
            (col("payload_digest").isNull ||
              col("payload_digest").cast("string") === ""),
          raise_error(concat(
            lit("WarcSink.writeShards: revisit row for target URI '"),
            coalesce(col("target_uri").cast("string"), lit("")),
            lit("' has a NULL/empty payload_digest — a revisit record " +
              "needs the digest it deduplicates by"))))
          .otherwise(coalesce(col("payload_digest"), lit("")).cast("string"))
          .as("payload_digest"),
        (if (df.columns.contains("refers_to_date"))
          coalesce(col("refers_to_date"), lit("")).cast("string")
        else lit("")).as("refers_to_date"))
      else Seq.empty
    df.select(Seq(col("shard").cast("int"), col("pos").cast("long"),
        coalesce(col("warc_type"), lit("")).cast("string"),
        coalesce(col("target_uri"), lit("")).cast("string"),
        col(payloadCol)) ++ revisitCols: _*)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .foreachPartition { (it: Iterator[Row]) =>
        val conf = new Configuration()
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        var cur: Int = Int.MinValue
        var out: java.io.OutputStream = null
        var tmp: Path = null
        var dst: Path = null
        def closeCurrent(commit: Boolean): Unit = if (out != null) {
          out.close(); out = null
          val fs = dst.getFileSystem(conf)
          if (commit) {
            if (fs.exists(dst)) fs.delete(dst, false)
            require(fs.rename(tmp, dst),
              s"WarcSink.writeShards: rename $tmp -> $dst failed")
          } else fs.delete(tmp, false)
        }
        try {
          it.foreach { row =>
            val shard = row.getInt(0)
            if (out == null || shard != cur) {
              closeCurrent(commit = true)
              cur = shard
              dst = new Path(s"$targetDir/shard=$shard/capture.warc.gz")
              tmp = new Path(s"$targetDir/shard=$shard/.capture.warc.gz.attempt-$attempt")
              out = new java.io.BufferedOutputStream(
                tmp.getFileSystem(conf).create(tmp, true), 1 << 16)
            }
            val rec =
              if (hasRevisit && !row.isNullAt(5) && row.getBoolean(5))
                graft.operators.Warc.renderRevisitBytes(
                  row.getString(3), dateV, row.getString(6), row.getString(7))
              else {
                val payload = row.getAs[Array[Byte]](4)
                graft.operators.Warc.renderRecordBytes(
                  row.getString(2), row.getString(3), dateV,
                  if (payload == null) Array.emptyByteArray else payload)
              }
            out.write(graft.operators.Warc.gzipMember(rec))
          }
          closeCurrent(commit = true)
        } finally closeCurrent(commit = false)
      }
  }
}
