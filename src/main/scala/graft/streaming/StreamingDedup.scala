package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming exact deduplication: the ingestion-time counterpart of
  * [[graft.operators.Dedup.exact]] — drop documents whose normalized
  * content fingerprint was already seen, as they arrive.
  *
  * Built on `dropDuplicatesWithinWatermark`: Spark keeps one state row
  * per fingerprint and — crucially — drops that row once the watermark
  * passes the event time it was recorded at, so state is bounded by
  * the dedup horizon's traffic, not by all history. That is the honest
  * streaming contract at 100 TB ingest: duplicates are only detected
  * within the watermark window (a re-crawl a week later is a BATCH
  * dedup problem — [[graft.operators.Dedup]] — not a streaming one),
  * in exchange for state that cannot grow without bound.
  *
  * The fingerprint is the same md5-of-normalized-text used by the
  * batch operator, computed scan-locally before the stateful step, so
  * the state key is 16 bytes regardless of document size. Which copy
  * of a duplicate set survives is arrival-order-dependent (the first
  * to arrive) — same survivor rule as the batch operator's min-key
  * tie-break under in-order feeds; StreamingSpec pins batch parity of
  * the surviving fingerprint set.
  */
object StreamingDedup {

  def dedupe(
      docs: DataFrame, tsCol: String, textCol: String,
      watermark: String = "1 day"
  ): DataFrame = {
    require(!docs.columns.contains("__fp"),
      "dedupe would overwrite existing column '__fp' — rename it first")
    docs
      .withColumn("__fp", md5(TextAnalysis.normalized(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
  }
}
