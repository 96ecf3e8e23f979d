package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap-based sessionization: Spark's native `session_window`
  * aggregation with a watermark, emitting the same per-session summary
  * shape as the batch [[graft.operators.Sessions.sessionStats]].
  *
  * The reference has no streaming (its incremental refresh is
  * micro-batch over a time window); this is the Spark-native extension
  * of the sessionization operator to streams: state is managed by the
  * session-window state store, sessions merge across micro-batches
  * when a late/bridging event connects them, and append mode emits a
  * session only once its watermark-closed end is final.
  *
  * Boundary semantics: the batch operator starts a new session when the
  * inter-event gap is STRICTLY GREATER than `gapSeconds` (an event at
  * exactly the gap still belongs to the session). `session_window`'s
  * merge test is strictly-less-than (`next.start < prev.end + gap`), so
  * the two disagree exactly at `diff == gap`. Event timestamps are
  * microsecond-resolution, so a session-window gap of `gapSeconds` + 1
  * microsecond makes the streaming sessions EQUAL the batch sessions
  * (StreamingSessionizeSpec pins this, boundary case included).
  *
  * The per-entity session ORDINAL (`session_seq`) is deliberately
  * absent: numbering sessions 1..n needs the entity's total history,
  * which a stream never has; the (entity, start, end) span is the
  * stable session identity downstream joins should key on.
  */
object StreamingSessionize {

  def sessionStats(
      events: DataFrame, entityCol: String, tsCol: String, valueCol: String,
      gapSeconds: Long, watermark: String = "1 day"
  ): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be > 0, got $gapSeconds")
    val gapMicros = gapSeconds * 1000000L + 1L
    events
      .withWatermark(tsCol, watermark)
      .groupBy(
        col(entityCol),
        session_window(col(tsCol), s"$gapMicros microseconds"))
      .agg(
        count(lit(1)).as("n_events"),
        unix_micros(min(col(tsCol))).as("start_us"),
        unix_micros(max(col(tsCol))).as("end_us"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("value_sum"))
      .select(col(entityCol), col("n_events"), col("start_us"), col("end_us"),
        col("value_sum"))
  }
}
