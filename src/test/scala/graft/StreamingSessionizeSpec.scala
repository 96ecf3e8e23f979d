package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Sessions
import graft.streaming.StreamingSessionize

/** Streaming sessionization must converge to the batch operator over
  * the same data — including sessions that only merge once a later
  * micro-batch delivers the bridging event — and append mode must emit
  * each closed session exactly once.
  */
class StreamingSessionizeSpec extends SparkSpec {

  import spark.implicits._

  private def batchSessions(ev: DataFrame, gap: Long): Set[(Long, Long, Long, Long, Double)] =
    Sessions.sessionStats(
      Sessions.sessionize(ev, "user_id", "ts", "event_id", gap),
      "user_id", "ts", "value")
      .select("user_id", "n_events", "start_us", "end_us", "value_sum")
      .as[(Long, Long, Long, Long, Double)].collect().toSet

  private def streamSessions(stage: String, schema: org.apache.spark.sql.types.StructType,
      gap: Long): Set[(Long, Long, Long, Long, Double)] = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val agg = StreamingSessionize.sessionStats(stream, "user_id", "ts", "value", gap)
    val name = s"stream_sessions_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .select("user_id", "n_events", "start_us", "end_us", "value_sum")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
  }

  test("streaming sessions equal batch sessions on the events table") {
    val ev = sources.ParquetTables.readTable(spark, sf("sf0.001"), "events")
      .select("event_id", "ts", "user_id", "value")
    val stage = Files.createTempDirectory("graft-sess-src").toString
    // two micro-batches split by parity: session fragments must merge
    // across batches in the session-window state store
    ev.filter(col("event_id") % 2 === 0).write.mode("append").parquet(stage)
    ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(stage)

    val gap = 86400L
    assert(streamSessions(stage, ev.schema, gap) == batchSessions(ev, gap))
  }

  test("gap boundary: an event at exactly the gap stays in-session (batch parity)") {
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 7L, 1.0),
      (2L, Timestamp.valueOf("2024-01-01 01:00:00"), 7L, 1.0), // == gap: same session
      (3L, Timestamp.valueOf("2024-01-01 02:00:01"), 7L, 1.0)) // > gap: new session
    val ev = rows.toDF("event_id", "ts", "user_id", "value")
    val stage = Files.createTempDirectory("graft-sess-edge").toString
    ev.write.mode("append").parquet(stage)

    val gap = 3600L
    val streamed = streamSessions(stage, ev.schema, gap)
    assert(streamed == batchSessions(ev, gap))
    assert(streamed.map(_._2).toSeq.sorted == Seq(1L, 2L),
      "expected one 2-event session and one singleton")
  }

  test("append mode emits each watermark-closed session exactly once") {
    val ev = sources.ParquetTables.readTable(spark, sf("sf0.001"), "events")
      .select("event_id", "ts", "user_id", "value")
    val stage = Files.createTempDirectory("graft-sess-append").toString
    ev.filter(col("event_id") % 2 === 0).write.mode("append").parquet(stage)
    ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(stage)

    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    // tight watermark: everything except the stream tail finalizes
    val agg = StreamingSessionize.sessionStats(stream, "user_id", "ts", "value",
      gapSeconds = 86400L, watermark = "1 minute")
    val q = agg.writeStream.format("memory").queryName("stream_sessions_append")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()

    val emitted = spark.table("stream_sessions_append")
      .select("user_id", "start_us").as[(Long, Long)].collect().toSeq
    assert(emitted.nonEmpty, "append mode must emit finalized sessions")
    assert(emitted.distinct.size == emitted.size, "no session may be emitted twice")
    // every emitted session is a real batch session
    val batch = batchSessions(ev, 86400L).map(s => (s._1, s._3))
    assert(emitted.toSet.subsetOf(batch), "emitted sessions must match batch sessions")
  }
}
