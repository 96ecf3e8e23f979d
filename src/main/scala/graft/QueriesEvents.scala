package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sessions

/** Event-stream gate queries: sessionization and as-of attribution over
  * the events table, with ANSI-window DuckDB oracles that mirror the
  * Spark construction clause-for-clause (same tie-breaks, same micros
  * arithmetic).
  */
object QueriesEvents {

  private def events(s: SparkSession, dir: String): DataFrame =
    sources.ParquetTables.readTable(s, dir, "events")

  // ================================================================ sessionization
  /** Gap-based sessions (1-day gap) summarized per (user, session):
    * count, span in epoch micros, decimal-stable value sum. One shuffle
    * total — the session window and the summary aggregation share the
    * user-hash partitioning (SessionsSpec pins the single exchange). */
  def eventsSessionize(s: SparkSession, dir: String): DataFrame =
    Sessions.sessionStats(
      Sessions.sessionize(events(s, dir), "user_id", "ts", "event_id", gapSeconds = 86400L),
      "user_id", "ts", "value")

  lazy val eventsSessionizeSql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, ts, event_id, value,
       |         CASE WHEN lag(ts) OVER w IS NULL THEN 1
       |              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 86400000000 THEN 1
       |              ELSE 0 END AS is_new
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), assigned AS (
       |  SELECT user_id, ts, value,
       |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
       |  FROM flagged
       |)
       |SELECT user_id, session_seq,
       |       count(*) AS n_events,
       |       min(epoch_us(ts)) AS start_us,
       |       max(epoch_us(ts)) AS end_us,
       |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
       |FROM assigned
       |GROUP BY 1, 2
       |""".stripMargin

  // ================================================================ as-of join
  /** As-of attribution: every purchase event picks up the value and id
    * of the user's most recent at-or-before signup event (null when the
    * purchase precedes any signup). Exercises the union + running
    * last(ignoreNulls) construction — one shuffle on user_id, no
    * inequality join. */
  def eventsAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    Sessions.asofJoin(
      left  = ev.filter(col("event_type") === "purchase"),
      right = ev.filter(col("event_type") === "signup"),
      keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
      valueCols = Seq("value", "event_id"))
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("asof_value"), col("asof_event_id"))
  }

  lazy val eventsAsofJoinSql: String =
    s"""WITH u AS (
       |  SELECT user_id, ts, 0 AS tag, event_id,
       |         value AS r_value, event_id AS r_event_id
       |  FROM events WHERE event_type = 'signup'
       |  UNION ALL
       |  SELECT user_id, ts, 1 AS tag, event_id,
       |         NULL AS r_value, NULL AS r_event_id
       |  FROM events WHERE event_type = 'purchase'
       |), a AS (
       |  SELECT user_id, ts, tag, event_id,
       |         last_value(r_value IGNORE NULLS) OVER w AS asof_value,
       |         last_value(r_event_id IGNORE NULLS) OVER w AS asof_event_id
       |  FROM u
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag, event_id
       |               ROWS UNBOUNDED PRECEDING)
       |)
       |SELECT event_id, user_id, epoch_us(ts) AS ts_us, asof_value, asof_event_id
       |FROM a WHERE tag = 1
       |""".stripMargin
}
