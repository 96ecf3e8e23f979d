package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Sessions

/** Sessionization + as-of join: gap semantics, tie determinism, null
  * right values, and the single-exchange plan shape both operators
  * promise (the window and the downstream per-session aggregation share
  * the entity-hash partitioning).
  */
class SessionsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, Long, Double)*): DataFrame =
    rows.toSeq
      .map { case (id, t, u, v) => (id, ts(t), u, v) }
      .toDF("event_id", "ts", "user_id", "value")

  test("sessionize: gap boundary is strict (> gap starts a session, == gap does not)") {
    val events = ev(
      (1L, "2024-01-01 00:00:00", 7L, 1.0),
      (2L, "2024-01-01 00:10:00", 7L, 1.0), // 600s later
      (3L, "2024-01-01 00:20:00", 7L, 1.0), // exactly gap later
      (4L, "2024-01-01 01:20:01", 7L, 1.0), // gap + 1s -> new session
      (5L, "2024-01-01 01:20:30", 7L, 1.0))
    val got = Sessions.sessionize(events, "user_id", "ts", "event_id", gapSeconds = 3600)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L))
  }

  test("sessionize: entities are independent; equal timestamps share a session") {
    val events = ev(
      (1L, "2024-01-01 00:00:00", 1L, 1.0),
      (2L, "2024-01-01 00:00:00", 1L, 1.0), // same instant, tie on event_id
      (3L, "2024-01-01 00:00:00", 2L, 1.0), // other user starts at 1
      (4L, "2024-01-02 00:00:00", 1L, 1.0))
    val got = Sessions.sessionize(events, "user_id", "ts", "event_id", gapSeconds = 60)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("sessionStats matches a hand computation and adds no second exchange") {
    val events = ev(
      (1L, "2024-01-01 00:00:00", 7L, 1.5),
      (2L, "2024-01-01 00:30:00", 7L, 2.5),
      (3L, "2024-01-01 05:00:00", 7L, 4.0))
    val stats = Sessions.sessionStats(
      Sessions.sessionize(events, "user_id", "ts", "event_id", gapSeconds = 3600),
      "user_id", "ts", "value")
    val rows = stats.orderBy("session_seq")
      .select("session_seq", "n_events", "start_us", "end_us", "value_sum")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val base = ts("2024-01-01 00:00:00").getTime * 1000L
    assert(rows == Seq(
      (1L, 2L, base, base + 1800L * 1000000L, 4.0),
      (2L, 1L, base + 18000L * 1000000L, base + 18000L * 1000000L, 4.0)))

    // ONE exchange total: the window's hash partition on user_id also
    // satisfies the (user_id, session_seq) aggregation's distribution
    val plan = stats.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected a single exchange, got $exchanges:\n$plan")
  }

  test("asofJoin: at-or-before semantics, tie-breaks, and null right values") {
    val left = ev(
      (10L, "2024-01-01 00:00:00", 1L, 0.0), // before any right row -> null
      (11L, "2024-01-01 01:00:00", 1L, 0.0), // equal-ts right row attaches
      (12L, "2024-01-01 01:40:00", 1L, 0.0), // two right rows at same ts: later event_id wins
      (14L, "2024-01-01 02:00:00", 1L, 0.0), // latest right row carries null -> attaches null (row-atomic)
      (13L, "2024-01-01 03:00:00", 2L, 0.0)) // other key: only its own right rows
    val right = Seq(
      (100L, ts("2024-01-01 01:00:00"), 1L, java.lang.Double.valueOf(1.0)),
      (101L, ts("2024-01-01 01:30:00"), 1L, java.lang.Double.valueOf(2.0)),
      (102L, ts("2024-01-01 01:30:00"), 1L, java.lang.Double.valueOf(3.0)),
      // null value right row: row-atomic attribution attaches this row's
      // null rather than reaching back to 102 (pandas merge_asof semantics)
      (103L, ts("2024-01-01 01:45:00"), 1L, null.asInstanceOf[java.lang.Double]),
      (104L, ts("2024-01-01 02:59:00"), 2L, java.lang.Double.valueOf(9.0)))
      .toDF("event_id", "ts", "user_id", "value")
    val got = Sessions.asofJoin(left, right, "user_id", "ts", "event_id",
      Seq("value", "event_id"))
      .select(col("event_id"), col("asof_value"), col("asof_event_id"))
      .as[(Long, Option[Double], Option[Long])].collect()
      .map { case (id, v, rid) => id -> ((v, rid)) }.toMap
    assert(got == Map(
      10L -> ((None, None)),
      11L -> ((Some(1.0), Some(100L))),
      12L -> ((Some(3.0), Some(102L))), // ts 01:30 tie: event_id 102 sorts after 101
      14L -> ((None, Some(103L))),      // 103's null value travels WITH its event_id
      13L -> ((Some(9.0), Some(104L)))))
  }

  test("debounce: a same-type storm collapses to its first event; boundaries reopen runs") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00.0"), 7L, "click"), // run 1 opens -> kept
      (2L, ts("2024-01-01 00:00:03.0"), 7L, "click"), // 3s later, same type -> dropped
      (3L, ts("2024-01-01 00:00:06.0"), 7L, "click"), // 3s after RAW predecessor -> still the same run, dropped
      (4L, ts("2024-01-01 00:00:08.0"), 7L, "view"),  // type change -> kept
      (5L, ts("2024-01-01 00:00:09.0"), 7L, "click"), // type change back -> kept (new run)
      (6L, ts("2024-01-01 00:00:15.0"), 7L, "click"), // 6s gap > 5s window -> kept
      (7L, ts("2024-01-01 00:00:03.0"), 8L, "click")) // other user: own first event, kept
      .toDF("event_id", "ts", "user_id", "event_type")
    val kept = Sessions.debounce(events, "user_id", "ts", "event_id", "event_type",
      windowMicros = 5000000L)
      .select("event_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L, 6L, 7L))
  }

  test("debounce and paths are one entity exchange each") {
    val d = QueriesEvents.eventsDebounce(spark, sf("sf0.001"))
    val dPlan = d.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(dPlan).size == 1,
      s"debounce must be one entity shuffle:\n$dPlan")
    val p = QueriesEvents.eventsPaths(spark, sf("sf0.001"))
    val pPlan = p.queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(pPlan).size == 1, s"paths must scan events once:\n$pPlan")
    assert(pPlan.contains("TakeOrderedAndProject"),
      s"the top-k must be a bounded heap, not a single-partition rank window:\n$pPlan")
  }

  test("debounce is idempotent: adjacent same-type survivors are provably > window apart") {
    // if two adjacent survivors shared a type within the window, the
    // second could only have opened a run via a type change against its
    // raw predecessor — contradiction — so a second pass drops nothing
    val ev = sources.ParquetTables.readTable(spark, sf("sf0.001"), "events")
    val win = 12L * 3600L * 1000000L // wide enough that this sparse data actually debounces
    val once = Sessions.debounce(ev, "user_id", "ts", "event_id", "event_type", win)
    val twice = Sessions.debounce(once, "user_id", "ts", "event_id", "event_type", win)
    assert(once.count() == twice.count(), "debounce must be idempotent")
    assert(once.count() < ev.count(), "the window must actually suppress events")
  }

  test("anomaly scoring is two exchanges (daily rollup + per-type day window)") {
    val plan = QueriesEvents.eventsAnomaly(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected daily-agg + type-window exchanges, got $exchanges:\n$plan")
    assert("FileScan".r.findAllIn(plan).size == 1, s"expected ONE event scan:\n$plan")
  }

  test("asofJoin tolerance: stale attributions expire to all-null, row-atomically") {
    val left = ev(
      (10L, "2024-01-01 00:30:00", 1L, 0.0), // 30 min after signup: within 1h tolerance
      (11L, "2024-01-01 01:00:00", 1L, 0.0), // exactly tolerance: still attached (<=)
      (12L, "2024-01-01 01:00:01", 1L, 0.0)) // tolerance + 1s: expired
    val right = ev((100L, "2024-01-01 00:00:00", 1L, 5.0))
    val got = Sessions.asofJoin(left, right, "user_id", "ts", "event_id",
      Seq("value", "event_id"), toleranceMicros = Some(3600L * 1000000L))
      .select(col("event_id"), col("asof_value"), col("asof_event_id"))
      .as[(Long, Option[Double], Option[Long])].collect()
      .map { case (id, v, rid) => id -> ((v, rid)) }.toMap
    assert(got == Map(
      10L -> ((Some(5.0), Some(100L))),
      11L -> ((Some(5.0), Some(100L))),
      12L -> ((None, None)))) // BOTH fields expire together
  }

  test("asofJoin: attaches multiple value columns and keeps left payload") {
    val left  = ev((10L, "2024-01-01 02:00:00", 1L, 42.0))
    val right = ev((100L, "2024-01-01 01:00:00", 1L, 5.0))
    val row = Sessions.asofJoin(left, right, "user_id", "ts", "event_id",
      Seq("value", "event_id")).collect().head
    assert(row.getAs[Double]("value") == 42.0, "left payload must survive")
    assert(row.getAs[Double]("asof_value") == 5.0)
    assert(row.getAs[Long]("asof_event_id") == 100L)
  }

  test("grouped top-k plans a WindowGroupLimit (bounded per-group state pre-shuffle)") {
    val plan = QueriesEvents.eventsTopk(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k must rewrite to WindowGroupLimit:\n$plan")
    // partial mode runs BELOW the exchange (printed after it): the
    // shuffle moves at most k rows per (task, group), not the stream
    assert("WindowGroupLimit".r.findAllIn(plan).size == 2,
      s"expected partial + final WindowGroupLimit:\n$plan")
    assert(plan.lastIndexOf("WindowGroupLimit") > plan.indexOf("Exchange"),
      s"expected the partial WindowGroupLimit below the exchange:\n$plan")
  }

  test("asofJoin plans one exchange (union + window, no inequality join)") {
    val events = sources.ParquetTables.readTable(spark, sf("sf0.001"), "events")
    val joined = Sessions.asofJoin(
      events.filter(col("event_type") === "purchase"),
      events.filter(col("event_type") === "signup"),
      "user_id", "ts", "event_id", Seq("value"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected a single exchange, got $exchanges:\n$plan")
  }

  // ------------------------------------------------------------ forward as-of

  test("asofJoinForward: earliest at-or-after row wins, inclusive at equal ts, nulls when none follow") {
    import spark.implicits._
    val left = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1L),
      (11L, ts("2024-01-01 12:00:00"), 1L),
      (12L, ts("2024-01-01 09:00:00"), 2L))
      .toDF("event_id", "ts", "user_id")
    val right = Seq(
      (20L, ts("2024-01-01 10:00:00"), 1L, 5.0), // equal ts -> attaches (inclusive)
      (21L, ts("2024-01-01 11:00:00"), 1L, 6.0),
      (22L, ts("2024-01-01 08:00:00"), 2L, 7.0)) // strictly before -> never attaches
      .toDF("event_id", "ts", "user_id", "value")
    val out = Sessions.asofJoinForward(left, right, "user_id", "ts", "event_id", Seq("value"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Any]("next_value"))).toMap
    assert(out(10L) == Some(5.0))  // equal-ts right row, not the 11:00 one
    assert(out(11L) == None)       // nothing follows 12:00
    assert(out(12L) == None)       // 08:00 is before, never forward-attached
  }

  test("asofJoinForward: equal-timestamp right rows tie to the SMALLEST tie key") {
    import spark.implicits._
    val left  = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (31L, ts("2024-01-01 11:00:00"), 1L, 1.0),
      (30L, ts("2024-01-01 11:00:00"), 1L, 2.0))
      .toDF("event_id", "ts", "user_id", "value")
    val out = Sessions.asofJoinForward(left, right, "user_id", "ts", "event_id",
      Seq("value", "event_id")).head()
    assert(out.getAs[Long]("next_event_id") == 30L && out.getAs[Double]("next_value") == 2.0)
  }

  test("asofJoinForward: tolerance bounds the look-ahead window") {
    import spark.implicits._
    val left  = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("event_id", "ts", "user_id")
    val right = Seq((2L, ts("2024-01-01 12:00:00"), 1L, 9.0))
      .toDF("event_id", "ts", "user_id", "value")
    def run(tolSec: Long) =
      Sessions.asofJoinForward(left, right, "user_id", "ts", "event_id", Seq("value"),
        toleranceMicros = Some(tolSec * 1000000L)).head().getAs[Any]("next_value")
    assert(run(7200L) == 9.0)            // exactly 2h ahead: inclusive
    assert(Option(run(7199L)).isEmpty)   // one second short: expired
  }

  test("asofJoinForward plans one exchange (union + window, no join)") {
    val events = sources.ParquetTables.readTable(spark, sf("sf0.001"), "events")
    val joined = Sessions.asofJoinForward(
      events.filter(col("event_type") === "purchase"),
      events.filter(col("event_type") === "signup"),
      "user_id", "ts", "event_id", Seq("value"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"forward as-of must not plan a join:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1, s"expected one exchange:\n$plan")
  }

  // ------------------------------------------------------------ incremental maintenance

  private def rebuildVsIncremental(all: DataFrame, cut: String): (Set[String], Set[String]) = {
    val cutTs  = lit(cut).cast("timestamp")
    val m      = Sessions.buildSessionTable(
      all.filter(col("ts") < cutTs), "user_id", "ts", "event_id", "value", 600L)
    val inc    = Sessions.sessionizeIncremental(
      m, all.filter(col("ts") >= cutTs), "user_id", "ts", "event_id", "value", 600L)
    val full   = Sessions.buildSessionTable(all, "user_id", "ts", "event_id", "value", 600L)
    def render(t: DataFrame) = Sessions.sessionTableStats(t, "user_id")
      .collect().map(_.toString).toSet
    (render(inc), render(full))
  }

  test("sessionizeIncremental == full rebuild: merge, no-merge, fresh and absent users") {
    val all = ev(
      // user 1: corpus session ends 00:10, batch starts 00:15 (300s <= 600s gap) -> MERGE
      (1L, "2024-01-01 00:00:00", 1L, 1.0),
      (2L, "2024-01-01 00:10:00", 1L, 2.5),
      (3L, "2024-01-01 00:15:00", 1L, 0.5),
      (4L, "2024-01-01 01:00:00", 1L, 1.0), // second batch session (renumbers)
      // user 2: corpus ends 00:00, batch starts 00:30 (> gap) -> NO merge
      (5L, "2024-01-01 00:00:00", 2L, 1.0),
      (6L, "2024-01-01 00:30:00", 2L, 1.0),
      // user 3: batch-only (fresh entity)
      (7L, "2024-01-01 00:20:00", 3L, 4.0),
      // user 4: corpus-only (must pass through untouched)
      (8L, "2024-01-01 00:00:00", 4L, 2.0))
    val (inc, full) = rebuildVsIncremental(all, "2024-01-01 00:12:00")
    assert(inc == full)
  }

  test("sessionizeIncremental: boundary exactly at the gap still merges (<= semantics)") {
    val all = ev(
      (1L, "2024-01-01 00:00:00", 1L, 1.0),
      (2L, "2024-01-01 00:10:00", 1L, 1.0)) // exactly 600s -> same session
    val (inc, full) = rebuildVsIncremental(all, "2024-01-01 00:05:00")
    assert(inc == full)
    assert(inc.size == 1, s"expected one merged session, got $inc")
  }

  test("sessionizeIncremental: an all-NULL-value maintained session merges without null-poisoning") {
    val s = spark
    import s.implicits._
    // corpus session has only NULL values (sum -> NULL); the batch
    // continuation brings 2.5 — the merge must yield 2.5 (and a
    // both-NULL merge must stay NULL), matching the full rebuild
    val all = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, None),
      (2L, ts("2024-01-01 00:05:00"), 1L, Some(2.5)),
      (3L, ts("2024-01-01 00:00:00"), 2L, None),
      (4L, ts("2024-01-01 00:05:00"), 2L, None))
      .toDF("event_id", "ts", "user_id", "value")
    val cutTs = lit("2024-01-01 00:03:00").cast("timestamp")
    val m = Sessions.buildSessionTable(
      all.filter(col("ts") < cutTs), "user_id", "ts", "event_id", "value", 600L)
    val inc = Sessions.sessionTableStats(Sessions.sessionizeIncremental(
      m, all.filter(col("ts") >= cutTs), "user_id", "ts", "event_id", "value", 600L),
      "user_id").collect().map(_.toString).toSet
    val full = Sessions.sessionTableStats(Sessions.buildSessionTable(
      all, "user_id", "ts", "event_id", "value", 600L),
      "user_id").collect().map(_.toString).toSet
    assert(inc == full)
  }

  test("sessionizeIncremental: decimal value sums merge exactly (no double drift)") {
    // values chosen so double addition order matters at the last ulp
    val all = ev(
      (1L, "2024-01-01 00:00:00", 1L, 0.1),
      (2L, "2024-01-01 00:01:00", 1L, 0.2),
      (3L, "2024-01-01 00:02:00", 1L, 0.3),
      (4L, "2024-01-01 00:03:00", 1L, 0.7))
    val (inc, full) = rebuildVsIncremental(all, "2024-01-01 00:01:30")
    assert(inc == full)
  }

  test("sessionizeIncremental on real events == full rebuild at sf0.001") {
    val all = sources.ParquetTables.readTable(spark, sf("sf0.001"), "events")
    val cutTs = lit("2024-01-15 00:00:00").cast("timestamp")
    val m   = Sessions.buildSessionTable(
      all.filter(col("ts") < cutTs), "user_id", "ts", "event_id", "value", 86400L)
    val inc = Sessions.sessionizeIncremental(
      m, all.filter(col("ts") >= cutTs), "user_id", "ts", "event_id", "value", 86400L)
    val full = Sessions.buildSessionTable(all, "user_id", "ts", "event_id", "value", 86400L)
    val a = Sessions.sessionTableStats(inc, "user_id").collect().map(_.toString).toSet
    val b = Sessions.sessionTableStats(full, "user_id").collect().map(_.toString).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }
}
