package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.operators.Funnel

/** Ordered-funnel and cohort-retention semantics: strict stage
  * ordering, abandonment nulls, counts, cohort assignment, and the
  * reuse of the entity-hash partitioning across stages.
  */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  test("gap-fill: contiguous day spine, full cross product, explicit zeros") {
    // day 19724 has only type 'a' events; day 19725 has NO events at
    // all; day 19726 has only 'b' — the scaffold must still carry all
    // 3 days x 2 types with zeros where nothing happened
    val df = ev(
      (1L, "2024-01-02 10:00:00", "a"),
      (2L, "2024-01-02 11:00:00", "a"),
      (3L, "2024-01-04 09:00:00", "b"))
    val out = graft.operators.Temporal.gapFillDaily(df, "ts", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out.size == 6, s"expected 3 days x 2 types, got ${out.keys}")
    val days = out.keys.map(_._1).toSeq.sorted.distinct
    assert(days.last - days.head == 2 && days.length == 3, "spine must be gapless")
    assert(out((days.head, "a")) == 2L && out((days.head, "b")) == 0L)
    assert(out((days(1), "a")) == 0L && out((days(1), "b")) == 0L) // empty day materialized
    assert(out((days.last, "b")) == 1L && out((days.last, "a")) == 0L)
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*): DataFrame =
    rows.toSeq
      .map { case (u, t, ty) => (u, ts(t), ty) }
      .toDF("user_id", "ts", "event_type")

  test("funnel: strict order — a click BEFORE the first view does not count") {
    val events = ev(
      (1L, "2024-01-01 00:00:00", "click"), // pre-view click: ignored
      (1L, "2024-01-01 01:00:00", "view"),
      (1L, "2024-01-01 02:00:00", "click"),
      (1L, "2024-01-01 03:00:00", "purchase"),
      (2L, "2024-01-01 00:00:00", "view"),  // abandons after view
      (3L, "2024-01-01 00:00:00", "purchase")) // never views: absent
    val got = Funnel.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .select("user_id", "ts_1", "ts_2", "ts_3")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((1L, Some(ts("2024-01-01 01:00:00")),
      Some(ts("2024-01-01 02:00:00")), Some(ts("2024-01-01 03:00:00")))))
    assert(got(2L) == ((2L, Some(ts("2024-01-01 00:00:00")), None, None)))
  }

  test("funnel: a null-timestamp event is ignored, not an NPE") {
    val events = Seq(
      (1L, Some(ts("2024-01-01 00:00:00")), "view"),
      (1L, None: Option[Timestamp], "click"), // null ts: cannot order, dropped
      (1L, Some(ts("2024-01-01 02:00:00")), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.funnel(events, "user_id", "ts", "event_type", Seq("view", "click"))
      .select("ts_2").as[Option[Timestamp]].collect().head
    assert(got == Some(ts("2024-01-01 02:00:00")))
  }

  test("funnel: same-instant events do NOT advance the stage (strictly after)") {
    val events = ev(
      (1L, "2024-01-01 00:00:00", "view"),
      (1L, "2024-01-01 00:00:00", "click")) // not strictly after the view
    val got = Funnel.funnel(events, "user_id", "ts", "event_type", Seq("view", "click"))
      .select("ts_2").as[Option[Timestamp]].collect().head
    assert(got.isEmpty)
  }

  test("funnelCounts: monotone stage counts in stage order") {
    val events = ev(
      (1L, "2024-01-01 00:00:00", "view"),
      (1L, "2024-01-01 01:00:00", "click"),
      (2L, "2024-01-01 00:00:00", "view"),
      (3L, "2024-01-01 00:00:00", "view"),
      (3L, "2024-01-01 01:00:00", "click"),
      (3L, "2024-01-01 02:00:00", "purchase"))
    val got = Funnel.funnelCounts(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .select("stage", "stage_name", "n_entities")
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnel rejects duplicate stages") {
    val events = ev((1L, "2024-01-01 00:00:00", "view"))
    intercept[IllegalArgumentException](
      Funnel.funnel(events, "user_id", "ts", "event_type", Seq("view", "view")))
    intercept[IllegalArgumentException](
      Funnel.funnel(events, "user_id", "ts", "event_type", Nil))
  }

  test("retention: cohort by first period, offsets count active entities") {
    val day = 86400L
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"), // cohort day D
      (1L, "2024-01-02 10:00:00", "view"), // D+1
      (1L, "2024-01-02 11:00:00", "view"), // same period: counted once
      (2L, "2024-01-01 23:00:00", "view"), // cohort D
      (3L, "2024-01-02 00:00:00", "view")) // cohort D+1
    val d0 = ts("2024-01-01 00:00:00").getTime / 1000 / day
    val got = Funnel.retention(events, "user_id", "ts", day)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (d0, 0L, 2L),     // users 1,2 active in their cohort period
      (d0, 1L, 1L),     // user 1 returns next day
      (d0 + 1, 0L, 1L))) // user 3's own cohort
  }

  test("funnel is one scan + one shuffle; the stage filter pushes to the scan") {
    val events = sources.ParquetTables.readTable(spark, sf("sf0.001"), "events")
    val f = Funnel.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
    val plan = f.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected ONE exchange (the entity shuffle), got $exchanges:\n$plan")
    assert("FileScan".r.findAllIn(plan).size == 1, s"expected ONE event scan:\n$plan")
    assert(plan.contains("In(event_type"), s"stage filter must push to the scan:\n$plan")
  }

  test("retention is one scan + two shuffles (no cohort join)") {
    val events = sources.ParquetTables.readTable(spark, sf("sf0.001"), "events")
    val plan = Funnel.retention(events, "user_id", "ts", 604800L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges (entity agg, cell agg), got $exchanges:\n$plan")
    assert("FileScan".r.findAllIn(plan).size == 1, s"expected ONE event scan:\n$plan")
    assert(!plan.contains("Join"), s"cohorting must not join:\n$plan")
  }

  // ------------------------------------------------------------ multi-touch attribution

  private def evId(rows: (Long, Long, String, String)*): DataFrame =
    rows.toSeq
      .map { case (id, u, t, ty) => (id, u, ts(t), ty) }
      .toDF("event_id", "user_id", "ts", "event_type")

  private def attr(events: DataFrame, lookbackSec: Long = 3600L): Map[String, (Long, Long, Long, Long, Long)] =
    Funnel.attribution(events, "user_id", "ts", "event_id", "event_type",
      "purchase", Seq("view", "click"), lookbackSec)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

  test("attribution: linear splits by integer div, first/last to the boundary touches") {
    val events = evId(
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (2L, 1L, "2024-01-01 10:10:00", "click"),
      (3L, 1L, "2024-01-01 10:20:00", "view"),
      (4L, 1L, "2024-01-01 10:30:00", "purchase"))
    val out = attr(events)
    // 3 touches: each gets 1000000 div 3 = 333333 linear; first=view(1), last=view(3)
    assert(out("view") == ((2L, 1L, 1000000L, 1000000L, 666666L)))
    assert(out("click") == ((1L, 1L, 0L, 0L, 333333L)))
  }

  test("attribution: lookback boundary inclusive; outside-window touches drop") {
    val events = evId(
      (1L, 1L, "2024-01-01 09:00:00", "view"),  // exactly 3600s before -> IN
      (2L, 1L, "2024-01-01 08:59:59", "click"), // 1s too old -> OUT
      (3L, 1L, "2024-01-01 10:00:00", "purchase"))
    val out = attr(events)
    assert(out("view") == ((1L, 1L, 1000000L, 1000000L, 1000000L)))
    assert(!out.contains("click"))
  }

  test("attribution: two conversions share a touch; a purchase can touch a later purchase if listed") {
    val events = evId(
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (2L, 1L, "2024-01-01 10:10:00", "purchase"),
      (3L, 1L, "2024-01-01 10:20:00", "purchase"))
    val out = attr(events)
    // the view touches BOTH purchases (within lookback of each); the
    // purchase type is not in touchTypes so conversion 2 never credits
    // purchase 1
    assert(out("view") == ((2L, 2L, 2000000L, 2000000L, 2000000L)))
    assert(out.size == 1)
  }

  test("attribution: simultaneous touch and conversion — self excluded, other events at same ts count") {
    val events = evId(
      (1L, 1L, "2024-01-01 10:00:00", "view"),     // same ts as the purchase, different id
      (2L, 1L, "2024-01-01 10:00:00", "purchase"))
    val out = attr(events)
    assert(out("view") == ((1L, 1L, 1000000L, 1000000L, 1000000L)))
  }

  test("attribution: touches never cross users") {
    val events = evId(
      (1L, 1L, "2024-01-01 09:59:00", "view"),
      (2L, 2L, "2024-01-01 10:00:00", "purchase"))
    assert(attr(events).isEmpty)
  }

  // ------------------------------------------------------------ walk form + skew guard

  private def attrWalk(events: DataFrame, lookbackSec: Long = 3600L): Map[String, (Long, Long, Long, Long, Long)] =
    Funnel.attributionWalk(events, "user_id", "ts", "event_id", "event_type",
      "purchase", Seq("view", "click"), lookbackSec)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

  test("attributionWalk matches the join form on every fixture shape, incl. a dense random mix") {
    val fixtures = Seq(
      evId(
        (1L, 1L, "2024-01-01 10:00:00", "view"),
        (2L, 1L, "2024-01-01 10:10:00", "click"),
        (3L, 1L, "2024-01-01 10:20:00", "view"),
        (4L, 1L, "2024-01-01 10:30:00", "purchase")),
      evId(
        (1L, 1L, "2024-01-01 09:00:00", "view"),
        (2L, 1L, "2024-01-01 08:59:59", "click"),
        (3L, 1L, "2024-01-01 10:00:00", "purchase")),
      evId(
        (1L, 1L, "2024-01-01 10:00:00", "view"),
        (2L, 1L, "2024-01-01 10:00:00", "purchase")),
      // dense deterministic mix: 5 users x 60 events, repeated
      // timestamps, conversions interleaved with expiring touches
      evId((1L to 300L).map { i =>
        val u = i % 5
        val minute = (i * 7) % 180
        val ty = (i % 4) match {
          case 0 => "purchase"; case 1 => "view"; case 2 => "click"; case _ => "view"
        }
        (i, u, f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00", ty)
      }: _*)
    )
    fixtures.foreach { f => assert(attrWalk(f) === attr(f)) }
    // and with a lookback short enough that the walk's eviction runs
    assert(attrWalk(fixtures.last, 600L) === attr(fixtures.last, 600L))
  }

  test("attributionWalk plan: no join, one entity exchange + the tiny per-type agg") {
    val f = evId(
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (2L, 1L, "2024-01-01 10:30:00", "purchase"))
    val plan = Funnel.attributionWalk(f, "user_id", "ts", "event_id", "event_type",
      "purchase", Seq("view", "click"), 3600L).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"walk must not join:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges (entity repartition, per-type agg), got $exchanges:\n$plan")
  }

  test("attributionWalk rejects a conversion type that is also a touch type") {
    val f = evId((1L, 1L, "2024-01-01 10:00:00", "view"))
    val ex = intercept[IllegalArgumentException] {
      Funnel.attributionWalk(f, "user_id", "ts", "event_id", "event_type",
        "purchase", Seq("view", "purchase"), 3600L)
    }
    assert(ex.getMessage.contains("join path"))
  }

  test("attribution skew guard: a hot entity raises in-plan; the bound is per-entity") {
    // hot user 1: 5 conversions x 4 touches = 20 pairs; quiet user 2: 1 x 1
    val hot = evId(
      ((1L to 4L).map(i => (i, 1L, f"2024-01-01 10:0$i%01d:00", "view")) ++
        (5L to 9L).map(i => (i, 1L, f"2024-01-01 10:1${i - 5}%01d:00", "purchase")) ++
        Seq((10L, 2L, "2024-01-01 10:00:00", "view"),
            (11L, 2L, "2024-01-01 10:05:00", "purchase"))): _*)
    val ex = intercept[Exception] {
      Funnel.attribution(hot, "user_id", "ts", "event_id", "event_type",
        "purchase", Seq("view", "click"), 3600L, maxPairsPerEntity = 19L).collect()
    }
    def msg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msg(ex).contains("maxPairsPerEntity=19"), s"unexpected failure: ${msg(ex)}")
    // bound at exactly the hot entity's pair count: passes, and the
    // guarded result equals the walk's (guard is a pure pass-through)
    val guarded = Funnel.attribution(hot, "user_id", "ts", "event_id", "event_type",
      "purchase", Seq("view", "click"), 3600L, maxPairsPerEntity = 20L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(guarded === attrWalk(hot))
  }
}
