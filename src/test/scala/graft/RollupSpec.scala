package graft

import org.apache.spark.sql.functions._

import graft.exec.Rollup
import graft.model.{TimeUnit, TimeWindow}

/** Roll-up re-aggregability including the sketch column: merging the
  * minute-grain register sketches must give byte-identical registers to
  * building the sketch at hour grain directly (merge-max is
  * associative). */
class RollupSpec extends SparkSpec {
  import Fixtures._

  test("rolled-up sketches equal directly-built hour sketches") {
    val s   = spark
    val dir = sf("sf0.001")
    val ev  = sources.ParquetTables.readTable(s, dir, "events")

    val fact = eventsEnv.findFact("event").get
    val dim = graft.exec.DimPopulate.full(
      eventsEnv, fact, "dim_event_type", ev, TimeWindow.unbounded)
    val minuteGrain = graft.exec.FactPopulate.populate(
      eventsEnv, fact, TimeWindow.unbounded, _ => ev, _ => dim)
    val rolled = Rollup.toCoarser(eventsEnv, fact, minuteGrain, TimeUnit.Hour)

    val hourEnv = model.Validator.validateEnv(
      eventsTables, eventsFacts, eventsSettings.copy(timeUnit = TimeUnit.Hour),
      testTypeDefaults).toOption.get
    val hourFact = hourEnv.findFact("event").get
    val hourDim = graft.exec.DimPopulate.full(
      hourEnv, hourFact, "dim_event_type", ev, TimeWindow.unbounded)
    val direct = graft.exec.FactPopulate.populate(
      hourEnv, hourFact, TimeWindow.unbounded, _ => ev, _ => hourDim)

    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select(col("ts_hour_id"), col("user_id"), col("event_type_id"), col("user_count"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getInt(2)), r.getMap[Int, Int](3).toMap))
      .toMap
    val a = keyed(rolled)
    val b = keyed(direct)
    assert(a.keySet == b.keySet)
    assert(a.forall { case (k, m) => b(k) == m })
  }

  test("mergeIncremental(rollup(a), rollup(b)) == rollup(a ∪ b), sketches included") {
    val s   = spark
    val dir = sf("sf0.001")
    val ev  = sources.ParquetTables.readTable(s, dir, "events")

    val fact = eventsEnv.findFact("event").get
    val dim = graft.exec.DimPopulate.full(
      eventsEnv, fact, "dim_event_type", ev, TimeWindow.unbounded)
    def rolledOver(rows: org.apache.spark.sql.DataFrame) =
      Rollup.toCoarser(eventsEnv, fact,
        graft.exec.FactPopulate.populate(
          eventsEnv, fact, TimeWindow.unbounded, _ => rows, _ => dim),
        TimeUnit.Hour)

    // split mid-stream so some hour buckets exist in BOTH halves
    // (merged) and some in exactly one (passthrough)
    val cut   = ev.selectExpr("percentile_approx(ts, 0.5)").head.getTimestamp(0)
    val prior = rolledOver(ev.filter(col("ts") < lit(cut)))
    val delta = rolledOver(ev.filter(col("ts") >= lit(cut)))
    val full  = rolledOver(ev)

    val merged = Rollup.mergeIncremental(eventsEnv, fact, prior, delta, TimeUnit.Hour)
    assert(merged.schema == full.schema) // overflow-guarded casts keep declared types

    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      ((r.getLong(r.fieldIndex("ts_hour_id")), r.getLong(r.fieldIndex("user_id")),
        r.getInt(r.fieldIndex("event_type_id"))),
       (r.getInt(r.fieldIndex("event_count")),
        r.getMap[Int, Int](r.fieldIndex("user_count")).toMap,
        Option(r.getDecimal(r.fieldIndex("value_sum")))))
    }.toMap
    val a = keyed(merged)
    val b = keyed(full)
    assert(a.keySet == b.keySet)
    assert(a.forall { case (k, v) => b(k) == v })
    // the split actually exercised both paths
    val priorKeys = prior.select("ts_hour_id").distinct().collect().map(_.getLong(0)).toSet
    val deltaKeys = delta.select("ts_hour_id").distinct().collect().map(_.getLong(0)).toSet
    assert((priorKeys intersect deltaKeys).nonEmpty, "no bucket spans the split")
    assert((priorKeys diff deltaKeys).nonEmpty, "no untouched passthrough bucket")
  }

  test("mergeIncremental never shuffles the maintained table (broadcast anti/semi)") {
    val s   = spark
    val dir = sf("sf0.001")
    val ev  = sources.ParquetTables.readTable(s, dir, "events")
    val fact = eventsEnv.findFact("event").get
    val dim = graft.exec.DimPopulate.full(
      eventsEnv, fact, "dim_event_type", ev, TimeWindow.unbounded)
    def rolledOver(rows: org.apache.spark.sql.DataFrame) =
      Rollup.toCoarser(eventsEnv, fact,
        graft.exec.FactPopulate.populate(
          eventsEnv, fact, TimeWindow.unbounded, _ => rows, _ => dim),
        TimeUnit.Hour)
    val cut    = ev.selectExpr("percentile_approx(ts, 0.5)").head.getTimestamp(0)
    val merged = Rollup.mergeIncremental(
      eventsEnv, fact,
      rolledOver(ev.filter(col("ts") < lit(cut))),
      rolledOver(ev.filter(col("ts") >= lit(cut))), TimeUnit.Hour)
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    // the prior side joins the delta's key set without an exchange of
    // its own rows: both prior probes must be broadcast joins
    val broadcastJoins = "BroadcastHashJoin.*Left(Anti|Semi)".r
      .findAllIn(plan).size
    assert(broadcastJoins >= 2, s"expected broadcast anti+semi probes, plan:\n$plan")
  }

  test("rollup fails loudly when a count overflows its stored integer type") {
    val s   = spark
    val dir = sf("sf0.001")
    val ev  = sources.ParquetTables.readTable(s, dir, "events")

    val fact = eventsEnv.findFact("event").get
    val dim = graft.exec.DimPopulate.full(
      eventsEnv, fact, "dim_event_type", ev, TimeWindow.unbounded)
    val minuteGrain = graft.exec.FactPopulate.populate(
      eventsEnv, fact, TimeWindow.unbounded, _ => ev, _ => dim)
    // inflate the stored count so the hour roll-up sum exceeds 2^31
    val inflated = minuteGrain.withColumn(
      "event_count", lit(Int.MaxValue - 10).cast("int"))
    val ex = intercept[Exception] {
      Rollup.toCoarser(eventsEnv, fact, inflated, TimeUnit.Hour).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("rollup count overflow")))

    // narrow DECIMAL counts get the same fail-loud guard (a plain cast
    // of the widened sum would NULL in non-ANSI sessions)
    val decimalCounts = minuteGrain.withColumn(
      "event_count", lit(BigDecimal(99999)).cast("decimal(5,0)"))
    val ex2 = intercept[Exception] {
      Rollup.toCoarser(eventsEnv, fact, decimalCounts, TimeUnit.Hour).collect()
    }
    assert(messages(ex2).exists(_.contains("rollup count overflow")))
    // and a non-overflowing decimal count rolls up cleanly
    val small = minuteGrain.withColumn("event_count", lit(BigDecimal(1)).cast("decimal(5,0)"))
    Rollup.toCoarser(eventsEnv, fact, small, TimeUnit.Hour).collect()
  }
}
