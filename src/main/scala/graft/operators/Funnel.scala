package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Funnel and cohort-retention analysis over event streams — the two
  * product-analytics queries every event-fact deployment (the
  * reference's domain) runs on top of its populated facts.
  *
  * Scale design: both are ONE-PASS, ONE-SHUFFLE constructions. The
  * naive formulation (per-stage min-ts frames chained by joins) scans
  * the event table once per stage and — because Spark plans common
  * DataFrame subplans independently — recomputes every earlier stage
  * inside every later one: k stages cost O(k²) scans and 2k+ shuffles.
  * Instead, the stage walk happens inside one per-entity aggregation
  * (the ClickHouse windowFunnel shape): filter to stage events (an
  * `In` filter pushed to the scan), shuffle once on the entity, walk
  * the entity's time-sorted events greedily. Per-entity state is that
  * entity's stage-event list — the same bound as any per-entity window
  * operator; a pathological entity is bounded by its own event count,
  * never the corpus.
  */
object Funnel {

  /** Ordered-funnel timestamps: for each entity, the earliest time it
    * completed each stage IN ORDER — stage k+1 counts only STRICTLY
    * after the entity's stage-k time (standard ordered-funnel
    * semantics; the greedy walk over time-sorted events is equivalent
    * to the min-ts chain `ts_k = min ts of stage k with ts > ts_{k-1}`,
    * which the DuckDB oracle recomputes relationally). One row per
    * entity that completed stage 1; `ts_k` is null once a stage was
    * never reached (and so are all later stages, by construction).
    */
  def funnel(
      events: DataFrame, entityCol: String, tsCol: String, typeCol: String,
      stages: Seq[String]
  ): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"stages must be distinct, got $stages")
    val k = stages.length
    // stage index replaces the type string BEFORE the shuffle: ints
    // travel the wire, repeated strings don't
    val idxCol = stages.zipWithIndex.foldLeft(lit(-1)) { case (acc, (st, i)) =>
      when(col(typeCol) === st, lit(i)).otherwise(acc)
    }
    val walkUdf = udf { (evs: Seq[Row]) =>
      val sorted = evs.sortBy(_.getLong(0))
      val out    = Array.fill(k)(-1L)
      var stage  = 0
      val it     = sorted.iterator
      while (stage < k && it.hasNext) {
        val r = it.next()
        if (r.getInt(1) == stage &&
          (stage == 0 || r.getLong(0) > out(stage - 1))) {
          out(stage) = r.getLong(0)
          stage += 1
        }
      }
      out
    }
    val walked = events
      // null timestamps cannot participate in an ordered walk (and
      // unguarded they would NPE in walkUdf's getLong) — drop them,
      // like sessionize's asc_nulls_last places them out of band
      .filter(col(typeCol).isin(stages: _*) && col(tsCol).isNotNull)
      .select(col(entityCol),
        struct(unix_micros(col(tsCol)).as("us"), idxCol.as("si")).as("__e"))
      .groupBy(col(entityCol))
      .agg(walkUdf(collect_list(col("__e"))).as("__f"))
    val stageCols = stages.indices.map { i =>
      when(col("__f").getItem(i) >= 0, timestamp_micros(col("__f").getItem(i)))
        .as(s"ts_${i + 1}")
    }
    walked
      .select(col(entityCol) +: stageCols: _*)
      .filter(col("ts_1").isNotNull)
  }

  /** Funnel stage counts: how many entities reached each stage (the
    * headline conversion table). `stage` is 1-based, in input order. */
  def funnelCounts(
      events: DataFrame, entityCol: String, tsCol: String, typeCol: String,
      stages: Seq[String]
  ): DataFrame = {
    val f = funnel(events, entityCol, tsCol, typeCol, stages)
    val counts = stages.indices.map { i =>
      count(col(s"ts_${i + 1}")).as(s"n_${i + 1}")
    }
    val wide = f.agg(counts.head, counts.tail: _*)
    // unpivot to (stage, stage_name, n_entities)
    val rows = stages.zipWithIndex.map { case (name, i) =>
      struct(lit(i + 1).as("stage"), lit(name).as("stage_name"),
        col(s"n_${i + 1}").as("n_entities"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** Cohort retention: entities are cohorted by the period of their
    * first event; each (cohort, offset) cell counts entities active
    * `offset` periods after their cohort period. Periods are epoch
    * buckets of `periodSeconds` (e.g. 604800 for weekly cohorts).
    *
    * One scan, two shuffles: the per-entity period set aggregates in
    * one pass (map-side partial `collect_set`); the cohort is its min,
    * so no join back — each exploded (cohort, offset) pair is already
    * unique per entity and the final cell count is a plain count. */
  def retention(
      events: DataFrame, entityCol: String, tsCol: String, periodSeconds: Long
  ): DataFrame = {
    require(periodSeconds > 0, s"periodSeconds must be positive, got $periodSeconds")
    val period = floor(unix_timestamp(col(tsCol)) / periodSeconds).cast("long")
    events
      .select(col(entityCol), period.as("__p"))
      .groupBy(col(entityCol))
      .agg(collect_set(col("__p")).as("__ps"))
      .select(array_min(col("__ps")).as("cohort_period"),
        explode(col("__ps")).as("__period"))
      .groupBy(col("cohort_period"),
        (col("__period") - col("cohort_period")).as("period_offset"))
      .agg(count(lit(1)).as("n_entities"))
  }

  /** Multi-touch attribution: distribute credit for each conversion
    * event across the same entity's preceding touch events inside a
    * lookback window, under three standard models at once —
    * first-touch, last-touch, and linear (equal split). Output one row
    * per touch type: `n_touches` (touch rows participating in any
    * conversion), `conversions` (distinct conversions the type touched),
    * and per-model credit totals in PARTS PER MILLION of a conversion
    * (`first_ppm`, `last_ppm`, `linear_ppm`).
    *
    * Credits are exact integer arithmetic, never floats: a conversion
    * with n touches gives each `1000000 / n` ppm under the linear model
    * (integer division — the remainder is deliberately dropped rather
    * than smeared, keeping every engine bit-identical), and 1000000 to
    * the single first/last touch. First = smallest (ts, tie) among the
    * window's touches, last = largest; both total orders, so the
    * assignment is deterministic.
    *
    * Windows: a touch at `ts` attributes to a conversion at `cts` when
    * `ts <= cts` and `cts - ts <= lookback` — boundary-inclusive both
    * ends; a conversion event never touches itself (`tie` differs) but
    * a conversion TYPE may touch a later conversion if listed in
    * `touchTypes`.
    *
    * Scale shape: conversions and touches both filter at the scan
    * (pushed `In`/equality predicates), join on the ENTITY key only —
    * the pair space per entity is (its conversions × its touches in
    * window), the usual attribution bound, and the JOIN's work is
    * bounded fail-loud: `maxPairsPerEntity` pre-counts each entity's
    * TOTAL conv × touch product off one extra partial-aggregated pass
    * and raises in-plan (the [[Intervals.intervalJoin]] fail-loud cap
    * pattern) before a bot/service entity with 10⁵ events in the
    * lookback can put 10¹⁰ joined rows into a single task. Note the
    * guard deliberately counts UNWINDOWED pairs: the entity-key hash
    * join evaluates the window predicate as a residual over exactly
    * that product, so the count is the true per-task work of this
    * join shape, even when the lookback would filter most pairs. A
    * long-horizon dataset that trips it isn't wrong — it is paying
    * quadratic work for a windowed answer; use [[attributionWalk]]
    * (linear, no pair space at all — the preferred shape whenever the
    * conversion type is not itself a touch type) or raise the bound
    * knowingly. */
  def attribution(
      events: DataFrame, entityCol: String, tsCol: String, tieCol: String,
      typeCol: String, conversionType: String, touchTypes: Seq[String],
      lookbackSeconds: Long, maxPairsPerEntity: Long = 100000000L
  ): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs at least one touch type")
    require(touchTypes.distinct == touchTypes,
      s"touchTypes must be distinct (a duplicate double-counts its pairs), got $touchTypes")
    require(lookbackSeconds > 0, s"lookbackSeconds must be positive, got $lookbackSeconds")
    require(maxPairsPerEntity > 0,
      s"maxPairsPerEntity must be positive, got $maxPairsPerEntity")
    val lookbackMicros = lookbackSeconds * 1000000L
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(entityCol), unix_micros(col(tsCol)).as("__cts"),
        col(tieCol).as("__ctie"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(entityCol), unix_micros(col(tsCol)).as("__tts"),
        col(tieCol).as("__ttie"), col(typeCol).as("__ttype"))
    // fail-loud skew guard: one partial-aggregated pass over the
    // already-filtered event types counts each entity's conv and touch
    // rows; the raise lives in-plan (no driver pre-scan) and the guard
    // join rides the same entity-key exchange the pair join needs
    val counts = events
      .filter(col(typeCol) === conversionType || col(typeCol).isin(touchTypes: _*))
      .groupBy(col(entityCol))
      .agg(
        // independent predicates: when the conversion type is ALSO a
        // touch type, a conversion row counts on both sides
        sum(when(col(typeCol) === conversionType, 1L).otherwise(0L)).as("__nc"),
        sum(when(col(typeCol).isin(touchTypes: _*), 1L).otherwise(0L)).as("__nt"))
      .withColumn("__chk",
        when(col("__nc") * col("__nt") > maxPairsPerEntity,
          raise_error(concat(
            lit("attribution: entity "), col(entityCol).cast("string"),
            lit(" has "), col("__nc"), lit(" conversions x "), col("__nt"),
            lit(s" touches > maxPairsPerEntity=$maxPairsPerEntity — debounce the entity, " +
              "raise the bound, or use attributionWalk"))))
          .otherwise(lit(true)))
      .select(col(entityCol), col("__chk"))
    val pairs = conv.join(counts, Seq(entityCol)).filter(col("__chk")).drop("__chk")
      .join(touch, Seq(entityCol))
      .filter(col("__tts") <= col("__cts") &&
        col("__cts") - col("__tts") <= lookbackMicros &&
        !(col("__tts") === col("__cts") && col("__ttie") === col("__ctie")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entityCol), col("__cts"), col("__ctie"))
    val ranked = pairs
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__min", min(struct(col("__tts"), col("__ttie"))).over(w))
      .withColumn("__max", max(struct(col("__tts"), col("__ttie"))).over(w))
    ranked
      .groupBy(col("__ttype").as("touch_type"))
      .agg(
        count(lit(1)).as("n_touches"),
        count_distinct(col(entityCol), col("__cts"), col("__ctie")).as("conversions"),
        sum(when(struct(col("__tts"), col("__ttie")) === col("__min"), lit(1000000L))
          .otherwise(lit(0L))).as("first_ppm"),
        sum(when(struct(col("__tts"), col("__ttie")) === col("__max"), lit(1000000L))
          .otherwise(lit(0L))).as("last_ppm"),
        // `div` is exact integral division on longs (the double-divide
        // + cast alternative can round across the integer boundary)
        sum(expr("CAST(1000000 AS BIGINT) div __n")).as("linear_ppm"))
  }

  /** [[attribution]] as a LINEAR single-pass walk — the 100 TB shape.
    * Same output contract bit-for-bit, but no conv × touch pair space:
    * one exchange on the entity key, a per-partition sort by
    * `(entity, ts, kind, tie)` (touches before conversions at equal
    * ts — boundary-inclusive attribution), then a FIFO walk. Because
    * touches arrive in `(ts, tie)` order, the lookback window's
    * first-touch is the FIFO head and the last-touch its tail — no
    * priority structure needed; linear credit needs only the per-type
    * running counts maintained on append/evict. Each row costs amortized
    * O(1); a bot entity with 10⁵ window events costs 10⁵ work (vs the
    * join's 10¹⁰ pair rows) and memory bounded by ITS touches inside
    * one lookback, never the corpus.
    *
    * Partitions pre-aggregate into at most |touchTypes| partial rows
    * each, so the final per-type aggregation is a trivial exchange.
    *
    * The join form's self-(ts, tie) residual — a touch sharing a
    * conversion's exact `(ts, tie)` never credits THAT conversion — is
    * reproduced here with a tail scan over the conversion-timestamp's
    * own touches, so the equivalence holds even when the tie column is
    * not unique across event types (double-logged events).
    *
    * Requires `conversionType` not be listed in `touchTypes`: when a
    * conversion doubles as a touch, the conversion rows themselves
    * enter the pair space and the walk's single-kind FIFO cannot
    * represent that — use [[attribution]]. */
  def attributionWalk(
      events: DataFrame, entityCol: String, tsCol: String, tieCol: String,
      typeCol: String, conversionType: String, touchTypes: Seq[String],
      lookbackSeconds: Long
  ): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs at least one touch type")
    require(touchTypes.distinct == touchTypes,
      s"touchTypes must be distinct (a duplicate double-counts its pairs), got $touchTypes")
    require(!touchTypes.contains(conversionType),
      s"attributionWalk: conversion type '$conversionType' is also a touch type — " +
        "self-pair exclusion needs the join path; use attribution()")
    require(lookbackSeconds > 0, s"lookbackSeconds must be positive, got $lookbackSeconds")
    val lookbackMicros = lookbackSeconds * 1000000L
    val spark = events.sparkSession
    import spark.implicits._
    val nTypes = touchTypes.length
    val types = touchTypes.toArray
    val tiCol = touchTypes.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (t, i)) => when(col(typeCol) === t, lit(i)).otherwise(acc)
    }
    val ev = events
      .filter((col(typeCol) === conversionType || col(typeCol).isin(touchTypes: _*)) &&
        col(entityCol).isNotNull && col(tsCol).isNotNull)
      .select(
        col(entityCol).as("__e"),
        unix_micros(col(tsCol)).as("__us"),
        when(col(typeCol) === conversionType, lit(1)).otherwise(lit(0)).as("__kind"),
        tiCol.as("__ti"),
        col(tieCol).as("__tie"))
      .repartition(col("__e"))
      .sortWithinPartitions(col("__e"), col("__us"), col("__kind"), col("__tie"))
    val partials = ev.mapPartitions { rows =>
      val nTouches  = new Array[Long](nTypes)
      val convs     = new Array[Long](nTypes)
      val firstPpm  = new Array[Long](nTypes)
      val lastPpm   = new Array[Long](nTypes)
      val linearPpm = new Array[Long](nTypes)
      // FIFO of this entity's touches still inside the newest lookback:
      // (micros, type index, tie value)
      val fifo = scala.collection.mutable.ArrayDeque.empty[(Long, Int, Any)]
      val typeCnt = new Array[Long](nTypes)
      val exType  = new Array[Long](nTypes)
      var curEntity: Any = null
      var started = false
      rows.foreach { r =>
        val e = r.get(0)
        if (!started || e != curEntity) {
          started = true; curEntity = e
          fifo.clear(); java.util.Arrays.fill(typeCnt, 0L)
        }
        val us = r.getLong(1)
        // evict on every row: anything older than (us - lookback) can
        // never attribute to this or any later conversion
        while (fifo.nonEmpty && fifo.head._1 < us - lookbackMicros) {
          typeCnt(fifo.removeHead()._2) -= 1
        }
        if (r.getInt(2) == 0) {               // touch: append
          fifo.append((us, r.getInt(3), r.get(4)))
          typeCnt(r.getInt(3)) += 1
        } else {                              // conversion: credit
          // Self-(ts, tie) exclusion, matching the join form's
          // unconditional residual: a touch sharing the conversion's
          // exact (ts, tie) — a double-logged event when the tie column
          // is not unique across types — must not credit THIS
          // conversion (it may still credit others). Equal-ts touches
          // sit contiguously at the FIFO tail (sort order puts touches
          // before conversions at equal ts), so the scan is bounded by
          // this timestamp's own touches, amortized O(1) per row when
          // timestamps are distinct.
          val ctie = r.get(4)
          var exCnt = 0
          var idx = fifo.size - 1
          while (idx >= 0 && fifo(idx)._1 == us) {
            val t = fifo(idx)
            if (t._3 == ctie) { exCnt += 1; exType(t._2) += 1 }
            idx -= 1
          }
          val n = fifo.size - exCnt
          if (n > 0) {
            val ppmEach = 1000000L / n
            // first credited touch: the head unless excluded (the head
            // can only be excluded when ALL fifo entries share this ts)
            var hi = 0
            while (fifo(hi)._1 == us && fifo(hi)._3 == ctie) hi += 1
            firstPpm(fifo(hi)._2) += 1000000L
            var li = fifo.size - 1
            while (fifo(li)._1 == us && fifo(li)._3 == ctie) li -= 1
            lastPpm(fifo(li)._2) += 1000000L
            var i = 0
            while (i < nTypes) {
              val c = typeCnt(i) - exType(i)
              if (c > 0) { nTouches(i) += c; convs(i) += 1; linearPpm(i) += c * ppmEach }
              i += 1
            }
          }
          if (exCnt > 0) java.util.Arrays.fill(exType, 0L)
        }
      }
      (0 until nTypes).iterator.filter(convs(_) > 0).map(i =>
        (types(i), nTouches(i), convs(i), firstPpm(i), lastPpm(i), linearPpm(i)))
    }
    partials
      .toDF("touch_type", "n_touches", "conversions", "first_ppm", "last_ppm", "linear_ppm")
      .groupBy("touch_type")
      .agg(
        sum("n_touches").as("n_touches"),
        sum("conversions").as("conversions"),
        sum("first_ppm").as("first_ppm"),
        sum("last_ppm").as("last_ppm"),
        sum("linear_ppm").as("linear_ppm"))
  }
}
