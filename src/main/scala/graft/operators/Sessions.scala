package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators for clickstream/telemetry analytics:
  * gap-based sessionization and as-of (most-recent-prior) joins.
  *
  * Scale design: both are SINGLE-SHUFFLE constructions — the only
  * exchange is the hash partition on the entity key; everything else is
  * a within-partition window sort. Downstream per-(entity, session)
  * aggregations reuse the same partitioning (HashPartitioning(entity)
  * satisfies ClusteredDistribution(entity, session), so Catalyst plans
  * no second exchange — SessionsSpec pins this). Skew follows entity
  * activity: a pathological single entity is bounded by that entity's
  * event count, not the corpus, and can be pre-split with
  * [[graft.exec.Skew]] if one entity's stream outgrows a task.
  *
  * The reference has no event-stream operators (it aggregates events
  * into time-bucketed facts, `/root/reference/src/Ringo/Generator/
  * Populate/Fact.hs:60-125`); these extend the same events table to the
  * session/attribution queries a product-analytics deployment of it
  * invariably needs next.
  */
object Sessions {

  /** Assign gap-based sessions: a new session starts when the time
    * since the entity's previous event exceeds `gapSeconds`. Adds
    * `session_seq` (1-based per entity, in time order) to every input
    * row.
    *
    * Ordering ties on `tsCol` are broken by `tieCol` so the assignment
    * is deterministic; equal-timestamp events always land in the same
    * session regardless of tie order (their gap is 0 <= gapSeconds).
    */
  def sessionize(
      events: DataFrame, entityCol: String, tsCol: String, tieCol: String,
      gapSeconds: Long
  ): DataFrame = {
    require(gapSeconds >= 0, s"gapSeconds must be >= 0, got $gapSeconds")
    // nulls-last pinned explicitly: Spark defaults asc to NULLS FIRST,
    // ANSI engines (and the DuckDB oracle) to NULLS LAST
    val order = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol).asc_nulls_last, col(tieCol))
    val prevTs = lag(col(tsCol), 1).over(order)
    // micros arithmetic, not double epoch: epoch micros fit a long
    // exactly; double seconds lose sub-ms precision above 2^53 ns
    val isNew = when(prevTs.isNull, lit(1L)).otherwise(
      when(unix_micros(col(tsCol)) - unix_micros(prevTs) > gapSeconds * 1000000L, lit(1L))
        .otherwise(lit(0L)))
    events
      .withColumn("__is_new", isNew)
      // running sum over the SAME window spec: one exchange, one sort
      .withColumn("session_seq",
        sum(col("__is_new")).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__is_new")
  }

  /** Debounce an event stream: within each entity's time-ordered
    * stream, keep only the FIRST event of every run of same-type
    * events arriving within `windowMicros` of their predecessor
    * (duplicate-click / retry-storm suppression).
    *
    * This is RUN debounce, not raw-predecessor filtering: a run is
    * closed by a type change OR a gap > window measured between
    * CONSECUTIVE raw events, so a storm of rapid-fire duplicates
    * collapses to one survivor no matter how long it lasts. One
    * exchange, one sort (the [[sessionize]] window shape); the
    * run-boundary flag IS the survivor predicate, so no running sum is
    * needed. Deterministic via the `tieCol` tie-break.
    */
  def debounce(
      events: DataFrame, entityCol: String, tsCol: String, tieCol: String,
      typeCol: String, windowMicros: Long
  ): DataFrame = {
    require(windowMicros >= 0, s"windowMicros must be >= 0, got $windowMicros")
    val order = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol).asc_nulls_last, col(tieCol))
    val prevTs   = lag(col(tsCol), 1).over(order)
    val prevType = lag(col(typeCol), 1).over(order)
    // <=> : a type change to/from null must OPEN a run, not null the flag
    val newRun = when(prevTs.isNull, lit(1L)).otherwise(
      when(not(col(typeCol) <=> prevType) ||
        unix_micros(col(tsCol)) - unix_micros(prevTs) > windowMicros, lit(1L))
        .otherwise(lit(0L)))
    events
      .withColumn("__new_run", newRun)
      .filter(col("__new_run") === 1L) // first event of each run survives
      .drop("__new_run")
  }

  /** Per-session summary over a sessionized stream: event count, span,
    * and a decimal-stable value sum. The groupBy keys extend the
    * window's partition key, so this adds NO exchange after
    * [[sessionize]] (the map-side partial agg feeds the already-correct
    * partitioning). */
  def sessionStats(
      sessionized: DataFrame, entityCol: String, tsCol: String, valueCol: String
  ): DataFrame =
    sessionized
      .groupBy(col(entityCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        unix_micros(min(col(tsCol))).as("start_us"),
        unix_micros(max(col(tsCol))).as("end_us"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("value_sum"))

  /** As-of join: attach to every `left` row the values of the most
    * recent `right` row with `right.ts <= left.ts` for the same key
    * ("at or before" semantics). Returns the left rows plus one
    * `asof_<v>` column per requested value column (all null when no
    * right row precedes).
    *
    * Built as union + running `last(ignoreNulls)` window rather than a
    * join: a range/inequality join would either cross-join within key
    * groups or need an interval index, while the union form is ONE
    * shuffle on the key and one partition-local sort — the scalable
    * formulation at any key cardinality. Right rows sort BEFORE left
    * rows at equal timestamps (at-or-before); ties among right rows are
    * broken by `tieCol`, the later one winning.
    *
    * Attribution is ROW-ATOMIC (pandas merge_asof semantics): the value
    * columns travel in ONE struct through the window, so every output
    * row carries the values of a single real right row — a right row
    * whose value is null attaches that null rather than reaching back
    * to an older row (a per-column `last(ignoreNulls)` would stitch
    * together fields of DIFFERENT right rows when some are null).
    *
    * `toleranceMicros` (pandas merge_asof `tolerance`): when set, an
    * attribution older than the tolerance is dropped — every `asof_*`
    * column is null, as if no right row preceded. The right row's
    * timestamp rides the same struct, so the expiry check is a
    * scan-local projection after the window; the plan shape (one
    * exchange, no join) is unchanged.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCols: Seq[String],
      toleranceMicros: Option[Long] = None
  ): DataFrame = {
    require(valueCols.nonEmpty, "asofJoin needs at least one value column")
    require(toleranceMicros.forall(_ >= 0L), "tolerance must be non-negative")
    val leftCarry = left.columns.toSeq
    // common schema: left payload (null on right rows) + one struct of
    // right values + the right row's own timestamp (for tolerance
    // expiry; null on left rows) + the sort triple. The struct itself
    // is non-null on every right row (even all-null fields), so
    // last(ignoreNulls) skips exactly the left rows.
    val rowStruct = struct(valueCols.map(col) :+ unix_micros(col(tsCol)).as("__rts"): _*)
    val taggedLeft = left
      .withColumn("__tag", lit(1))
      .withColumn("__asof", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          valueCols.map(v => org.apache.spark.sql.types.StructField(v, right.schema(v).dataType)) :+
            org.apache.spark.sql.types.StructField("__rts", org.apache.spark.sql.types.LongType))))
    val taggedRight = {
      val base = right.select(
        col(keyCol), col(tsCol), col(tieCol), lit(0).as("__tag"), rowStruct.as("__asof"))
      leftCarry.filterNot(Set(keyCol, tsCol, tieCol)).foldLeft(base) { (d, c) =>
        d.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    }
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc_nulls_last, col("__tag"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = taggedRight.select(taggedLeft.columns.toIndexedSeq.map(col): _*)
      .unionByName(taggedLeft)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
    // tolerance expiry: the attribution stands only while the attributed
    // right row is within the window; expired -> whole struct nulled
    // (row-atomic even in expiry — fields never outlive each other)
    val expired = toleranceMicros.foldLeft(attached) { (d, tol) =>
      d.withColumn("__asof",
        when(unix_micros(col(tsCol)) - col("__asof").getField("__rts") <= tol, col("__asof")))
    }
    valueCols.foldLeft(expired) { (d, v) =>
      d.withColumn(s"asof_$v", col("__asof").getField(v))
    }.filter(col("__tag") === 1).drop("__tag", "__asof")
  }

  /** FORWARD as-of join — [[asofJoin]]'s mirror: attach to every
    * `left` row the values of the EARLIEST `right` row with
    * `right.ts >= left.ts` for the same key ("at or after" — the
    * time-to-next-event / look-ahead attribution query: "which signup
    * follows this impression, and how soon"). Output columns are
    * `next_<v>` (all null when no right row follows).
    *
    * Same single-exchange union+window construction, reflected: left
    * rows sort BEFORE right rows at equal timestamps (at-or-after
    * inclusive), ties among right rows break by `tieCol` with the
    * EARLIEST winning, and the attribution is
    * `first(ignoreNulls)` over the current-row-to-unbounded-FOLLOWING
    * frame. Row-atomic through one struct, like the backward form.
    *
    * `toleranceMicros`: a right row further than the tolerance AHEAD
    * is dropped (nulls), the look-ahead window bound. */
  def asofJoinForward(
      left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCols: Seq[String],
      toleranceMicros: Option[Long] = None
  ): DataFrame = {
    require(valueCols.nonEmpty, "asofJoinForward needs at least one value column")
    require(toleranceMicros.forall(_ >= 0L), "tolerance must be non-negative")
    val leftCarry = left.columns.toSeq
    val rowStruct = struct(valueCols.map(col) :+ unix_micros(col(tsCol)).as("__rts"): _*)
    val taggedLeft = left
      .withColumn("__tag", lit(1))
      .withColumn("__next", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          valueCols.map(v => org.apache.spark.sql.types.StructField(v, right.schema(v).dataType)) :+
            org.apache.spark.sql.types.StructField("__rts", org.apache.spark.sql.types.LongType))))
    val taggedRight = {
      val base = right.select(
        col(keyCol), col(tsCol), col(tieCol), lit(0).as("__tag"), rowStruct.as("__next"))
      leftCarry.filterNot(Set(keyCol, tsCol, tieCol)).foldLeft(base) { (d, c) =>
        d.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    }
    // left (tag 1) sorts BEFORE right (tag 0) at equal ts via 1-tag,
    // so equal-timestamp right rows land in the left row's following
    // frame (inclusive at-or-after)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc_nulls_last, lit(1) - col("__tag"), col(tieCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val attached = taggedRight.select(taggedLeft.columns.toIndexedSeq.map(col): _*)
      .unionByName(taggedLeft)
      .withColumn("__next", first(col("__next"), ignoreNulls = true).over(w))
    val expired = toleranceMicros.foldLeft(attached) { (d, tol) =>
      d.withColumn("__next",
        when(col("__next").getField("__rts") - unix_micros(col(tsCol)) <= tol, col("__next")))
    }
    valueCols.foldLeft(expired) { (d, v) =>
      d.withColumn(s"next_$v", col("__next").getField(v))
    }.filter(col("__tag") === 1).drop("__tag", "__next")
  }

  // ================================================================ incremental session maintenance

  /** Build the maintained session table from scratch: one row per
    * (entity, session) with `n_events`, `start_us`/`end_us` (epoch
    * micros) and `value_sum_dec` — the value sum kept as
    * decimal(28,6), NOT double, so later incremental merges add
    * exactly (decimal addition is associative; double addition is
    * not, and a maintained double would drift one ulp away from a
    * full recompute). Render for consumers with
    * [[sessionTableStats]]. */
  def buildSessionTable(
      events: DataFrame, entityCol: String, tsCol: String, tieCol: String,
      valueCol: String, gapSeconds: Long
  ): DataFrame =
    sessionize(events, entityCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(entityCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        unix_micros(min(col(tsCol))).as("start_us"),
        unix_micros(max(col(tsCol))).as("end_us"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("decimal(28,6)")
          .as("value_sum_dec"))

  /** The [[sessionStats]]-shaped view of a maintained session table
    * (double `value_sum`, the analytics-facing schema). */
  def sessionTableStats(table: DataFrame, entityCol: String): DataFrame =
    table.select(col(entityCol), col("session_seq"), col("n_events"),
      col("start_us"), col("end_us"),
      col("value_sum_dec").cast("double").as("value_sum"))

  /** Incremental session maintenance — the nightly-load twin of
    * [[buildSessionTable]]: fold a NEW batch of events into a
    * maintained session table without rescanning historical events.
    *
    * Contract (the append-only nightly-load shape): every batch event
    * is strictly later than every already-maintained event OF THE SAME
    * ENTITY. Under it the only sessions the batch can touch are each
    * entity's LAST maintained session (when the entity's first batch
    * event falls within `gapSeconds` of its end, the two sessions are
    * one) — so the result equals a full rebuild over all events,
    * bit-for-bit (decimal value sums; spec-pinned parity). Batches
    * that violate the contract (late replays) still produce a
    * deterministic result, but not the full-rebuild one — route late
    * data through a rebuild of the affected partitions instead.
    *
    * Cost is proportional to |batch| + |maintained|, never the event
    * history: one sessionize exchange over the batch, one aggregation
    * over the maintained table for each entity's last session, entity-
    * keyed joins to merge/renumber, and an anti-join that passes every
    * untouched maintained row through unchanged. At warehouse scale
    * the maintained table is orders of magnitude smaller than the
    * event log — this is the same delta-vs-maintained shape as
    * [[graft.exec.Rollup]] incremental maintenance. */
  def sessionizeIncremental(
      maintained: DataFrame, batch: DataFrame,
      entityCol: String, tsCol: String, tieCol: String, valueCol: String,
      gapSeconds: Long
  ): DataFrame = {
    require(gapSeconds >= 0, s"gapSeconds must be >= 0, got $gapSeconds")
    val gapMicros = gapSeconds * 1000000L
    val bTable = buildSessionTable(batch, entityCol, tsCol, tieCol, valueCol, gapSeconds)
    // each entity's last maintained session, via lexicographic struct
    // max (session_seq leads) — one agg over the session table
    val lastM = maintained
      .groupBy(col(entityCol))
      .agg(max(struct(col("session_seq"), col("n_events"), col("start_us"),
        col("end_us"), col("value_sum_dec"))).as("__last"))
      .select(col(entityCol),
        col("__last.session_seq").as("__l_seq"),
        col("__last.n_events").as("__l_n"),
        col("__last.start_us").as("__l_start"),
        col("__last.end_us").as("__l_end"),
        col("__last.value_sum_dec").as("__l_sum"))
    // per-entity merge decision: does the first batch session continue
    // the last maintained one?
    val firstB = bTable.filter(col("session_seq") === 1)
      .join(lastM, Seq(entityCol), "left")
      .withColumn("__merged",
        col("__l_seq").isNotNull &&
          col("start_us") - col("__l_end") <= gapMicros)
    // null-safe sum merge: an all-null-value session has a NULL sum
    // (SQL sum semantics), and NULL + x would null-poison the merge —
    // the rebuild-parity rule is "NULL iff both NULL, else treat NULL
    // as zero" (exactly what summing the union of events yields)
    val mergedSum = when(col("__l_sum").isNull && col("value_sum_dec").isNull,
      lit(null).cast("decimal(28,6)"))
      .otherwise(
        (coalesce(col("__l_sum"), lit(0)) + coalesce(col("value_sum_dec"), lit(0)))
          .cast("decimal(28,6)"))
    val mergedRows = firstB.filter(col("__merged")).select(
      col(entityCol),
      col("__l_seq").as("session_seq"),
      (col("__l_n") + col("n_events")).as("n_events"),
      col("__l_start").as("start_us"),
      col("end_us"),
      mergedSum.as("value_sum_dec"))
    // batch sessions renumber by the entity's offset: merged entities
    // absorbed their first batch session into seq __l_seq, so the rest
    // shift by __l_seq - 1; unmerged entities shift by __l_seq; fresh
    // entities keep their 1-based numbering
    val offsets = firstB.select(col(entityCol),
      (coalesce(col("__l_seq"), lit(0L)) -
        when(col("__merged"), lit(1L)).otherwise(lit(0L))).as("__off"),
      col("__merged"))
    val bRenumbered = bTable
      .join(offsets, Seq(entityCol))
      .filter(!(col("__merged") && col("session_seq") === 1))
      .select(col(entityCol),
        (col("session_seq") + col("__off")).as("session_seq"),
        col("n_events"), col("start_us"), col("end_us"), col("value_sum_dec"))
    // untouched maintained rows pass through via anti-join on the (few)
    // merged last-session keys
    val mergedKeys = firstB.filter(col("__merged"))
      .select(col(entityCol), col("__l_seq").as("session_seq"))
    maintained
      .join(mergedKeys, Seq(entityCol, "session_seq"), "left_anti")
      .select(col(entityCol), col("session_seq"), col("n_events"),
        col("start_us"), col("end_us"), col("value_sum_dec"))
      .unionByName(mergedRows)
      .unionByName(bRenumbered)
  }
}
