package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Funnel, Sessions}

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

  /** Incremental session maintenance: the corpus (events before the
    * mid-month cut) builds the maintained session table, the batch
    * (events at/after it) folds in WITHOUT rescanning the corpus —
    * boundary-spanning sessions merge, later ones renumber. The oracle
    * is the FULL recompute over all events ([[eventsSessionizeSql]]),
    * so the gate proves maintained == rebuilt bit-for-bit (decimal
    * value sums survive the merge exactly). */
  def eventsSessionizeIncremental(s: SparkSession, dir: String): DataFrame = {
    val ev  = events(s, dir)
    val cut = lit("2024-01-15 00:00:00").cast("timestamp")
    val m = Sessions.buildSessionTable(
      ev.filter(col("ts") < cut), "user_id", "ts", "event_id", "value", 86400L)
    Sessions.sessionTableStats(
      Sessions.sessionizeIncremental(
        m, ev.filter(col("ts") >= cut),
        "user_id", "ts", "event_id", "value", 86400L),
      "user_id")
  }

  // ================================================================ multi-touch attribution
  /** Multi-touch attribution over a 7-day lookback: purchase
    * conversions credit the user's preceding view/click/signup touches
    * under first/last/linear models, all in exact integer ppm. */
  def eventsAttribution(s: SparkSession, dir: String): DataFrame =
    Funnel.attribution(events(s, dir), "user_id", "ts", "event_id", "event_type",
      conversionType = "purchase", touchTypes = Seq("view", "click", "signup"),
      lookbackSeconds = 7L * 86400L)

  /** The same attribution through [[Funnel.attributionWalk]] — the
    * linear FIFO walk with no pair space; gated against the SAME
    * relational oracle as the join form, so the two shapes are pinned
    * equivalent by the driver, not just by spec. */
  def eventsAttributionWalk(s: SparkSession, dir: String): DataFrame =
    Funnel.attributionWalk(events(s, dir), "user_id", "ts", "event_id", "event_type",
      conversionType = "purchase", touchTypes = Seq("view", "click", "signup"),
      lookbackSeconds = 7L * 86400L)

  lazy val eventsAttributionSql: String =
    s"""WITH conv AS (
       |  SELECT user_id, epoch_us(ts) AS cts, event_id AS ctie
       |  FROM events WHERE event_type = 'purchase'
       |), touch AS (
       |  SELECT user_id, epoch_us(ts) AS tts, event_id AS ttie, event_type AS ttype
       |  FROM events WHERE event_type IN ('view', 'click', 'signup')
       |), pairs AS (
       |  SELECT c.user_id, c.cts, c.ctie, t.tts, t.ttie, t.ttype
       |  FROM conv c JOIN touch t ON c.user_id = t.user_id
       |  WHERE t.tts <= c.cts AND c.cts - t.tts <= 604800000000
       |    AND NOT (t.tts = c.cts AND t.ttie = c.ctie)
       |), ranked AS (
       |  SELECT ttype, user_id, cts, ctie,
       |         count(*) OVER w AS n,
       |         row_number() OVER (PARTITION BY user_id, cts, ctie
       |                            ORDER BY tts, ttie) AS rn_first,
       |         row_number() OVER (PARTITION BY user_id, cts, ctie
       |                            ORDER BY tts DESC, ttie DESC) AS rn_last
       |  FROM pairs
       |  WINDOW w AS (PARTITION BY user_id, cts, ctie)
       |)
       |SELECT ttype AS touch_type,
       |       count(*) AS n_touches,
       |       CAST(count(DISTINCT (user_id, cts, ctie)) AS BIGINT) AS conversions,
       |       CAST(sum(CASE WHEN rn_first = 1 THEN 1000000 ELSE 0 END) AS BIGINT) AS first_ppm,
       |       CAST(sum(CASE WHEN rn_last = 1 THEN 1000000 ELSE 0 END) AS BIGINT) AS last_ppm,
       |       CAST(sum(1000000 // n) AS BIGINT) AS linear_ppm
       |FROM ranked
       |GROUP BY 1
       |""".stripMargin

  // ================================================================ funnel
  /** Ordered view -> click -> purchase funnel, one row per user that
    * ever viewed: stage timestamps in epoch micros, null once the
    * funnel was abandoned. Stage filters push to the scan; every join
    * and aggregation is keyed on user_id. */
  def eventsFunnel(s: SparkSession, dir: String): DataFrame =
    Funnel.funnel(events(s, dir), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .select(
        col("user_id"),
        unix_micros(col("ts_1")).as("view_us"),
        unix_micros(col("ts_2")).as("click_us"),
        unix_micros(col("ts_3")).as("purchase_us"))

  lazy val eventsFunnelSql: String =
    s"""WITH s1 AS (
       |  SELECT user_id, min(ts) AS t1 FROM events
       |  WHERE event_type = 'view' GROUP BY 1
       |), s2 AS (
       |  SELECT e.user_id, min(e.ts) AS t2
       |  FROM events e JOIN s1 ON e.user_id = s1.user_id
       |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
       |), s3 AS (
       |  SELECT e.user_id, min(e.ts) AS t3
       |  FROM events e JOIN s2 ON e.user_id = s2.user_id
       |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
       |)
       |SELECT s1.user_id, epoch_us(t1) AS view_us, epoch_us(t2) AS click_us,
       |       epoch_us(t3) AS purchase_us
       |FROM s1
       |LEFT JOIN s2 ON s1.user_id = s2.user_id
       |LEFT JOIN s3 ON s1.user_id = s3.user_id
       |""".stripMargin

  // ================================================================ retention
  /** Weekly cohort retention: users cohorted by first-activity week,
    * each (cohort, offset) cell counting users active that many weeks
    * later. One distinct pass over (user, week); the cohort join reuses
    * the user-hash partitioning. */
  def eventsRetention(s: SparkSession, dir: String): DataFrame =
    Funnel.retention(events(s, dir), "user_id", "ts", periodSeconds = 604800L)

  lazy val eventsRetentionSql: String =
    s"""WITH active AS (
       |  SELECT DISTINCT user_id,
       |         CAST(floor(epoch(ts) / 604800) AS BIGINT) AS period
       |  FROM events
       |), cohorts AS (
       |  SELECT user_id, min(period) AS cohort_period FROM active GROUP BY 1
       |)
       |SELECT c.cohort_period,
       |       a.period - c.cohort_period AS period_offset,
       |       count(DISTINCT a.user_id) AS n_entities
       |FROM active a JOIN cohorts c ON a.user_id = c.user_id
       |GROUP BY 1, 2
       |""".stripMargin

  // ================================================================ percentiles
  /** Exact per-type value percentiles (p50/p95/p99, linear
    * interpolation) — the latency/value distribution query. Rounded to
    * 6 decimals on both sides (the interpolation arithmetic agrees well
    * past that; the raw doubles could differ in the last ulp). */
  def eventsPercentiles(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        round(percentile(col("value"), lit(0.5)), 6).as("p50"),
        round(percentile(col("value"), lit(0.95)), 6).as("p95"),
        round(percentile(col("value"), lit(0.99)), 6).as("p99"))

  lazy val eventsPercentilesSql: String =
    s"""SELECT event_type,
       |       round(quantile_cont(value, 0.5), 6) AS p50,
       |       round(quantile_cont(value, 0.95), 6) AS p95,
       |       round(quantile_cont(value, 0.99), 6) AS p99
       |FROM events
       |GROUP BY 1
       |""".stripMargin

  // ================================================================ approx percentiles (scale path)
  /** The 100 TB percentile path: `approx_percentile` keeps a bounded
    * GK/QuantileSummaries sketch per group (O(accuracy·log n) entries),
    * where exact `percentile` buffers EVERY distinct value per group in
    * the aggregation buffer — correct at sf0.1, OOM at 100×. Gated like
    * the count-distinct sketch: the gate emits the exact percentiles
    * (hash-checked against DuckDB `quantile_cont`) PLUS a deterministic
    * within-bracket flag — the approx value must land between the exact
    * percentiles at rank p ± 0.02, a huge margin over the sketch's
    * guaranteed 1/accuracy = 1e-4 rank error — against a constant-true
    * oracle column. The bench times the approx-only production shape
    * ([[eventsPercentilesApproxBench]]); the exact companion exists for
    * the oracle, not for the cluster path. */
  def eventsPercentilesApprox(s: SparkSession, dir: String): DataFrame = {
    val acc   = 10000
    val delta = 0.02
    val ps    = Seq(("p50", 0.5), ("p95", 0.95), ("p99", 0.99))
    val aggs = ps.flatMap { case (nm, p) =>
      Seq(
        percentile(col("value"), lit(p)).as(s"__ex_$nm"),
        percentile(col("value"), lit(math.max(p - delta, 0.0))).as(s"__lo_$nm"),
        percentile(col("value"), lit(math.min(p + delta, 1.0))).as(s"__hi_$nm"),
        approx_percentile(col("value"), lit(p), lit(acc)).as(s"__ap_$nm"))
    }
    val base = events(s, dir).groupBy(col("event_type")).agg(aggs.head, aggs.tail: _*)
    val outCols = ps.flatMap { case (nm, _) =>
      Seq(
        round(col(s"__ex_$nm"), 6).as(nm),
        // all-null value group: every side is null — vacuously within
        coalesce(
          (col(s"__ap_$nm") >= col(s"__lo_$nm") && col(s"__ap_$nm") <= col(s"__hi_$nm"))
            .cast("int"),
          lit(1)).as(s"ok_$nm"))
    }
    base.select(col("event_type") +: outCols: _*)
  }

  lazy val eventsPercentilesApproxSql: String =
    s"""SELECT event_type,
       |       round(quantile_cont(value, 0.5), 6) AS p50,
       |       CAST(1 AS INTEGER) AS ok_p50,
       |       round(quantile_cont(value, 0.95), 6) AS p95,
       |       CAST(1 AS INTEGER) AS ok_p95,
       |       round(quantile_cont(value, 0.99), 6) AS p99,
       |       CAST(1 AS INTEGER) AS ok_p99
       |FROM events
       |GROUP BY 1
       |""".stripMargin

  /** Bench-only production shape: approx sketches only, no exact
    * companion — on a cluster the sketch exists precisely to avoid
    * buffering every value per group. */
  def eventsPercentilesApproxBench(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(approx_percentile(
        col("value"), array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("pcts"))

  // ================================================================ pivot
  /** Per-user event-type count matrix — the relational pivot surface
    * (one shuffle on user_id, conditional-count rewrite underneath). */
  private val PivotTypes = Seq("view", "click", "purchase", "signup", "error")

  def eventsPivot(s: SparkSession, dir: String): DataFrame = {
    val pivoted = events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", PivotTypes)
      .count()
    PivotTypes.foldLeft(pivoted) { (d, t) =>
      d.withColumn(s"n_$t", coalesce(col(t), lit(0L)))
    }.select(col("user_id") +: PivotTypes.map(t => col(s"n_$t")): _*)
  }

  lazy val eventsPivotSql: String = {
    val cols = PivotTypes.map { t =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t"
    }.mkString(",\n       ")
    s"""SELECT user_id,
       |       $cols
       |FROM events
       |GROUP BY 1
       |""".stripMargin
  }

  // ================================================================ debounce
  /** Duplicate-event suppression: within each user's time-ordered
    * stream, a run of same-type events arriving within 12h of their
    * predecessor collapses to its first event ([[Sessions.debounce]]).
    * The window is sized to the synthetic data's inter-event spacing so
    * the gate actually suppresses at every sf (135/1345/13237 events at
    * sf0.001/0.01/0.1 — a 5s click-storm window suppressed almost
    * nothing here). The oracle replays the lag-flag construction
    * clause-for-clause. */
  def eventsDebounce(s: SparkSession, dir: String): DataFrame =
    Sessions.debounce(events(s, dir), "user_id", "ts", "event_id", "event_type",
      windowMicros = 12L * 3600L * 1000000L)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))

  lazy val eventsDebounceSql: String =
    s"""WITH flagged AS (
       |  SELECT event_id, user_id, ts, event_type,
       |         CASE WHEN lag(ts) OVER w IS NULL THEN 1
       |              WHEN event_type IS DISTINCT FROM lag(event_type) OVER w THEN 1
       |              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > CAST(43200000000 AS BIGINT) THEN 1
       |              ELSE 0 END AS new_run
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |)
       |SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
       |FROM flagged WHERE new_run = 1
       |""".stripMargin

  // ================================================================ path trigrams
  /** User-journey path analysis: the 20 most frequent 3-step event-type
    * sequences across all users (consecutive steps in each user's
    * time-ordered stream; sequences never span users). One entity
    * exchange for the lead() windows, one small aggregation of the
    * trigram keys, a bounded top-k — the standard flow-analysis
    * dataflow. The top-k is `orderBy(...).limit(k)` — a
    * TakeOrderedAndProject bounded heap, not a single-partition rank
    * window, so the shape survives ANY type cardinality; the (count
    * desc, path asc) order is a total order over integer-exact keys,
    * so the selected set is bit-reproducible (ties at the boundary
    * break on the path). */
  def eventsPaths(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc_nulls_last, col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("s1"))
      .withColumn("s2", lead(col("s1"), 1).over(w))
      .withColumn("s3", lead(col("s1"), 2).over(w))
      .filter(col("s2").isNotNull && col("s3").isNotNull)
      .groupBy(col("s1"), col("s2"), col("s3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
      .limit(20)
  }

  lazy val eventsPathsSql: String =
    s"""WITH steps AS (
       |  SELECT event_type AS s1,
       |         lead(event_type, 1) OVER w AS s2,
       |         lead(event_type, 2) OVER w AS s3
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), paths AS (
       |  SELECT s1, s2, s3, count(*) AS n
       |  FROM steps WHERE s2 IS NOT NULL AND s3 IS NOT NULL
       |  GROUP BY 1, 2, 3
       |)
       |SELECT s1, s2, s3, n
       |FROM paths
       |ORDER BY n DESC, s1, s2, s3
       |LIMIT 20
       |""".stripMargin

  // ================================================================ daily anomaly z-scores
  /** Volume-anomaly detection: each (event_type, day) count scored
    * against the trailing 7 days (RANGE frame on the integer day, so
    * gap days weigh correctly). Mean and variance derive from EXACT
    * integer window sums (sum, sum of squares — BIGINT in both
    * engines), so the double arithmetic is one mirrored expression and
    * the z-score and |z|>3 flag are bit-reproducible; no
    * order-dependent stddev aggregate is involved. Two shuffles: the
    * daily rollup and the per-type window sort — the window runs over
    * DAYS, thousands of rows, not events. */
  def eventsAnomaly(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .groupBy(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("day_id"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_id"))
      .rangeBetween(-7, -1)
    val trailing = daily
      .withColumn("w_days", count(col("n")).over(w))
      .withColumn("w_sum", sum(col("n")).over(w))
      .withColumn("w_sumsq", sum(col("n") * col("n")).over(w))
    // sample variance from exact sums: (sumsq - sum^2/k) / (k - 1)
    val mean = col("w_sum").cast("double") / col("w_days")
    val varS = (col("w_sumsq").cast("double") - col("w_sum").cast("double") * col("w_sum") / col("w_days")) /
      (col("w_days") - lit(1))
    val z = (col("n").cast("double") - mean) / sqrt(varS)
    trailing
      .withColumn("z", when(col("w_days") >= 2 && varS > 0, z))
      .select(col("event_type"), col("day_id"), col("n"),
        col("w_days").as("window_days"),
        round(col("z"), 6).as("z_score"),
        coalesce(abs(col("z")) > 3.0, lit(false)).as("anomalous"))
  }

  lazy val eventsAnomalySql: String =
    s"""WITH daily AS (
       |  SELECT event_type,
       |         CAST(floor(epoch(ts)/86400) AS BIGINT) AS day_id,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2
       |), t AS (
       |  SELECT event_type, day_id, n,
       |         CAST(count(n) OVER w AS BIGINT) AS w_days,
       |         CAST(sum(n) OVER w AS BIGINT) AS w_sum,
       |         CAST(sum(n * n) OVER w AS BIGINT) AS w_sumsq
       |  FROM daily
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day_id
       |               RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
       |), scored AS (
       |  SELECT event_type, day_id, n, w_days,
       |         CASE WHEN w_days >= 2
       |                   AND (CAST(w_sumsq AS DOUBLE) - CAST(w_sum AS DOUBLE) * w_sum / w_days) / (w_days - 1) > 0
       |              THEN (CAST(n AS DOUBLE) - CAST(w_sum AS DOUBLE) / w_days)
       |                   / sqrt((CAST(w_sumsq AS DOUBLE) - CAST(w_sum AS DOUBLE) * w_sum / w_days) / (w_days - 1))
       |              END AS z
       |  FROM t
       |)
       |SELECT event_type, day_id, n, w_days AS window_days,
       |       round(z, 6) AS z_score,
       |       coalesce(abs(z) > 3.0, FALSE) AS anomalous
       |FROM scored
       |""".stripMargin

  // ================================================================ cube / grouping sets
  /** Multi-grain OLAP aggregation in one pass: `cube(event_type, day)`
    * computes the (type, day) cells plus both marginals and the grand
    * total in a single shuffle (Spark expands the grouping sets
    * map-side, partial-aggregates each, and shares one exchange —
    * re-aggregating a populated fact per grain would scan it G times).
    * `grouping_id()` disambiguates a subtotal's null from a data null;
    * the sum is exact-decimal before the double cast so every grain is
    * order-independent. DuckDB mirrors with GROUP BY CUBE + GROUPING. */
  def eventsCube(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(
        col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("day_id"),
        col("value"))
      .cube(col("event_type"), col("day_id"))
      .agg(
        // grouping_id() must live in the aggregate list (Spark resolves
        // it against the expanded grouping sets, not the output)
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("value_sum"))
      .select(
        col("event_type"), col("day_id"), col("gid"),
        col("n_events"), col("value_sum"))

  lazy val eventsCubeSql: String =
    s"""WITH e AS (
       |  SELECT event_type,
       |         CAST(floor(epoch(ts)/86400) AS BIGINT) AS day_id,
       |         value
       |  FROM events
       |)
       |SELECT event_type, day_id,
       |       CAST(GROUPING(event_type, day_id) AS INTEGER) AS gid,
       |       CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
       |FROM e
       |GROUP BY CUBE (event_type, day_id)
       |""".stripMargin

  // ================================================================ rolling window
  /** Per-type daily counts with a 7-day rolling window (RANGE frame
    * over the integer day, so gap days weigh correctly). Two shuffles:
    * the daily aggregation and the per-type window sort. */
  def eventsRolling(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .groupBy(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("__v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day")).rangeBetween(-6, 0)
    daily.select(
      col("event_type"), col("day"), col("n"),
      sum(col("n")).over(w).as("n_7d"),
      sum(col("__v")).over(w).cast("double").as("value_7d"))
  }

  lazy val eventsRollingSql: String =
    s"""WITH daily AS (
       |  SELECT event_type,
       |         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
       |         CAST(count(*) AS BIGINT) AS n,
       |         sum(CAST(value AS DECIMAL(18,6))) AS v
       |  FROM events GROUP BY 1, 2
       |)
       |SELECT event_type, day, n,
       |       CAST(sum(n) OVER w AS BIGINT) AS n_7d,
       |       CAST(sum(v) OVER w AS DOUBLE) AS value_7d
       |FROM daily
       |WINDOW w AS (PARTITION BY event_type ORDER BY day
       |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
       |""".stripMargin

  // ================================================================ transitions
  /** Event-type transition matrix: (type, next type) counts per user
    * timeline — the Markov/path-analysis primitive. One entity shuffle
    * for the lead window, one small aggregation on the type pair. */
  def eventsTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  lazy val eventsTransitionsSql: String =
    s"""WITH nxt AS (
       |  SELECT event_type AS from_type,
       |         lead(event_type) OVER (PARTITION BY user_id
       |                                ORDER BY ts, event_id) AS to_type
       |  FROM events
       |)
       |SELECT from_type, to_type, count(*) AS n
       |FROM nxt WHERE to_type IS NOT NULL
       |GROUP BY 1, 2
       |""".stripMargin

  /** Per-node triangle counts of the (undirected) event-type
    * transition graph — degree-oriented wedge counting
    * ([[graft.operators.Centrality.triangles]]); the oracle counts
    * a<b<c triples the naive way, proving the oriented plan computes
    * the same set. */
  def graphTriangles(s: SparkSession, dir: String): DataFrame =
    graft.operators.Centrality.triangles(
      eventsTransitions(s, dir), "from_type", "to_type")
      .withColumnRenamed("node", "event_type")

  lazy val graphTrianglesSql: String =
    s"""WITH nxt AS (
       |  SELECT event_type AS from_type,
       |         lead(event_type) OVER (PARTITION BY user_id
       |                                ORDER BY ts, event_id) AS to_type
       |  FROM events
       |), ed AS (
       |  SELECT DISTINCT least(from_type, to_type) AS a,
       |                  greatest(from_type, to_type) AS b
       |  FROM nxt
       |  WHERE to_type IS NOT NULL AND from_type <> to_type
       |), tri AS (
       |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |  FROM ed e1
       |  JOIN ed e2 ON e2.a = e1.a AND e2.b > e1.b
       |  JOIN ed e3 ON e3.a = e1.b AND e3.b = e2.b
       |), nodes AS (
       |  SELECT x AS node FROM tri
       |  UNION ALL SELECT y FROM tri
       |  UNION ALL SELECT z FROM tri
       |)
       |SELECT node AS event_type, count(*) AS n_triangles
       |FROM nodes GROUP BY 1
       |""".stripMargin

  /** Link centrality of the event-type transition graph: 3 iterations
    * of fixed-point integer PageRank over the same edge list as
    * `events_transitions`. Exact integer arithmetic end-to-end, so the
    * unrolled DuckDB oracle matches bit-for-bit. */
  def eventsPagerank(s: SparkSession, dir: String): DataFrame =
    graft.operators.Centrality.pageRank(
      eventsTransitions(s, dir), "from_type", "to_type", "n", iterations = 3)
      .withColumnRenamed("node", "event_type")

  /** The production iteration count with lineage checkpointing every 3
    * rounds (real link ranking runs tens of iterations; the checkpoint
    * keeps plan depth and failure recovery bounded). Integral
    * arithmetic means the 10-round unrolled oracle still matches
    * bit-for-bit, checkpoints and all. */
  def eventsPagerank10(s: SparkSession, dir: String): DataFrame =
    graft.operators.Centrality.pageRank(
      eventsTransitions(s, dir), "from_type", "to_type", "n",
      iterations = 10, checkpointInterval = 3)
      .withColumnRenamed("node", "event_type")

  lazy val eventsPagerankSql: String = pagerankSql(3)
  lazy val eventsPagerank10Sql: String = pagerankSql(10)

  private def pagerankSql(iterations: Int): String = {
    // one unrolled iteration: inflow via LEFT JOIN of the per-dst sum,
    // teleport floor for nodes with no inbound mass
    def it(prev: String, out: String): String =
      s"""c_$out AS (
         |  SELECT e.d AS v,
         |         sum((85 * $prev.r * e.n) // (CAST(100 AS HUGEINT) * ow.w)) AS infl
         |  FROM e
         |  JOIN $prev ON $prev.v = e.s
         |  JOIN ow ON ow.s = e.s
         |  GROUP BY 1),
         |$out AS (
         |  SELECT nodes.v,
         |         (CAST(15 AS HUGEINT) * 1000000000) // (100 * nn.n)
         |           + coalesce(c_$out.infl, 0) AS r
         |  FROM nodes CROSS JOIN nn
         |  LEFT JOIN c_$out ON c_$out.v = nodes.v)""".stripMargin
    s"""WITH nxt AS (
       |  SELECT event_type AS from_type,
       |         lead(event_type) OVER (PARTITION BY user_id
       |                                ORDER BY ts, event_id) AS to_type
       |  FROM events
       |),
       |e AS (SELECT from_type AS s, to_type AS d, count(*) AS n
       |      FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |nodes AS (SELECT s AS v FROM e UNION SELECT d FROM e),
       |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM nodes),
       |ow AS (SELECT s, CAST(sum(n) AS HUGEINT) AS w FROM e GROUP BY 1),
       |r0 AS (SELECT v, CAST(1000000000 AS HUGEINT) // nn.n AS r
       |       FROM nodes CROSS JOIN nn),
       |${(1 to iterations).map(i => it(s"r${i - 1}", s"r$i")).mkString(",\n")}
       |SELECT v AS event_type, CAST(r AS BIGINT) AS rank_fp FROM r$iterations
       |""".stripMargin
  }

  // ================================================================ grouped top-k
  /** Top-3 events per user by value — the grouped top-k surface. The
    * rank filter is recognized by Spark's RankLimit rewrite and planned
    * as WindowGroupLimit: each task keeps a bounded per-group heap
    * BEFORE the shuffle, so the exchange moves at most k rows per
    * (partition, group) instead of the full stream (SessionsSpec pins
    * the operator). Deterministic tie-break on event_id. */
  def eventsTopk(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= 3)
  }

  lazy val eventsTopkSql: String =
    s"""SELECT user_id, event_id, value, CAST(rk AS INTEGER) AS rk
       |FROM (
       |  SELECT user_id, event_id, value,
       |         row_number() OVER (PARTITION BY user_id
       |                            ORDER BY value DESC, event_id) AS rk
       |  FROM events
       |)
       |WHERE rk <= 3
       |""".stripMargin

  // ================================================================ as-of join
  /** As-of attribution: every purchase event picks up the value and id
    * of the user's most recent at-or-before signup event (null when the
    * purchase precedes any signup). Exercises the union + running
    * last(ignoreNulls) construction — one shuffle on user_id, no
    * inequality join.
    *
    * Signup values are deterministically nulled on `event_id % 7 == 0`
    * (mirrored in the oracle) so the gate EXERCISES row-atomic
    * attribution: a purchase whose latest at-or-before signup carries a
    * null value must attach (null value, that signup's id) — not reach
    * back to an older signup's value. A per-column reach-back oracle
    * hash-mismatches on this data. */
  def eventsAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    Sessions.asofJoin(
      left  = ev.filter(col("event_type") === "purchase"),
      right = ev.filter(col("event_type") === "signup")
        .withColumn("value",
          when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value"))),
      keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
      valueCols = Seq("value", "event_id"))
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("asof_value"), col("asof_event_id"))
  }

  /** Forward as-of: each purchase attaches the EARLIEST signup at or
    * after it (time-to-next-event attribution), same null-injected
    * value column and row-atomic struct contract as the backward
    * gate. */
  def eventsAsofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    Sessions.asofJoinForward(
      left  = ev.filter(col("event_type") === "purchase"),
      right = ev.filter(col("event_type") === "signup")
        .withColumn("value",
          when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value"))),
      keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
      valueCols = Seq("value", "event_id"))
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("next_value"), col("next_event_id"))
  }

  lazy val eventsAsofForwardSql: String =
    s"""WITH u AS (
       |  SELECT user_id, ts, 0 AS tag, event_id,
       |         {'r_value': CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END,
       |          'r_event_id': event_id} AS r
       |  FROM events WHERE event_type = 'signup'
       |  UNION ALL
       |  SELECT user_id, ts, 1 AS tag, event_id,
       |         CAST(NULL AS STRUCT(r_value DOUBLE, r_event_id BIGINT)) AS r
       |  FROM events WHERE event_type = 'purchase'
       |), a AS (
       |  SELECT user_id, ts, tag, event_id,
       |         first_value(r IGNORE NULLS) OVER w AS att
       |  FROM u
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, 1 - tag, event_id
       |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       |)
       |SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       |       struct_extract(att, 'r_value') AS next_value,
       |       struct_extract(att, 'r_event_id') AS next_event_id
       |FROM a WHERE tag = 1
       |""".stripMargin

  // ================================================================ as-of with tolerance
  /** As-of attribution with an expiry window (pandas merge_asof
    * `tolerance`): a purchase attributes its most recent at-or-before
    * signup only while that signup is at most 3 days old — stale
    * attributions drop to all-null, row-atomically. Same single-shuffle
    * union+window plan; the expiry check is a scan-local projection
    * (the attributed row's timestamp rides the attribution struct).
    * 52/401/4408 attributions expire at sf0.001/0.01/0.1, so the gate
    * exercises the tolerance path at every sf. */
  def eventsAsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    Sessions.asofJoin(
      left  = ev.filter(col("event_type") === "purchase"),
      right = ev.filter(col("event_type") === "signup"),
      keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
      valueCols = Seq("value", "event_id"),
      toleranceMicros = Some(3L * 86400L * 1000000L))
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("asof_value"), col("asof_event_id"))
  }

  lazy val eventsAsofToleranceSql: String =
    s"""WITH u AS (
       |  SELECT user_id, ts, 0 AS tag, event_id,
       |         {'r_value': value, 'r_event_id': event_id,
       |          'r_ts': epoch_us(ts)} AS r
       |  FROM events WHERE event_type = 'signup'
       |  UNION ALL
       |  SELECT user_id, ts, 1 AS tag, event_id,
       |         CAST(NULL AS STRUCT(r_value DOUBLE, r_event_id BIGINT, r_ts BIGINT)) AS r
       |  FROM events WHERE event_type = 'purchase'
       |), a AS (
       |  SELECT user_id, ts, tag, event_id,
       |         last_value(r IGNORE NULLS) OVER w AS att
       |  FROM u
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag, event_id
       |               ROWS UNBOUNDED PRECEDING)
       |), t AS (
       |  SELECT event_id, user_id, ts,
       |         CASE WHEN epoch_us(ts) - struct_extract(att, 'r_ts')
       |                   <= CAST(259200000000 AS BIGINT)
       |              THEN att END AS att
       |  FROM a WHERE tag = 1
       |)
       |SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       |       struct_extract(att, 'r_value') AS asof_value,
       |       struct_extract(att, 'r_event_id') AS asof_event_id
       |FROM t
       |""".stripMargin

  /** Row-atomic oracle: the right row's values travel in ONE struct
    * through last_value(IGNORE NULLS) — the struct is non-null on every
    * signup row (even with a null value field), so attribution picks a
    * single real signup row, matching pandas-merge_asof semantics. */
  lazy val eventsAsofJoinSql: String =
    s"""WITH u AS (
       |  SELECT user_id, ts, 0 AS tag, event_id,
       |         {'r_value': CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END,
       |          'r_event_id': event_id} AS r
       |  FROM events WHERE event_type = 'signup'
       |  UNION ALL
       |  SELECT user_id, ts, 1 AS tag, event_id,
       |         CAST(NULL AS STRUCT(r_value DOUBLE, r_event_id BIGINT)) AS r
       |  FROM events WHERE event_type = 'purchase'
       |), a AS (
       |  SELECT user_id, ts, tag, event_id,
       |         last_value(r IGNORE NULLS) OVER w AS att
       |  FROM u
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag, event_id
       |               ROWS UNBOUNDED PRECEDING)
       |)
       |SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       |       struct_extract(att, 'r_value') AS asof_value,
       |       struct_extract(att, 'r_event_id') AS asof_event_id
       |FROM a WHERE tag = 1
       |""".stripMargin

  // ================================================================ SCD Type-2 history
  /** SCD2 dimension history from the click change log: each user's
    * props.k band (k % 4, coarse so consecutive-duplicate compression
    * is exercised — 210 changes collapse to 153 versions at sf0.001)
    * becomes versioned rows with half-open validity intervals. One
    * exchange (Scd2Spec pins it); extends the reference's Type-1
    * populate family to the "what was the value THEN" shape. */
  def dimScd2History(s: SparkSession, dir: String): DataFrame = {
    // a non-matching props row extracts '' — null the band instead of
    // letting the ANSI cast throw (mirrored with NULLIF in the oracle)
    val raw = regexp_extract(col("props"), "\"k\": (\\d+)", 1)
    val log = events(s, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        (when(raw === "", lit(null)).otherwise(raw).cast("int") % 4).as("band"))
    operators.Scd2.history(log, "user_id", "ts", "event_id", Seq("band"))
      .select(col("user_id"), col("event_id"), col("band"),
        col("valid_from_us"), col("valid_to_us"), col("version"), col("is_current"))
  }

  lazy val dimScd2HistorySql: String =
    s"""WITH log AS (
       |  SELECT user_id, ts, event_id,
       |         CAST(NULLIF(regexp_extract(props, '"k": (\\d+)', 1), '') AS INTEGER) % 4 AS band
       |  FROM events WHERE event_type = 'click'
       |), f AS (
       |  SELECT user_id, ts, event_id, band,
       |         CASE WHEN lag(ts) OVER w IS NULL
       |                OR band IS DISTINCT FROM lag(band) OVER w
       |              THEN 1 ELSE 0 END AS opens
       |  FROM log
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), v AS (
       |  SELECT user_id, ts, event_id, band FROM f WHERE opens = 1
       |)
       |SELECT user_id, event_id, band,
       |       epoch_us(ts) AS valid_from_us,
       |       lead(epoch_us(ts)) OVER w2 AS valid_to_us,
       |       CAST(row_number() OVER w2 AS INTEGER) AS version,
       |       (lead(ts) OVER w2 IS NULL) AS is_current
       |FROM v
       |WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
       |""".stripMargin

  // ================================================================ SCD2 incremental merge
  /** Incremental SCD2 maintenance gated against the FULL-history
    * oracle: history built from the first 20 days of clicks, then the
    * remaining days merged in ([[operators.Scd2.merge]] — untouched
    * keys pass through a left-anti, only keys with new changes
    * re-derive). The global time split keeps per-key arrival order, so
    * the merged result must hash-match the one-shot rebuild — the same
    * incremental-equals-full contract `dim_populate_incremental` pins
    * for Type-1 populates. */
  def dimScd2Incremental(s: SparkSession, dir: String): DataFrame = {
    val raw = regexp_extract(col("props"), "\"k\": (\\d+)", 1)
    val log = events(s, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        (when(raw === "", lit(null)).otherwise(raw).cast("int") % 4).as("band"))
    val split = lit("2024-01-21 00:00:00").cast("timestamp")
    val base = operators.Scd2.history(
      log.filter(col("ts") < split), "user_id", "ts", "event_id", Seq("band"))
    operators.Scd2.merge(
      base, log.filter(col("ts") >= split), "user_id", "ts", "event_id", Seq("band"))
      .select(col("user_id"), col("event_id"), col("band"),
        col("valid_from_us"), col("valid_to_us"), col("version"), col("is_current"))
  }

  // ================================================================ interval (range) join
  /** Point-in-interval join: purchases matched into the same user's
    * 1-day-gap CLICK sessions (which purchase happened during an
    * active browsing session). The inequality predicate is rewritten
    * as an equi-join on a 1-day time bin ([[operators.Intervals]]) —
    * the plan is a plain shuffled join, not the
    * BroadcastNestedLoopJoin a raw BETWEEN join degenerates to
    * (IntervalsSpec pins the plan shape). 16/144/1435 hits at
    * sf0.001/0.01/0.1. */
  def eventsIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val sessions = Sessions.sessionStats(
      Sessions.sessionize(ev.filter(col("event_type") === "click"),
        "user_id", "ts", "event_id", gapSeconds = 86400L),
      "user_id", "ts", "value")
      .select(col("user_id"), col("session_seq"), col("start_us"), col("end_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    operators.Intervals.intervalJoin(
      purchases, sessions, Seq("user_id"),
      pointUsCol = "ts_us", startUsCol = "start_us", endUsCol = "end_us",
      binMicros = 86400L * 1000000L)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("session_seq"), col("start_us"), col("end_us"))
  }

  lazy val eventsIntervalJoinSql: String =
    s"""WITH clicks AS (
       |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
       |), flagged AS (
       |  SELECT user_id, ts, event_id,
       |         CASE WHEN lag(ts) OVER w IS NULL THEN 1
       |              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 86400000000 THEN 1
       |              ELSE 0 END AS is_new
       |  FROM clicks
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), assigned AS (
       |  SELECT user_id, ts,
       |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
       |  FROM flagged
       |), sess AS (
       |  SELECT user_id, session_seq,
       |         min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
       |  FROM assigned GROUP BY 1, 2
       |)
       |SELECT p.user_id, p.event_id, epoch_us(p.ts) AS ts_us,
       |       s.session_seq, s.start_us, s.end_us
       |FROM events p
       |JOIN sess s ON p.user_id = s.user_id
       |           AND epoch_us(p.ts) BETWEEN s.start_us AND s.end_us
       |WHERE p.event_type = 'purchase'
       |""".stripMargin

  // ================================================================ CDC latest-wins merge
  /** Latest-wins compaction of a change stream (the CDC/upsert
    * primitive behind SCD Type-1 MERGE): one surviving row per key,
    * the (ts, tie)-greatest. Built as `max_by` over a payload struct —
    * a PARTIAL-AGGREGABLE form: map-side combine keeps one candidate
    * row per key per task before the single shuffle, where the
    * window-row_number alternative must shuffle and sort EVERY change.
    * The oracle is that window form — proving the aggregate shortcut
    * equals the sort-based definition. */
  def dimMergeLatest(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("ts"), col("event_id"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("last"))
      .select(col("user_id"),
        unix_micros(col("last.ts")).as("ts_us"),
        col("last.event_id"), col("last.event_type"), col("last.value"))

  lazy val dimMergeLatestSql: String =
    s"""WITH r AS (
       |  SELECT user_id, ts, event_id, event_type, value,
       |         row_number() OVER (PARTITION BY user_id
       |                            ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM events
       |)
       |SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value
       |FROM r WHERE rn = 1
       |""".stripMargin

  /** Snapshot diff of the CDC latest-wins state at two cutoffs: users
    * first seen after the cut are `added`, users with later activity
    * are `changed` (nothing is `removed` in an append-only log — the
    * branch is spec-covered). */
  def dimSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    def stateBefore(hi: Option[java.sql.Timestamp]): DataFrame = {
      val base = events(s, dir)
      hi.fold(base)(h => base.filter(col("ts") < lit(h)))
        .groupBy(col("user_id"))
        .agg(max_by(
          struct(col("ts"), col("event_id"), col("event_type"), col("value")),
          struct(col("ts"), col("event_id"))).as("last"))
        .select(col("user_id"),
          unix_micros(col("last.ts")).as("ts_us"),
          col("last.event_id"), col("last.event_type"), col("last.value"))
    }
    graft.operators.Snapshot.diff(
      stateBefore(Some(java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))),
      stateBefore(None), Seq("user_id"))
  }

  lazy val dimSnapshotDiffSql: String = {
    def state(where: String, name: String): String =
      s"""r_$name AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value,
         |         row_number() OVER (PARTITION BY user_id
         |                            ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM events $where),
         |$name AS (SELECT user_id, ts_us, event_id, event_type, value
         |          FROM r_$name WHERE rn = 1)""".stripMargin
    s"""WITH ${state("WHERE ts < TIMESTAMP '2024-01-02 00:00:00'", "b")},
       |${state("", "a")}
       |SELECT coalesce(a.user_id, b.user_id) AS user_id,
       |       CASE WHEN b.user_id IS NULL THEN 'added'
       |            WHEN a.user_id IS NULL THEN 'removed'
       |            WHEN (b.ts_us IS DISTINCT FROM a.ts_us)
       |              OR (b.event_id IS DISTINCT FROM a.event_id)
       |              OR (b.event_type IS DISTINCT FROM a.event_type)
       |              OR (b.value IS DISTINCT FROM a.value) THEN 'changed'
       |       END AS change
       |FROM b FULL OUTER JOIN a ON a.user_id = b.user_id
       |WHERE (b.user_id IS NULL OR a.user_id IS NULL
       |       OR (b.ts_us IS DISTINCT FROM a.ts_us)
       |       OR (b.event_id IS DISTINCT FROM a.event_id)
       |       OR (b.event_type IS DISTINCT FROM a.event_type)
       |       OR (b.value IS DISTINCT FROM a.value))
       |""".stripMargin
  }

  /** Per-type CDF normalization: percent_rank of each value within its
    * event type — the score-normalization primitive that puts
    * heterogeneous quality signals (LM score, length, diversity) on a
    * common [0,1] scale before combining them in a curation policy.
    * `(rank−1)/(n−1)` is one IEEE division of exact integers, so both
    * engines agree bit-for-bit; ties share a rank by definition, which
    * makes the result order-independent. One exchange (the window). */
  def eventsPercentRank(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("value").asc_nulls_first)
    events(s, dir).select(col("event_id"), col("event_type"),
      round(percent_rank().over(w), 9).as("pct"))
  }

  lazy val eventsPercentRankSql: String =
    s"""SELECT event_id, event_type,
       |       round(percent_rank() OVER (PARTITION BY event_type
       |                                  ORDER BY value ASC NULLS FIRST), 9) AS pct
       |FROM events
       |""".stripMargin

  /** Median/MAD robust z-score per event type
    * ([[graft.operators.Winsorize.robustZ]]) — discrete order-statistic
    * medians, bit-identical across engines. */
  def eventsRobustZ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Winsorize
      .robustZ(events(s, dir), Seq("event_type"), "value", "event_id")
      .select(col("event_id"), col("event_type"),
        round(col("value_rz"), 9).as("rz"))

  lazy val eventsRobustZSql: String =
    s"""WITH ranked AS (
       |  SELECT event_id, event_type, value,
       |         row_number() OVER (PARTITION BY event_type
       |                            ORDER BY value, event_id) AS rn,
       |         count(*) OVER (PARTITION BY event_type) AS n
       |  FROM events WHERE value IS NOT NULL
       |), med AS (
       |  SELECT *, max(CASE WHEN rn = (n + 1) // 2 THEN value END)
       |              OVER (PARTITION BY event_type) AS m
       |  FROM ranked
       |), dev AS (
       |  SELECT *, abs(value - m) AS d,
       |         row_number() OVER (PARTITION BY event_type
       |                            ORDER BY abs(value - m), event_id) AS dn
       |  FROM med
       |), mad AS (
       |  SELECT *, max(CASE WHEN dn = (n + 1) // 2 THEN d END)
       |              OVER (PARTITION BY event_type) AS md
       |  FROM dev
       |)
       |SELECT event_id, event_type,
       |       round(CASE WHEN md > 0 THEN (value - m) / md END, 9) AS rz
       |FROM mad
       |""".stripMargin

  /** Per-type winsorization of `value` at the discrete [p05, p95]
    * band — exact order-statistic edges, no interpolation. */
  def eventsWinsorize(s: SparkSession, dir: String): DataFrame =
    graft.operators.Winsorize.winsorize(
      events(s, dir).select(col("event_id"), col("event_type"), col("value")),
      Seq("event_type"), "value", "event_id", loPct = 5, hiPct = 95)

  lazy val eventsWinsorizeSql: String =
    s"""WITH rk AS (
       |  SELECT event_id, event_type, value,
       |         row_number() OVER (PARTITION BY event_type
       |                            ORDER BY value, event_id) AS rn,
       |         count(*) OVER (PARTITION BY event_type) AS n
       |  FROM events WHERE value IS NOT NULL),
       |bounds AS (
       |  SELECT event_type,
       |         max(CASE WHEN rn = ((5 * n) + 99) // 100 THEN value END) AS lo,
       |         max(CASE WHEN rn = ((95 * n) + 99) // 100 THEN value END) AS hi
       |  FROM rk GROUP BY 1)
       |SELECT r.event_id, r.event_type, r.value,
       |       least(greatest(r.value, b.lo), b.hi) AS value_wins
       |FROM rk r JOIN bounds b USING (event_type)
       |""".stripMargin

  // ================================================================ value histogram
  /** Equal-width value histogram per event type (bin = floor(v/10)):
    * the distribution-profiling primitive. One map-side-combined
    * shuffle of |types| x |bins| groups; counts and decimal-exact sums
    * re-aggregate to coarser bins without rescanning. */
  def eventsHistogram(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"),
        floor(col("value") / 10.0).cast("long").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("value_sum"))
      .withColumn("bin_lo", col("bin").cast("double") * 10.0)

  lazy val eventsHistogramSql: String =
    s"""SELECT event_type, CAST(floor(value/10.0) AS BIGINT) AS bin,
       |       CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
       |       CAST(CAST(floor(value/10.0) AS BIGINT) AS DOUBLE) * 10.0 AS bin_lo
       |FROM events
       |GROUP BY 1, 2
       |""".stripMargin

  /** Calendar densification (gap-fill): daily event counts per type
    * INCLUDING explicit zero rows for days with no events of that
    * type — the scaffolding every downstream rolling/anomaly window
    * needs (a missing row is silently skipped by a window frame; an
    * explicit zero participates). The day spine is a 1-row min/max
    * aggregate exploded via sequence (|days| rows, broadcast), cross
    * joined with the |types| dimension — scaffold size is
    * |days|x|types| regardless of event volume, then one left join
    * against the partial-aggregated counts. */
  def eventsGapfill(s: SparkSession, dir: String): DataFrame =
    graft.operators.Temporal.gapFillDaily(events(s, dir), "ts", "event_type")

  lazy val eventsGapfillSql: String =
    s"""WITH bounds AS (
       |  SELECT CAST(min(floor(epoch(ts)/86400)) AS BIGINT) AS lo,
       |         CAST(max(floor(epoch(ts)/86400)) AS BIGINT) AS hi
       |  FROM events),
       |spine AS (SELECT unnest(generate_series(lo, hi)) AS ts_day_id FROM bounds),
       |types AS (SELECT DISTINCT event_type FROM events),
       |c AS (
       |  SELECT CAST(floor(epoch(ts)/86400) AS BIGINT) AS ts_day_id,
       |         event_type, CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2)
       |SELECT s.ts_day_id, t.event_type, coalesce(c.n, 0) AS n
       |FROM spine s CROSS JOIN types t
       |LEFT JOIN c ON c.ts_day_id = s.ts_day_id AND c.event_type = t.event_type
       |""".stripMargin

  /** Time-weighted average value per user: each reading held until the
    * next, exact decimal*us mass, one final double division — see
    * [[graft.operators.Temporal.timeWeightedAvg]]. */
  def eventsTwa(s: SparkSession, dir: String): DataFrame =
    graft.operators.Temporal.timeWeightedAvg(
      events(s, dir), Seq("user_id"), "ts", "value", "event_id")

  lazy val eventsTwaSql: String =
    // mass in exact integral micro-units; `//` is floor division,
    // mirroring the operator's explicit floor — the only float step is
    // small-int -> double / 1e6
    s"""WITH seg AS (
       |  SELECT user_id,
       |         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS vu,
       |         epoch_us(ts) AS tus,
       |         lead(epoch_us(ts)) OVER (PARTITION BY user_id
       |                                  ORDER BY ts, event_id) AS nxt
       |  FROM events WHERE value IS NOT NULL)
       |SELECT user_id,
       |       CAST((sum(vu * (nxt - tus)) // CAST(sum(nxt - tus) AS HUGEINT)) AS DOUBLE)
       |         / 1000000.0 AS twa,
       |       CAST(sum(nxt - tus) AS BIGINT) AS span_us,
       |       count(*) AS segments
       |FROM seg WHERE nxt IS NOT NULL
       |GROUP BY 1
       |""".stripMargin

  /** Equi-depth histogram: 8 equal-count bins per event type via
    * ntile over a TOTAL order (value, event_id tie-break — both
    * engines agree on every bin boundary). Bin edges are existing
    * input doubles (min/max picks, no float arithmetic), so the
    * oracle matches exactly. One per-group sort exchange; at extreme
    * per-group cardinality the approx-percentile sketch
    * (`events_percentiles_approx`) is the documented edge-estimation
    * swap, with this as the exact shape. */
  def eventsHistogramEquidepth(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), ntile(8).over(w).as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"),
        count(lit(1)).as("n"))
  }

  lazy val eventsHistogramEquidepthSql: String =
    s"""SELECT event_type, bin, min(value) AS lo, max(value) AS hi,
       |       count(*) AS n
       |FROM (
       |  SELECT event_type, value,
       |         ntile(8) OVER (PARTITION BY event_type
       |                        ORDER BY value, event_id) AS bin
       |  FROM events WHERE value IS NOT NULL
       |)
       |GROUP BY 1, 2
       |""".stripMargin

  // ================================================================ typed JSON extraction
  /** Semi-structured handling: the props JSON column parsed with a
    * TYPED schema (`from_json`, not regexp) and aggregated per event
    * type — the "land raw JSON, query it typed" capability every
    * event pipeline needs. Parsing is scan-local and codegen'd; the
    * aggregate is one map-side-combined shuffle of 5 groups. */
  def eventsPropsTyped(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"),
        from_json(col("props"), "k INT", Map.empty[String, String]).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        count(col("k")).as("n_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .withColumn("avg_k",
        col("sum_k").cast("double") / col("n_k").cast("double"))

  lazy val eventsPropsTypedSql: String =
    s"""SELECT event_type,
       |       CAST(count(*) AS BIGINT) AS n,
       |       CAST(count(k) AS BIGINT) AS n_k,
       |       CAST(sum(k) AS BIGINT) AS sum_k,
       |       min(k) AS min_k, max(k) AS max_k,
       |       CAST(sum(k) AS DOUBLE) / CAST(count(k) AS DOUBLE) AS avg_k
       |FROM (SELECT event_type,
       |             CAST(json_extract_string(props, '$$.k') AS INTEGER) AS k
       |      FROM events)
       |GROUP BY 1
       |""".stripMargin

  // ================================================================ z-order layout key
  /** Morton key over (user_id, day): the multi-dimensional layout
    * primitive — files sorted by this key have tight min/max ranges in
    * BOTH dimensions, so scans filtered on either prune (the
    * Delta/Iceberg OPTIMIZE ZORDER trick, as a plain sort key). Pure
    * integer shift/mask pipeline, fully codegen'd, scan-local; the
    * oracle mirrors the exact constants (ZOrderSpec also checks the
    * curve against an independent bit-by-bit Morton reference). */
  def eventsZorder(s: SparkSession, dir: String): DataFrame = {
    val dayId = floor(unix_timestamp(col("ts")) / 86400L).cast("long")
    events(s, dir).select(
      col("event_id"), col("user_id"), dayId.as("day_id"),
      graft.functions.ZOrder.zValue(col("user_id"), dayId).as("zval"))
  }

  lazy val eventsZorderSql: String =
    graft.functions.ZOrder.zValueQuerySql(
      fromSql =
        """(SELECT event_id, user_id,
          |        CAST(floor(epoch(ts)/86400) AS BIGINT) AS day_id
          | FROM events)""".stripMargin,
      keepCols = Seq("event_id", "user_id", "day_id"),
      a = "user_id", b = "day_id") + "\n"

  /** 3-dimensional Morton key over (user_id, day, hour-of-day): the
    * N-column generalization ([[graft.functions.ZOrder.zValueN]], 21
    * bits per lane). Same gate shape as [[eventsZorder]]; the oracle
    * mirrors the flat shift/mask term list bit-for-bit. */
  def eventsZorder3(s: SparkSession, dir: String): DataFrame = {
    val dayId  = floor(unix_timestamp(col("ts")) / 86400L).cast("long")
    val hourId = pmod(floor(unix_timestamp(col("ts")) / 3600L), lit(24L)).cast("long")
    events(s, dir).select(
      col("event_id"), col("user_id"),
      dayId.as("day_id"), hourId.as("hour_id"),
      graft.functions.ZOrder.zValueN(
        Seq(col("user_id"), dayId, hourId)).as("zval"))
  }

  lazy val eventsZorder3Sql: String =
    graft.functions.ZOrder.zValueNQuerySql(
      fromSql =
        """(SELECT event_id, user_id,
          |        CAST(floor(epoch(ts)/86400) AS BIGINT) AS day_id,
          |        CAST(floor(epoch(ts)/3600) % 24 AS BIGINT) AS hour_id
          | FROM events)""".stripMargin,
      keepCols = Seq("event_id", "user_id", "day_id", "hour_id"),
      coords = Seq("user_id", "day_id", "hour_id")) + "\n"

  // ================================================================ conversion lag
  /** Daily view->purchase conversion: per (user, day), the first view
    * and the first purchase at-or-after it; cohorted by day into
    * viewer-days, conversions, rate, and mean lag. ONE exchange: the
    * seen-view running flag, the (user, day) aggregation, and the
    * day cohort rollup all derive from the same (user, day) hash
    * partitioning (the cohort agg is a map-side-combined re-shuffle of
    * 30 x |users| rows — negligible). 32/343/3290 of 153/1617/16125
    * viewer-days convert at sf0.001/0.01/0.1, so both outcomes are
    * exercised at every sf. */
  def eventsConversion(s: SparkSession, dir: String): DataFrame = {
    val withDay = events(s, dir)
      .withColumn("day_id", floor(unix_timestamp(col("ts")) / 86400L).cast("long"))
    val order = Window.partitionBy(col("user_id"), col("day_id"))
      .orderBy(col("ts").asc_nulls_last, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seenView = max(when(col("event_type") === "view", 1).otherwise(0)).over(order)
    val perUserDay = withDay
      .withColumn("seen_view", seenView)
      .groupBy(col("user_id"), col("day_id"))
      .agg(
        min(when(col("event_type") === "view", unix_micros(col("ts")))).as("fv"),
        min(when(col("event_type") === "purchase" && col("seen_view") === 1,
          unix_micros(col("ts")))).as("fp"))
      .filter(col("fv").isNotNull)
    perUserDay
      .groupBy(col("day_id"))
      .agg(
        count(lit(1)).as("viewer_days"),
        count(col("fp")).as("converted"),
        sum(col("fp") - col("fv")).as("sum_lag_us"))
      .withColumn("conv_rate",
        col("converted").cast("double") / col("viewer_days").cast("double"))
      .withColumn("avg_lag_us",
        when(col("converted") > 0,
          col("sum_lag_us").cast("double") / col("converted").cast("double")))
  }

  lazy val eventsConversionSql: String =
    s"""WITH o AS (
       |  SELECT user_id, CAST(floor(epoch(ts)/86400) AS BIGINT) AS day_id,
       |         ts, event_id, event_type,
       |         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY user_id, CAST(floor(epoch(ts)/86400) AS BIGINT)
       |                 ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS seen_view
       |  FROM events
       |), ud AS (
       |  SELECT user_id, day_id,
       |         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS fv,
       |         min(CASE WHEN event_type = 'purchase' AND seen_view = 1
       |                  THEN epoch_us(ts) END) AS fp
       |  FROM o GROUP BY 1, 2
       |)
       |SELECT day_id,
       |       CAST(count(*) AS BIGINT) AS viewer_days,
       |       CAST(count(fp) AS BIGINT) AS converted,
       |       CAST(sum(fp - fv) AS BIGINT) AS sum_lag_us,
       |       CAST(count(fp) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS conv_rate,
       |       CASE WHEN count(fp) > 0
       |            THEN CAST(sum(fp - fv) AS DOUBLE) / CAST(count(fp) AS DOUBLE)
       |       END AS avg_lag_us
       |FROM ud WHERE fv IS NOT NULL
       |GROUP BY 1
       |""".stripMargin
}
