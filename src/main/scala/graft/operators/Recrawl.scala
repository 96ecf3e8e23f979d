package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Recrawl / freshness scheduling — the loop that keeps a crawled
  * corpus FRESH rather than merely built: discovery channels emit
  * change hints (sitemap `lastmod`/`changefreq` — sitemaps.org
  * protocol; feed `updated` — RFC 4287 §4.2.15), a last-fetch record
  * says when each URL was last captured, and the next frontier is the
  * subset that is DUE. Without this, a nightly pipeline either
  * re-fetches everything (wasted fetch budget at 100 TB) or fetches
  * nothing twice (a corpus that rots).
  *
  * The due rule, deterministic and fully relational (first match
  * wins):
  *
  *  1. `new` — no last-fetch record: never captured, always due;
  *  2. `modified` — the discovered `lastmod` parses and is STRICTLY
  *     newer than the last fetch: the publisher says it changed;
  *  3. `aged` — the time since last fetch reaches the URL's revisit
  *     interval: its `changefreq` value if recognized
  *     ([[changefreqAgeS]] — `always`=0 means every pass, `never`
  *     means age alone never re-crawls it), else `defaultAgeS`.
  *
  * Everything else is not due. Unparseable `lastmod` values are
  * change-hint NO-OPs (rule 2 skipped, rule 3 still applies) — hand-
  * written sitemaps are full of junk dates and a crawler must not
  * stall on them.
  *
  * Scale shape: one equi-join between the discovery batch and the
  * last-fetch table on the URL key — both sides shuffle-partition on
  * the declared key (or the store side arrives bucket-pruned from
  * [[graft.streaming.StreamingRecrawl]]); the verdict itself is a
  * scan-local codegen'd CASE over the joined row. No window, no
  * explode, no driver loop.
  */
object Recrawl {

  /** sitemaps.org `changefreq` → revisit interval in seconds; NULL for
    * unrecognized values (callers fall back to their default), -1
    * sentinel never returned. `never` maps to NULL here and is handled
    * as its own branch in [[dueVerdicts]] (age alone must not re-crawl
    * it). Case-insensitive, whitespace-trimmed. */
  private def changefreqAgeS(changefreq: Column): Column = {
    val cf = lower(trim(changefreq))
    when(cf === "always", lit(0L))
      .when(cf === "hourly", lit(3600L))
      .when(cf === "daily", lit(86400L))
      .when(cf === "weekly", lit(604800L))
      .when(cf === "monthly", lit(2592000L))
      .when(cf === "yearly", lit(31536000L))
      .otherwise(lit(null).cast("long"))
  }

  /** Annotate a discovery batch with its recrawl verdict:
    * `recrawl_due` (boolean) and `recrawl_reason`
    * (`new` | `modified` | `aged`, NULL when not due).
    *
    * `lastFetch` carries `(urlCol, last_fetch_ts)` — epoch seconds of
    * the most recent capture, one row per URL (a duplicate raises
    * in-plan: two fetch records for one URL means a corrupt store,
    * and silently joining both would fan the frontier out).
    * `lastmodCol`/`changefreqCol` name discovery columns; pass
    * columns holding `""`/NULL when a channel has no hints (feeds
    * have `updated` but no changefreq). `nowTs` is the scheduling
    * instant (epoch seconds), explicit for determinism. */
  def dueVerdicts(
      discovered: DataFrame, urlCol: String, lastmodCol: String, changefreqCol: String,
      lastFetch: DataFrame, nowTs: Long, defaultAgeS: Long
  ): DataFrame = {
    Seq(urlCol, "last_fetch_ts").foreach(needed =>
      require(lastFetch.columns.contains(needed),
        s"dueVerdicts: lastFetch frame has no column '$needed' — " +
          "pass (url, last_fetch_ts) rows"))
    verdictsCore(discovered, urlCol, lastmodCol, changefreqCol,
      lastFetch.select(col(urlCol), col("last_fetch_ts"), lit(1L).as("__scale")),
      nowTs, defaultAgeS)
  }

  /** [[dueVerdicts]] with ADAPTIVE revisit intervals — the change-rate
    * feedback loop (Cho & Garcia-Molina 2003, "Effective page refresh
    * policies for Web crawlers"): `lastFetch` additionally carries
    * `unchanged_streak`, the count of consecutive re-fetches whose
    * content fingerprint was unchanged ([[changeVerdicts]] /
    * [[graft.streaming.StreamingRecrawl.applyFetchBatch]] maintain
    * it), and the `aged` rule's interval stretches to
    * `base · 2^min(streak, maxBackoffShift)` — a page that keeps NOT
    * changing is visited exponentially less often, reclaiming fetch
    * budget for pages that do change. A NULL streak (a store predating
    * the column, or a never-compared URL) counts 0 = no backoff. The
    * `modified` rule is UNTOUCHED: a publisher-declared change beats
    * any backoff, so a stable page that finally changes re-enters on
    * its next listing; `new` and `never` are unchanged too. */
  def dueVerdictsAdaptive(
      discovered: DataFrame, urlCol: String, lastmodCol: String, changefreqCol: String,
      lastFetch: DataFrame, nowTs: Long, defaultAgeS: Long,
      maxBackoffShift: Int = 5
  ): DataFrame = {
    require(maxBackoffShift >= 0 && maxBackoffShift <= 20,
      s"maxBackoffShift must be in [0, 20], got $maxBackoffShift")
    Seq(urlCol, "last_fetch_ts", "unchanged_streak").foreach(needed =>
      require(lastFetch.columns.contains(needed),
        s"dueVerdictsAdaptive: lastFetch frame has no column '$needed' — " +
          "pass (url, last_fetch_ts, unchanged_streak) rows"))
    val scale = expr(
      s"shiftleft(1L, cast(least(coalesce(unchanged_streak, 0L), " +
        s"${maxBackoffShift}L) as int))")
    verdictsCore(discovered, urlCol, lastmodCol, changefreqCol,
      lastFetch.select(col(urlCol), col("last_fetch_ts"), scale.as("__scale")),
      nowTs, defaultAgeS)
  }

  /** Shared verdict core; `lf` carries `(urlCol, last_fetch_ts,
    * __scale)` where `__scale` multiplies the aged rule's interval. */
  private def verdictsCore(
      discovered: DataFrame, urlCol: String, lastmodCol: String, changefreqCol: String,
      lf0: DataFrame, nowTs: Long, defaultAgeS: Long
  ): DataFrame = {
    require(defaultAgeS >= 0, s"defaultAgeS must be >= 0, got $defaultAgeS")
    Seq(urlCol, lastmodCol, changefreqCol).foreach(needed =>
      require(discovered.columns.contains(needed),
        s"dueVerdicts: discovery frame has no column '$needed'"))
    Seq("recrawl_due", "recrawl_reason", "__lf_ts", "__lf_url", "__lf_scale")
      .foreach(t => require(!discovered.columns.contains(t),
        s"dueVerdicts: input already has column '$t'"))

    // one fetch record per URL, fail-loud (the duplicateKeyGuard idiom:
    // filter-anchored so pruning cannot drop the raise)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__lf_url"))
    val lf = lf0
      .select(col(urlCol).cast("string").as("__lf_url"),
        col("last_fetch_ts").cast("long").as("__lf_ts"),
        col("__scale").cast("long").as("__lf_scale"))
      .withColumn("__ok",
        when(count(lit(1)).over(w) > 1,
          raise_error(concat(lit("Recrawl.dueVerdicts: URL "), col("__lf_url"),
            lit(" has more than one last-fetch record — corrupt fetch log"))))
          .otherwise(lit(true)))
      .filter(col("__ok")).drop("__ok")

    val joined = discovered.join(lf,
      discovered(urlCol).cast("string") === lf("__lf_url"), "left")

    val lastmodTs = unix_timestamp(try_to_timestamp(
      nullif(trim(col(lastmodCol)), lit(""))))
    val cf = lower(trim(col(changefreqCol)))
    val interval = coalesce(changefreqAgeS(col(changefreqCol)), lit(defaultAgeS)) *
      coalesce(col("__lf_scale"), lit(1L))
    val age = lit(nowTs) - col("__lf_ts")
    val reason =
      when(col("__lf_ts").isNull, lit("new"))
        .when(lastmodTs.isNotNull && lastmodTs > col("__lf_ts"), lit("modified"))
        .when(!(cf <=> lit("never")) && age >= interval, lit("aged"))
        .otherwise(lit(null).cast("string"))
    joined
      .withColumn("recrawl_reason", reason)
      .withColumn("recrawl_due", col("recrawl_reason").isNotNull)
      .drop("__lf_url", "__lf_ts", "__lf_scale")
  }

  /** Post-fetch change detection — the other half of the freshness
    * loop: [[dueVerdicts]] decides what to RE-FETCH; this decides what
    * a completed re-fetch should RE-PROCESS. Each fetched row's content
    * fingerprint (`fpCol` — any stable content address: text md5,
    * pixel_md5) compares against the URL's last-known fingerprint
    * (`lastFp` — `(url, last_fp)` rows, one per URL, duplicate rows
    * fail loud like the fetch log's). Output columns:
    *   - `change_kind`: `new` (no prior fingerprint), `changed`
    *     (fingerprints differ), `unchanged` (null-safe equal)
    *   - `content_changed`: kind ≠ unchanged — the downstream
    *     suppression predicate (an unchanged re-fetch must not re-run
    *     extraction/dedup/annotation over identical bytes)
    * A NULL stored fingerprint counts as `new` (conservative:
    * re-process), a NULL batch fingerprint with a non-NULL stored one
    * counts as `changed` (the content address disappeared — something
    * upstream changed). Scale shape: one left equi-join on the URL
    * key + a scan-local CASE — the [[dueVerdicts]] plan shape. */
  def changeVerdicts(
      fetched: DataFrame, urlCol: String, fpCol: String, lastFp: DataFrame
  ): DataFrame = {
    Seq(urlCol, fpCol).foreach(needed =>
      require(fetched.columns.contains(needed),
        s"changeVerdicts: fetched frame has no column '$needed'"))
    Seq(urlCol, "last_fp").foreach(needed =>
      require(lastFp.columns.contains(needed),
        s"changeVerdicts: lastFp frame has no column '$needed' — " +
          "pass (url, last_fp) rows"))
    Seq("change_kind", "content_changed", "__cf_fp", "__cf_url", "__cf_seen")
      .foreach(t => require(!fetched.columns.contains(t),
        s"changeVerdicts: input already has column '$t'"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__cf_url"))
    val lf = lastFp
      .select(col(urlCol).cast("string").as("__cf_url"),
        col("last_fp").cast("string").as("__cf_fp"))
      .withColumn("__ok",
        when(count(lit(1)).over(w) > 1,
          raise_error(concat(lit("Recrawl.changeVerdicts: URL "), col("__cf_url"),
            lit(" has more than one fingerprint record — corrupt store"))))
          .otherwise(lit(true)))
      .filter(col("__ok")).drop("__ok")
      .withColumn("__cf_seen", lit(true))
    val joined = fetched.join(lf,
      fetched(urlCol).cast("string") === lf("__cf_url"), "left")
    val kind =
      when(col("__cf_seen").isNull || col("__cf_fp").isNull, lit("new"))
        .when(col(fpCol).cast("string") <=> col("__cf_fp"), lit("unchanged"))
        .otherwise(lit("changed"))
    joined
      .withColumn("change_kind", kind)
      .withColumn("content_changed", col("change_kind") =!= "unchanged")
      .drop("__cf_url", "__cf_fp", "__cf_seen")
  }
}
