package graft.operators

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** robots.txt — the Robots Exclusion Protocol (RFC 9309) — parsing and
  * URL admission: the step BETWEEN fetching and [[Warc]]/
  * [[TextAnalysis.extractHtml]] in a real crawl pipeline. A crawler
  * that ignores robots rules collects pages it must then discard (or
  * worse, ship); filtering the frontier/capture against the per-host
  * rule set is a first-class 100 TB curation operation.
  *
  * Semantics implemented (the RFC 9309 core, deterministic):
  *
  *  - line-oriented `field: value` records; `#` starts a comment;
  *    field names case-insensitive; CRLF and LF both accepted;
  *  - consecutive `user-agent` lines accumulate into ONE group; an
  *    `allow`/`disallow`/`crawl-delay` line ends the run (the next
  *    `user-agent` starts a new group) and attaches to every agent of
  *    the current group; rules before any group are ignored;
  *  - unknown fields are ignored entirely (they neither end a
  *    user-agent run nor start a group); `sitemap` is global — emitted
  *    with `group_idx = -1` and an empty agent;
  *  - agent tokens are matched case-insensitively (lowercased at parse
  *    time); rule paths are case-SENSITIVE (RFC);
  *  - matching: a rule applies when the URL's path-plus-query matches
  *    the rule path, where `*` matches any span and a TRAILING `$`
  *    anchors the end (a `$` elsewhere is literal); the most specific
  *    match — most octets in the rule as written — wins; on a tie,
  *    `allow` wins; no matching rule, no rule group, or no robots.txt
  *    for the host means ALLOWED (the RFC default);
  *  - group selection: the group matching the product token exactly
  *    (case-insensitive) if one exists for the host, else the `*`
  *    group;
  *  - an empty `disallow`/`allow` value is parsed (fidelity) but
  *    matches nothing — the traditional "allow everything" record; a
  *    rule path starting with neither `/` nor `*` is likewise inert.
  *
  * Scale shape: the rule table is bounded by hosts × rules-per-file
  * (RFC caps files at 500 KiB), so rules aggregate into ONE array row
  * per host and join to the URL corpus host-keyed — broadcast by
  * default ([[admissions]]' `broadcastRules`), a declared-key shuffle
  * join when a frontier spans too many hosts to broadcast. The
  * longest-match evaluation is a scan-local higher-order `filter` +
  * `array_max` over the per-host array: the corpus never shuffles and
  * never sees a per-rule row explosion.
  */
object Robots {

  /** One parsed rule line, exploded per group agent. `rule_idx` is the
    * file-order ordinal over emitted records (shared by the exploded
    * agent rows of one line). */
  final case class RobotsRule(
      robots_key: String,
      group_idx: Int,
      rule_idx: Int,
      agent: String,
      rule_type: String,
      value: String
  )

  /** Parse every rule of each row's robots.txt body (string column).
    * `keyCol` (any type; cast to string) keys the file — pass the host
    * for [[admissions]]. One `mapPartitions` pass, no shuffle. */
  def parseRules(df: DataFrame, keyCol: String, bodyCol: String): Dataset[RobotsRule] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(bodyCol)).as[(String, String)]
      .mapPartitions { it =>
        it.flatMap { case (key, body) =>
          parseString(if (key == null) "" else key, if (body == null) "" else body)
        }
      }
  }

  /** The parser core, exposed for specs: rules of one robots.txt
    * body. */
  private[graft] def parseString(key: String, body: String): Seq[RobotsRule] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[RobotsRule]
    val agents = scala.collection.mutable.ArrayBuffer.empty[String]
    var inUaRun = false
    var groupIdx = -1
    var ruleIdx = 0
    body.split("\r?\n", -1).foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      if (line.nonEmpty) {
        val sep = line.indexOf(':')
        if (sep > 0) { // no ':' or empty field name: not a record, ignore
          val field = line.substring(0, sep).trim.toLowerCase(Locale.ROOT)
          val value = line.substring(sep + 1).trim
          field match {
            case "user-agent" =>
              if (!inUaRun) { agents.clear(); groupIdx += 1 }
              inUaRun = true
              agents += value.toLowerCase(Locale.ROOT)
            case "allow" | "disallow" | "crawl-delay" =>
              inUaRun = false
              if (agents.nonEmpty) { // rules before any group: ignored
                agents.foreach { a =>
                  out += RobotsRule(key, groupIdx, ruleIdx, a, field, value)
                }
                ruleIdx += 1
              }
            case "sitemap" => // global record, outside any group
              out += RobotsRule(key, -1, ruleIdx, "", "sitemap", value)
              ruleIdx += 1
            case _ => () // unknown field: ignored, no state change
          }
        }
      }
    }
    out.toSeq
  }

  /** Lowercased host of a URL column (`""` for scheme-less strings) —
    * the robots join key. Host names are case-insensitive (RFC 3986).
    * Adversarial spellings normalize to the SAME key the rule table is
    * keyed by: `userinfo@` is stripped (greedily, through the LAST `@`
    * — an unencoded `@` in userinfo is exactly the robots-bypass
    * spelling this guards against) and the scheme's default port
    * (`:80` http, `:443` https — the [[TextAnalysis.normalizeUrl]]
    * convention) drops, so `http://user@h1.example.com:80/x` joins the
    * `h1.example.com` rules instead of being allowed by default. A
    * NON-default explicit port is kept: a different port is a
    * different authority with its own robots.txt (RFC 9309 §2.3). */
  def urlHost(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val h0 = lower(regexp_replace(auth, "^.*@", ""))
    when(scheme === "http", regexp_replace(h0, ":80$", ""))
      .when(scheme === "https", regexp_replace(h0, ":443$", ""))
      .otherwise(h0)
  }

  /** The path-plus-query a robots rule matches against: everything
    * after the authority, fragment dropped, empty path normalized to
    * `/` (RFC 9309 matches the path including the query string). */
  def urlPathQuery(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    when(url.isNull, lit(null))
      .when(rest === "", lit("/"))
      .when(substring(rest, 1, 1) === "?", concat(lit("/"), rest))
      .otherwise(rest)
  }

  // rule path -> anchored Java/RE2 regex, as Column arithmetic over the
  // SMALL rule table: trailing '$' detected first, every metacharacter
  // literal-escaped (backslash first), then the escaped '\*' becomes
  // '.*'. Valid in both Java (Spark) and RE2 (a DuckDB oracle) — the
  // redact discipline.
  private def ruleRegex(value: Column): Column = {
    val anchored = value.endsWith("$")
    val core = when(anchored, value.substr(lit(1), length(value) - 1)).otherwise(value)
    val escaped = Seq("\\", ".", "^", "$", "|", "?", "+", "(", ")", "[", "]", "{", "}", "*")
      .foldLeft(core) { (c, ch) => replace(c, lit(ch), lit("\\" + ch)) }
    concat(lit("^"), replace(escaped, lit("\\*"), lit(".*")),
      when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Annotate a URL corpus with its robots verdict: `robots_allowed`
    * (boolean) and `robots_rule` (the winning rule path as written,
    * NULL when no rule matched). `rules` is [[parseRules]] output
    * keyed by HOST (`robots_key`); `agent` is the crawler's product
    * token. A NULL url has no host and is allowed with a NULL rule.
    *
    * `broadcastRules = false` drops the broadcast hint for frontiers
    * whose distinct-host rule table is itself too large to broadcast —
    * the join then shuffles on the declared host key. */
  def admissions(
      urls: DataFrame, urlCol: String, rules: DataFrame, agent: String,
      broadcastRules: Boolean = true
  ): DataFrame = {
    val agentLc = agent.trim.toLowerCase(Locale.ROOT)
    require(agentLc.nonEmpty && agentLc != "*",
      s"agent must be a concrete product token, got '$agent'")
    Seq("robots_key", "agent", "rule_type", "value").foreach(needed =>
      require(rules.columns.contains(needed),
        s"admissions: rules frame has no column '$needed' — pass parseRules output " +
          s"keyed by host (got columns ${rules.columns.mkString(", ")})"))
    require(!urls.columns.contains("robots_allowed") && !urls.columns.contains("robots_rule"),
      "input already has robots_allowed/robots_rule columns — a second pass would clobber them")
    Seq("__uh", "__up", "__win").foreach(t => require(!urls.columns.contains(t),
      s"admissions: input already has internal column '$t'"))

    // effective allow/disallow rules for this agent: exact group if the
    // host has one, else the '*' group; empty and non-path values inert
    val r0 = rules.select(
        lower(col("robots_key")).as("__rh"), col("agent").as("__ra"),
        col("rule_type").as("__rt"), col("value").as("__rv"))
      .filter(col("__rt").isin("allow", "disallow") &&
        col("__ra").isin(agentLc, "*") &&
        (col("__rv").startsWith("/") || col("__rv").startsWith("*")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__rh"))
    val chosen = r0
      .withColumn("__he", max(when(col("__ra") === agentLc, 1).otherwise(0)).over(w))
      .filter(col("__ra") === agentLc || (col("__he") === 0 && col("__ra") === "*"))

    // one array row per host; struct field order IS the precedence
    // order (octets of the rule as written, then allow over disallow,
    // then the rule text for a total deterministic order)
    // lit_i = 1 marks a LITERAL-PREFIX rule — no '*' anywhere, no
    // trailing '$' anchor — the overwhelming majority of real robots
    // rules. Those evaluate with startswith on the path (a per-row
    // String.startsWith) instead of rlike, whose compiled-Pattern cache
    // is single-entry and thrashes across a per-host rule ARRAY —
    // at a 10M-host frontier that is a per-(row × rule)
    // Pattern.compile CPU constant. rlike remains for the wildcard/
    // anchored minority. lit_i sits AFTER the precedence fields so the
    // array_max struct order is untouched (prio, allow_i, rule is
    // already a total order).
    val grouped = chosen.groupBy(col("__rh")).agg(
      collect_list(struct(
        length(col("__rv")).as("prio"),
        when(col("__rt") === "allow", 1).otherwise(0).as("allow_i"),
        col("__rv").as("rule"),
        ruleRegex(col("__rv")).as("rx"),
        when(!col("__rv").contains("*") && !col("__rv").endsWith("$"), 1)
          .otherwise(0).as("lit_i"))).as("__rules"))
    val ruleSide = if (broadcastRules) broadcast(grouped) else grouped

    val withKey = urls
      .withColumn("__uh", urlHost(col(urlCol)))
      .withColumn("__up", urlPathQuery(col(urlCol)))
    val joined = withKey.join(ruleSide, withKey("__uh") === ruleSide("__rh"), "left")
    // scan-local longest-match: filter the per-host array — literal
    // prefixes via startswith, the wildcard/anchored minority via
    // RLIKE (which accepts a non-foldable pattern) — take the struct
    // max. The winner is staged as ONE column so the match runs once
    // per row (deriving two columns from the raw expression would
    // evaluate the whole filter+max twice).
    joined
      .withColumn("__win", array_max(expr(
        "filter(__rules, r -> CASE WHEN r.lit_i = 1 " +
          "THEN startswith(__up, r.rule) ELSE __up rlike r.rx END)")))
      .withColumn("robots_allowed",
        col("__win").isNull || col("__win").getField("allow_i") === 1)
      .withColumn("robots_rule", col("__win").getField("rule"))
      .drop("__uh", "__up", "__rh", "__rules", "__win")
  }

  /** Per-host crawl delays from [[parseRules]] output — the politeness
    * scheduler's input: `(robots_key, agent, crawl_delay_s)`, one row
    * per (host, agent) keeping the FIRST parseable crawl-delay record
    * (file order — the parser's rule_idx), fractional values floored,
    * unparseable/negative values ignored. The `crawl-delay` field is
    * the de-facto extension RFC 9309 leaves unspecified; scope
    * documented here. */
  def crawlDelays(rules: DataFrame): DataFrame = {
    // try_cast: ANSI mode must not abort the scan on a junk value —
    // unparseable records are IGNORED by contract, not fatal
    val delay = floor(expr("try_cast(value AS double)")).cast("int")
    rules
      .filter(col("rule_type") === "crawl-delay" && delay.isNotNull && delay >= 0)
      .groupBy(lower(col("robots_key")).as("robots_key"), col("agent"))
      .agg(min_by(delay, col("rule_idx")).as("crawl_delay_s"))
  }

  /** Politeness schedule over a frontier: each URL gets its host's
    * crawl delay ([[crawlDelays]] output; the agent's row if one
    * exists for the host, else the `*` row, else `defaultDelayS`), a
    * deterministic per-host fetch ordinal (`md5(url)` order — spreads
    * deep paths instead of crawling a directory in sequence), and
    * `fetch_offset_s = fetch_seq · crawl_delay_s` — the earliest
    * polite fetch time relative to the host's first request.
    *
    * Scale shape: the delay table is host-bounded and broadcasts; the
    * per-host sequencing is ONE declared shuffle on the host key (the
    * grouping IS the semantics), with per-host partitions bounded by
    * the frontier's own dedup. */
  def fetchSchedule(
      frontier: DataFrame, urlCol: String, delays: DataFrame, agent: String,
      defaultDelayS: Int = 1
  ): DataFrame =
    scheduleCore(frontier, urlCol, delays, agent, defaultDelayS,
      Seq(md5(col(urlCol)), col(urlCol)))

  /** [[fetchSchedule]] with importance-ordered per-host ordinals: each
    * URL joins its priority from `priorities` — `(node, rank_fp)`,
    * the [[graft.operators.Centrality.pageRank]] output over a link
    * graph whose nodes are the frontier's URLs — and the per-host
    * fetch order becomes `(rank_fp DESC NULLS LAST, md5(url), url)`:
    * high-centrality pages fetch first within each host's politeness
    * budget, URLs absent from the link graph fall behind ranked ones
    * in the md5-decorrelated order, and a `maxPerHost` cap downstream
    * keeps the IMPORTANT subset instead of a random sample. The
    * priority survives as a `priority_fp` output column (NULL =
    * unranked).
    *
    * Scale shape: one extra left equi-join on the URL key (the rank
    * table is link-graph-node-bounded; Catalyst broadcasts it when
    * small, both sides shuffle on the key at web scale). A duplicate
    * rank node fails loud in-plan — silently joining both would fan
    * the frontier out. */
  def fetchScheduleRanked(
      frontier: DataFrame, urlCol: String, delays: DataFrame, agent: String,
      priorities: DataFrame, defaultDelayS: Int = 1
  ): DataFrame = {
    Seq("node", "rank_fp").foreach(needed =>
      require(priorities.columns.contains(needed),
        s"fetchScheduleRanked: priorities frame has no column '$needed' — " +
          "pass (node, rank_fp) rows (the pageRank output shape)"))
    Seq("priority_fp", "__pn").foreach(t =>
      require(!frontier.columns.contains(t),
        s"fetchScheduleRanked: input already has column '$t'"))
    // one rank row per node, fail-loud (the duplicateKeyGuard idiom)
    val wp = org.apache.spark.sql.expressions.Window.partitionBy(col("__pn"))
    val pr = priorities
      .select(col("node").cast("string").as("__pn"),
        col("rank_fp").cast("long").as("priority_fp"))
      .withColumn("__ok",
        when(count(lit(1)).over(wp) > 1,
          raise_error(concat(lit("fetchScheduleRanked: node "), col("__pn"),
            lit(" has more than one rank row — pass one rank per URL"))))
          .otherwise(lit(true)))
      .filter(col("__ok")).drop("__ok")
    val withP = frontier.join(pr,
      frontier(urlCol).cast("string") === pr("__pn"), "left").drop("__pn")
    scheduleCore(withP, urlCol, delays, agent, defaultDelayS,
      Seq(col("priority_fp").desc_nulls_last, md5(col(urlCol)), col(urlCol)))
  }

  /** The shared politeness-schedule core: delay resolution, per-host
    * ordinal window (`order` builds the within-host sort from the
    * annotated frontier), offset arithmetic. */
  private def scheduleCore(
      frontier: DataFrame, urlCol: String, delays: DataFrame, agent: String,
      defaultDelayS: Int, order: Seq[Column]
  ): DataFrame = {
    val agentLc = agent.trim.toLowerCase(Locale.ROOT)
    require(agentLc.nonEmpty && agentLc != "*",
      s"agent must be a concrete product token, got '$agent'")
    require(defaultDelayS >= 0, s"defaultDelayS must be >= 0, got $defaultDelayS")
    Seq("robots_key", "agent", "crawl_delay_s").foreach(needed =>
      require(delays.columns.contains(needed),
        s"fetchSchedule: delays frame has no column '$needed' — pass crawlDelays output"))
    Seq("host", "crawl_delay_s", "fetch_seq", "fetch_offset_s", "__fh").foreach(t =>
      require(!frontier.columns.contains(t),
        s"fetchSchedule: input already has column '$t'"))
    val d0 = delays.select(lower(col("robots_key")).as("__dh"),
        col("agent").as("__da"), col("crawl_delay_s").as("__ds"))
      .filter(col("__da").isin(agentLc, "*"))
    val wd = org.apache.spark.sql.expressions.Window.partitionBy(col("__dh"))
    val chosen = d0
      .withColumn("__he", max(when(col("__da") === agentLc, 1).otherwise(0)).over(wd))
      .filter(col("__da") === agentLc || (col("__he") === 0 && col("__da") === "*"))
      .groupBy(col("__dh")).agg(min(col("__ds")).as("__ds"))
    val withHost = frontier.withColumn("__fh", urlHost(col(urlCol)))
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__fh")).orderBy(order: _*)
    withHost.join(broadcast(chosen), withHost("__fh") === chosen("__dh"), "left")
      .withColumn("crawl_delay_s", coalesce(col("__ds"), lit(defaultDelayS)))
      .withColumn("fetch_seq", row_number().over(ws) - 1)
      .withColumn("fetch_offset_s",
        col("fetch_seq").cast("long") * col("crawl_delay_s"))
      .withColumn("host", col("__fh"))
      .drop("__fh", "__dh", "__ds")
  }

  /** [[admissions]], then keep only the allowed rows (annotation
    * columns dropped) — the pipeline-step shape. */
  def filterAllowed(
      urls: DataFrame, urlCol: String, rules: DataFrame, agent: String,
      broadcastRules: Boolean = true
  ): DataFrame =
    admissions(urls, urlCol, rules, agent, broadcastRules)
      .filter(col("robots_allowed"))
      .drop("robots_allowed", "robots_rule")
}
