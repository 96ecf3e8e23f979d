package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks
import graft.operators.Robots

/** robots.txt (RFC 9309): record parsing (grouping, comments, case
  * rules), URL admission (longest-match precedence, wildcards and
  * anchors, agent group selection), plus an independent in-memory
  * longest-prefix matcher cross-check over generated rule sets. */
class RobotsSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  // ---------------------------------------------------------- parsing

  test("groups: consecutive user-agent lines accumulate; a rule ends the run") {
    val body =
      """User-Agent: AlphaBot
        |user-agent: BetaBot
        |Disallow: /a
        |User-agent: GammaBot
        |Allow: /b
        |""".stripMargin
    val got = Robots.parseString("h", body)
      .map(r => (r.group_idx, r.rule_idx, r.agent, r.rule_type, r.value))
    assert(got === Seq(
      (0, 0, "alphabot", "disallow", "/a"),
      (0, 0, "betabot", "disallow", "/a"),
      (1, 1, "gammabot", "allow", "/b")))
  }

  test("comments strip anywhere; blank lines and unknown fields change no state") {
    val body =
      "# preamble\r\n" +
        "User-agent: bot # trailing comment\r\n" +
        "Cache-Control: no-store\r\n" + // unknown: ignored, UA run stays open
        "User-agent: other\r\n" +
        "\r\n" + // blank line: no grouping semantics
        "Disallow: /x # comment after value\r\n" +
        "not-a-record-line\r\n" +
        "Disallow: /y\r\n"
    val got = Robots.parseString("h", body)
      .map(r => (r.group_idx, r.rule_idx, r.agent, r.rule_type, r.value))
    assert(got === Seq(
      (0, 0, "bot", "disallow", "/x"), (0, 0, "other", "disallow", "/x"),
      (0, 1, "bot", "disallow", "/y"), (0, 1, "other", "disallow", "/y")))
  }

  test("rules before any group are ignored; sitemap is global; empty values kept") {
    val body =
      """Disallow: /orphan
        |Sitemap: http://h/s.xml
        |User-agent: bot
        |Disallow:
        |Crawl-delay: 5
        |""".stripMargin
    val got = Robots.parseString("h", body)
      .map(r => (r.group_idx, r.rule_idx, r.agent, r.rule_type, r.value))
    assert(got === Seq(
      (-1, 0, "", "sitemap", "http://h/s.xml"),
      (0, 1, "bot", "disallow", ""),
      (0, 2, "bot", "crawl-delay", "5")))
  }

  test("null/empty bodies parse to no rules; parseRules keys by any column") {
    assert(Robots.parseString("h", "") === Seq.empty)
    val df = Seq((1L, "User-agent: a\nDisallow: /p"), (2L, null: String))
      .toDF("doc_id", "body")
    val rules = Robots.parseRules(df, "doc_id", "body").collect()
    assert(rules.map(r => (r.robots_key, r.agent, r.value)).toSeq ===
      Seq(("1", "a", "/p")))
  }

  // ------------------------------------------------------- admissions

  private def rulesDf(host: String, body: String) =
    Robots.parseRules(Seq((host, body)).toDF("robots_key", "body"), "robots_key", "body")
      .toDF()

  private def verdicts(urls: Seq[String], host: String, body: String, agent: String) = {
    val u = urls.toDF("url")
    Robots.admissions(u, "url", rulesDf(host, body), agent)
      .select("url", "robots_allowed", "robots_rule")
      .collect().map(r => r.getString(0) -> ((r.getBoolean(1), Option(r.getString(2)))))
      .toMap
  }

  test("longest match wins; allow beats disallow on ties; no match allows") {
    val body =
      """User-agent: bot
        |Disallow: /private/
        |Allow: /private/pub*
        |Allow: /dup
        |Disallow: /dup
        |""".stripMargin
    val got = verdicts(Seq(
      "http://H.example/index.html", // host case-insensitive; no match
      "http://h.example/private/secret",
      "http://h.example/private/pubX/deep?q=1", // wildcard spans segments+query
      "http://h.example/dup", // tie on length 4: allow wins
      "http://h.example/Private/x" // paths case-SENSITIVE
    ), "h.example", body, "Bot") // agent token case-insensitive
    assert(got("http://H.example/index.html") === ((true, None)))
    assert(got("http://h.example/private/secret") === ((false, Some("/private/"))))
    assert(got("http://h.example/private/pubX/deep?q=1") === ((true, Some("/private/pub*"))))
    assert(got("http://h.example/dup") === ((true, Some("/dup"))))
    assert(got("http://h.example/Private/x") === ((true, None)))
  }

  test("trailing $ anchors over path+query; inner $ and empty rules are inert") {
    val body =
      """User-agent: bot
        |Disallow: /exact$
        |Disallow: /a$b
        |Disallow:
        |Disallow: no-slash
        |""".stripMargin
    val got = verdicts(Seq(
      "http://h/exact", "http://h/exact?q=1", "http://h/exactly",
      "http://h/a$b/c", "http://h/no-slash"), "h", body, "bot")
    assert(got("http://h/exact") === ((false, Some("/exact$"))))
    assert(got("http://h/exact?q=1") === ((true, None))) // query breaks the anchor
    assert(got("http://h/exactly") === ((true, None)))
    assert(got("http://h/a$b/c") === ((false, Some("/a$b")))) // literal inner $
    assert(got("http://h/no-slash") === ((true, None))) // non-path rule inert
  }

  test("agent groups: exact group shadows *; unknown agent falls back to *") {
    val body =
      """User-agent: bot
        |Disallow: /only-bot
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    // exact group exists: * rules do NOT apply, even permissive paths
    val asBot = verdicts(Seq("http://h/anything", "http://h/only-bot"), "h", body, "bot")
    assert(asBot("http://h/anything") === ((true, None)))
    assert(asBot("http://h/only-bot") === ((false, Some("/only-bot"))))
    // unknown agent: the * group applies
    val asOther = verdicts(Seq("http://h/anything"), "h", body, "stranger")
    assert(asOther("http://h/anything") === ((false, Some("/"))))
  }

  test("hosts without robots, scheme-less and NULL urls are allowed") {
    val rules = rulesDf("known.host", "User-agent: *\nDisallow: /")
    val u = Seq("http://other.host/x", "not a url", null).toDF("url")
    val got = Robots.admissions(u, "url", rules, "bot")
      .select("robots_allowed", "robots_rule").collect()
    assert(got.forall(r => r.getBoolean(0) && r.isNullAt(1)))
  }

  test("filterAllowed keeps allowed rows and drops annotations; guards re-entry") {
    val rules = rulesDf("h", "User-agent: *\nDisallow: /no/")
    val u = Seq("http://h/ok", "http://h/no/x").toDF("url")
    val kept = Robots.filterAllowed(u, "url", rules, "bot")
    assert(kept.columns.toSeq === Seq("url"))
    assert(kept.collect().map(_.getString(0)).toSeq === Seq("http://h/ok"))
    val annotated = Robots.admissions(u, "url", rules, "bot")
    val e = intercept[IllegalArgumentException] {
      Robots.admissions(annotated, "url", rules, "bot")
    }
    assert(e.getMessage.contains("robots_allowed"))
    val e2 = intercept[IllegalArgumentException] {
      Robots.admissions(u, "url", rules, "*")
    }
    assert(e2.getMessage.contains("product token"))
    // a malformed rules frame (not parseRules output) fails loud
    val e3 = intercept[IllegalArgumentException] {
      Robots.admissions(u, "url", Seq(("h", "x")).toDF("host", "body"), "bot")
    }
    assert(e3.getMessage.contains("parseRules output"))
  }

  test("crawlDelays: first parseable record wins; junk and negatives ignored") {
    val body =
      """User-agent: a
        |User-agent: b
        |Crawl-delay: 2.9
        |Crawl-delay: 7
        |User-agent: c
        |Crawl-delay: soon
        |User-agent: d
        |Crawl-delay: -3
        |""".stripMargin
    val got = Robots.crawlDelays(rulesDf("H.example", body))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    // fractional floors; the SECOND record (7) loses to file order
    assert(got === Map(("h.example", "a") -> 2, ("h.example", "b") -> 2))
  }

  test("fetchSchedule: agent delay beats *, default fills, offsets are seq*delay") {
    val body =
      """User-agent: bot
        |Crawl-delay: 4
        |User-agent: *
        |Crawl-delay: 9
        |""".stripMargin
    val delays = Robots.crawlDelays(rulesDf("h.example", body)
      .unionByName(rulesDf("star.example", "User-agent: *\nCrawl-delay: 2")))
    val urls = Seq(
      "http://h.example/a", "http://h.example/b", "http://h.example/c",
      "http://star.example/x", "http://star.example/y",
      "http://nowhere.example/z").toDF("url")
    val got = Robots.fetchSchedule(urls, "url", delays, "bot", defaultDelayS = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getString(4), r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    // columns after drop: url, crawl_delay_s, fetch_seq, fetch_offset_s, host
    got.foreach { case (u, (host, delay, seq, off)) =>
      assert(off === seq.toLong * delay, s"$u offset arithmetic")
      if (u.contains("//h.example")) assert(delay === 4 && host === "h.example")
      else if (u.contains("star")) assert(delay === 2 && host === "star.example")
      else assert(delay === 1 && host === "nowhere.example")
    }
    // per-host ordinals are dense 0..n-1
    val seqsByHost = got.values.groupBy(_._1).view.mapValues(_.map(_._3).toSeq.sorted)
    assert(seqsByHost("h.example") === Seq(0, 1, 2))
    assert(seqsByHost("star.example") === Seq(0, 1))
    assert(seqsByHost("nowhere.example") === Seq(0))
    val e = intercept[IllegalArgumentException] {
      Robots.fetchSchedule(urls, "url", urls, "bot")
    }
    assert(e.getMessage.contains("crawlDelays output"))
  }

  test("fetchScheduleRanked: rank-desc order within the host, unranked URLs fall behind, duplicate rank rows fail loud") {
    val delays = Robots.crawlDelays(rulesDf("h.example",
      "User-agent: bot\nCrawl-delay: 3"))
    val urls = Seq(
      "http://h.example/low", "http://h.example/high",
      "http://h.example/mid", "http://h.example/unranked").toDF("url")
    val ranks = Seq(
      ("http://h.example/low", 10L),
      ("http://h.example/high", 900L),
      ("http://h.example/mid", 500L)).toDF("node", "rank_fp")
    val got = Robots.fetchScheduleRanked(urls, "url", delays, "bot", ranks)
      .select("url", "fetch_seq", "fetch_offset_s", "priority_fp").collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(got("http://h.example/high") === ((0, 0L, Some(900L))))
    assert(got("http://h.example/mid") === ((1, 3L, Some(500L))))
    assert(got("http://h.example/low") === ((2, 6L, Some(10L))))
    assert(got("http://h.example/unranked") === ((3, 9L, None)))
    // a duplicated rank node would fan the frontier out — fail loud
    val dup = ranks.unionByName(
      Seq(("http://h.example/high", 901L)).toDF("node", "rank_fp"))
    val e = intercept[Exception] {
      Robots.fetchScheduleRanked(urls, "url", delays, "bot", dup).collect()
    }
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf(_)).mkString(" | ")
    assert(chain(e).contains("more than one rank row"), chain(e))
  }

  test("urlHost: userinfo and default ports normalize to the rule key") {
    // adversarial spellings of the SAME authority must all hit the
    // host's rules — 'http://user@h/…' or ':80' previously missed the
    // host-keyed join and fell to allowed-by-default (a crafted
    // robots bypass)
    val body = "User-agent: bot\nDisallow: /private/"
    val got = verdicts(Seq(
      "http://user@h.example/private/x",
      "http://user:pw@h.example/private/x",
      "http://a@b@h.example/private/x",   // unencoded '@' noise: LAST @ wins
      "http://h.example:80/private/x",
      "https://h.example:443/private/x",
      "http://USER@H.EXAMPLE:80/private/x",
      "http://h.example:8080/private/x"), // non-default port: own authority
      "h.example", body, "bot")
    val blocked = ((false, Some("/private/")))
    assert(got("http://user@h.example/private/x") === blocked)
    assert(got("http://user:pw@h.example/private/x") === blocked)
    assert(got("http://a@b@h.example/private/x") === blocked)
    assert(got("http://h.example:80/private/x") === blocked)
    assert(got("https://h.example:443/private/x") === blocked)
    assert(got("http://USER@H.EXAMPLE:80/private/x") === blocked)
    // a different explicit port is a different authority (RFC 9309
    // §2.3): no rules for it, allowed by default
    assert(got("http://h.example:8080/private/x") === ((true, None)))
    // delays join through the same key
    val delays = Robots.crawlDelays(rulesDf("h.example",
      "User-agent: bot\nCrawl-delay: 7"))
    val sched = Robots.fetchSchedule(
      Seq("http://user@h.example:80/a").toDF("url"), "url", delays, "bot")
      .select("host", "crawl_delay_s").collect()
    assert(sched.map(r => (r.getString(0), r.getInt(1))).toSeq ===
      Seq(("h.example", 7)))
  }

  test("literal-prefix fast path: plan matches on startswith, not rlike, for plain rules") {
    // the overwhelming majority of real rules are literal prefixes —
    // those evaluate via startswith (per-row String.startsWith);
    // rlike (per-row Pattern.compile on a non-foldable regex) remains
    // only for the wildcard/anchored minority. Mixed rule sets must
    // produce identical verdicts through both paths — the precedence
    // tests above already mix them; here we pin the PLAN shape.
    val rules = rulesDf("h", "User-agent: bot\nDisallow: /lit\nDisallow: /wild*card")
    val u = Seq("http://h/lit/x").toDF("url")
    val plan = Robots.admissions(u, "url", rules, "bot")
      .queryExecution.executedPlan.toString
    assert(plan.contains("startswith") || plan.contains("StartsWith"),
      s"literal-prefix fast path missing from plan:\n$plan")
    // and the lit_i flag routes correctly: literal blocked via prefix,
    // wildcard blocked via regex, inner-$ rule (literal, no anchor)
    // via prefix
    val got = verdicts(Seq(
      "http://h/lit/x", "http://h/wildANYcard/y", "http://h/w"),
      "h", "User-agent: bot\nDisallow: /lit\nDisallow: /wild*card", "bot")
    assert(got("http://h/lit/x") === ((false, Some("/lit"))))
    assert(got("http://h/wildANYcard/y") === ((false, Some("/wild*card"))))
    assert(got("http://h/w") === ((true, None)))
  }

  test("cross-check: literal prefix rule sets match an independent in-memory matcher") {
    // independent reference: longest matching literal prefix, allow on
    // ties, allowed when nothing matches
    def reference(rules: Seq[(Boolean, String)], path: String): Boolean = {
      val matched = rules.filter { case (_, p) => p.nonEmpty && path.startsWith(p) }
      if (matched.isEmpty) true
      else {
        val maxLen = matched.map(_._2.length).max
        matched.filter(_._2.length == maxLen).exists(_._1)
      }
    }
    val paths = Seq("/", "/a", "/a/b", "/a/bc", "/b", "/a/b/c", "/ab")
    val ruleSets: Seq[Seq[(Boolean, String)]] = Seq(
      Seq(true -> "/a", false -> "/a/b"),
      Seq(false -> "/", true -> "/a", false -> "/a/b", true -> "/a/b/c"),
      Seq(false -> "/a", true -> "/a", false -> "/ab"),
      Seq(false -> "/b"),
      Seq(true -> "/a/b", false -> "/a/b")) // exact tie: allow wins
    for (rs <- ruleSets) {
      val body = "User-agent: bot\n" + rs.map { case (a, p) =>
        (if (a) "Allow: " else "Disallow: ") + p }.mkString("\n")
      val urls = paths.map(p => s"http://h$p")
      val got = verdicts(urls, "h", body, "bot")
      for (p <- paths) {
        assert(got(s"http://h$p")._1 === reference(rs, p),
          s"rules=$rs path=$p")
      }
    }
  }
}
