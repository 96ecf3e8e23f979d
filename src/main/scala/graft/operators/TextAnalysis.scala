package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * All are pure `Column` expressions over built-in functions — fully
  * codegen'd, no UDFs, no shuffles: they scale linearly with the scan.
  * Formulas are deliberately expressible in ANSI SQL so every operator
  * has a DuckDB oracle.
  */
object TextAnalysis {

  /** Whitespace-collapsed, trimmed, lowercased text — the shared
    * normalization for all text operators. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  def tokens(text: Column): Column = split(normalized(text), " ")

  def tokenCount(text: Column): Column =
    when(normalized(text) === "", lit(0)).otherwise(size(tokens(text)))

  def charCount(text: Column): Column = length(normalized(text))

  /** BPE-ish pre-tokenization pattern: letter runs, single digits
    * (LLM tokenizers split numbers), single CJK codepoints, runs of
    * other non-space symbols. Pure alternation — no lookarounds — so
    * the SAME string is a valid Java regex (Spark) and RE2 regex
    * (DuckDB oracle). */
  val bpePiecePattern: String =
    "[A-Za-z]+|[0-9]|[\\x{4e00}-\\x{9fff}]|[^A-Za-z0-9\\s\\x{4e00}-\\x{9fff}]+"

  /** Pre-tokenizer pieces of the RAW text (case preserved — BPE vocabs
    * are case-sensitive). */
  def bpePieces(text: Column): Column =
    regexp_extract_all(coalesce(text, lit("")), lit(bpePiecePattern), lit(0))

  /** Estimated LLM token count: each piece costs
    * `max(1, ceil(len/4))` — the ~4-chars-per-token rule applied per
    * piece, so a 12-char word is 3 tokens while punctuation and digits
    * stay 1 each. A budget-planning estimate (token budgets, packing,
    * cost models), not a tokenizer: the real vocab merges differently,
    * but this is deterministic, engine-portable, and within ~15% of
    * GPT-2 counts on English prose. */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(bpePieces(text), lit(0L),
      (acc, p) => acc + greatest(lit(1L),
        ((length(p) + lit(3)) / lit(4)).cast("long")))

  /** Ratio of characters that are not [a-z0-9 ] after normalization. */
  def punctRatio(text: Column): Column = {
    val n = normalized(text)
    when(length(n) === 0, lit(0.0))
      .otherwise(length(regexp_replace(n, "[a-z0-9 ]", "")).cast("double") / length(n))
  }

  def avgTokenLength(text: Column): Column = {
    val nTok = tokenCount(text)
    when(nTok === 0, lit(0.0))
      .otherwise((charCount(text) - (nTok - 1)).cast("double") / nTok)
  }

  /** Non-overlapping occurrence count of ` word ` in the padded
    * normalized text (the replace-length trick — identical semantics in
    * Spark and DuckDB, no regex dialect issues). */
  def wordOccurrences(text: Column, word: String): Column = {
    val padded = concat(lit(" "), normalized(text), lit(" "))
    val needle = s" $word "
    ((length(padded) - length(call_function("replace", padded, lit(needle))))
      / lit(needle.length)).cast("long")
  }

  // compact per-language stopword lists for the n-gram/stopword
  // language heuristic
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "und", "ist", "das", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es", "una"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不")
  )

  def stopwordHits(text: Column, lang: String): Column =
    stopwords(lang).map(wordOccurrences(text, _)).reduce(_ + _)

  /** English stopword density: stopword occurrences / token count. */
  def stopwordRatio(text: Column): Column = {
    val nTok = tokenCount(text)
    when(nTok === 0, lit(0.0))
      .otherwise(stopwordHits(text, "en").cast("double") / nTok)
  }

  /** Heuristic quality score in [0,1]: length, cleanliness, stopword
    * density, average word length. The standard cheap pre-filter shape
    * for LLM corpus curation (C4-style). */
  def qualityScore(text: Column): Column =
    lit(0.25) * least(lit(1.0), tokenCount(text).cast("double") / 100.0) +
      lit(0.25) * (lit(1.0) - punctRatio(text)) +
      lit(0.30) * least(lit(1.0), stopwordRatio(text) * 4.0) +
      lit(0.20) * least(lit(1.0), avgTokenLength(text) / 8.0)

  /** Language ID: argmax of per-language stopword scores, first-listed
    * language wins ties, "und" (undetermined) when all scores are 0. */
  def langId(text: Column): Column = {
    val langs  = Seq("en", "de", "es", "fr", "zh")
    val scores = langs.map(l => l -> stopwordHits(text, l)).toMap
    val allZero = scores.values.reduce(_ + _) === 0
    val best = langs.foldRight(lit(langs.last)) { (l, acc) =>
      when(langs.filter(_ != l).map(o => scores(l) >= scores(o)).reduce(_ && _), lit(l))
        .otherwise(acc)
    }
    when(allZero, lit("und")).otherwise(best)
  }

  /** Document fingerprint: md5 of the normalized text — the exact-dedup
    * key (identical to DuckDB's md5 for cross-engine checks). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Inverted-index postings: per token, document frequency plus the
    * first `cap` doc ids (sorted). The per-term cap is enforced
    * BEFORE the shuffle — the rank filter plans as WindowGroupLimit,
    * a bounded per-term heap in each task — so a stopword's postings
    * never materialize corpus-wide; `df` still counts every document
    * via the partial-aggregated pair count. One distinct pass over
    * (doc, token) pairs feeds both. */
  def postings(df: DataFrame, docCol: String, textCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val td = df
      .select(col(docCol).as("__doc"), explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token")).orderBy(col("__doc"))
    val capped = td
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .groupBy(col("token"))
      .agg(sort_array(collect_list(col("__doc"))).as("postings"))
    td.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .join(capped, Seq("token"))
  }

  /** Windowed token co-occurrence counts — the corpus statistic under
    * PMI / word-vector / collocation analysis: for every unordered
    * token pair (w1 < w2), how many times w2 follows w1 within
    * `window` positions in some document. Output the top `topK` pairs
    * by (count desc, w1, w2) plus each token's total occurrence count
    * (`n1`, `n2`), from which PMI-style scores are one arithmetic step
    * for the caller (kept as exact integers here — logs are not
    * bit-portable across engines).
    *
    * Scale shape: tokens explode once with positions; each occurrence
    * emits `window` (doc, pos+d) probes via a sequence explode, which
    * EQUI-join back on (doc, pos) — linear O(tokens · window) pair
    * rows, never the O(len²) a position-range self-join would scan
    * per document. Tokens with total occurrences > `maxCount`
    * (stopwords — the pairs that dominate and inform least) are
    * dropped by a broadcast anti-join BEFORE pairing, the
    * [[graft.operators.Dedup]] hot-shingle guard; the final top-K is
    * a bounded TakeOrdered, never a global sort of the pair space. */
  def cooccurrence(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int = 5, maxCount: Long = 100000L, topK: Int = 100
  ): DataFrame = {
    // the tokenized stream feeds totals once and the pair self-join
    // twice; without materialization the corpus re-tokenizes per
    // reference (plan-keyed idempotent persist — the pageRank edge
    // convention; CacheManager dedupes repeated calls)
    val tok0 = tokenizedWithPos(docs, idCol, textCol)
    val tok =
      if (tok0.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        tok0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else tok0
    cooccurrenceFrom(tok, window, maxCount, topK)
  }

  private def tokenizedWithPos(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("__doc"),
        posexplode(tokens(col(textCol))).as(Seq("__pos", "__tok")))
      .filter(col("__tok") =!= "")

  private def cooccurrenceFrom(
      tok: DataFrame, window: Int, maxCount: Long, topK: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val totals = tok.groupBy(col("__tok")).agg(count(lit(1)).as("__n"))
    val hot    = totals.filter(col("__n") > maxCount).select(col("__tok"))
    val cold   = tok.join(broadcast(hot), Seq("__tok"), "left_anti")
    val probes = cold
      .select(col("__doc"), col("__tok").as("__w1"),
        explode(sequence(col("__pos") + 1, col("__pos") + window)).as("__pos"))
    val pairs = probes
      .join(cold.select(col("__doc"), col("__pos"), col("__tok").as("__w2")),
        Seq("__doc", "__pos"))
      .filter(col("__w1") =!= col("__w2"))
      .select(least(col("__w1"), col("__w2")).as("w1"),
        greatest(col("__w1"), col("__w2")).as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("pair_count"))
    pairs
      .join(totals.select(col("__tok").as("w1"), col("__n").as("n1")), Seq("w1"))
      .join(totals.select(col("__tok").as("w2"), col("__n").as("n2")), Seq("w2"))
      .orderBy(col("pair_count").desc, col("w1"), col("w2"))
      .limit(topK)
      .select(col("w1"), col("w2"), col("pair_count"), col("n1"), col("n2"))
  }

  /** [[cooccurrence]] with the tokenized-corpus cache RELEASED before
    * returning — the loan-scoped shape ([[Centrality.withEdges]]) for
    * long-lived sessions and CLI pipelines, where [[cooccurrence]]'s
    * plan-keyed persist would otherwise accumulate a corpus-sized
    * cached block per distinct input plan. The bounded result (≤ topK
    * rows by construction) is materialized onto the driver and
    * re-wrapped as a local frame, so nothing downstream references the
    * released cache — which is unpersisted via the ACTUAL persisted
    * handle (shared private builder), not a re-derived plan that could
    * silently drift out of cache-key equality. */
  def cooccurrenceScoped(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int = 5, maxCount: Long = 100000L, topK: Int = 100
  ): DataFrame = {
    val tok = tokenizedWithPos(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val out = cooccurrenceFrom(tok, window, maxCount, topK)
      val rows = out.collect() // ≤ topK rows — bounded by construction
      out.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), out.schema)
    } finally tok.unpersist(blocking = false)
  }

  /** Canonicalize a URL for crawl/fetch deduplication — the key under
    * which two spellings of one resource collide:
    *
    *  - fragment dropped (client-side only);
    *  - tracking parameters removed (`utm_*`, `fbclid`, `gclid`,
    *    `msclkid`) wherever they sit in the query, with separator
    *    repair and trailing `?`/`&` cleanup;
    *  - scheme and host lowercased (case-insensitive per RFC 3986) —
    *    path/query case PRESERVED (significant);
    *  - default ports stripped (`:80` for http, `:443` for https);
    *  - empty path becomes `/` (`http://x.com` == `http://x.com/`).
    *
    * Scan-local regex/extract chain, no UDF, no shuffle; every pattern
    * is lookaround-free so the same strings are valid Java (Spark) and
    * RE2 (DuckDB oracle) regexes. Strings without a `scheme://` prefix
    * pass through with only the fragment/tracking cleanup. */
  def normalizeUrl(url: Column): Column = {
    val trackers = "(?:utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)"
    val noFrag   = regexp_replace(trim(url), "#.*$", "")
    // split at the FIRST '?' and clean trackers in the QUERY ONLY — a
    // path segment may legally contain '&' (RFC 3986 pchar), and a
    // whole-string pass would delete tracker-shaped path text,
    // colliding distinct resources under one key
    val base  = regexp_replace(noFrag, "\\?.*$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    // non-first params, then a first param followed by another, then a
    // lone first/only param
    val q1 = regexp_replace(query, s"&$trackers=[^&]*", "")
    val q2 = regexp_replace(q1, s"^$trackers=[^&]*&", "")
    val q3 = regexp_replace(q2, s"^$trackers=[^&]*$$", "")
    val q4 = regexp_replace(q3, "&+$", "") // dangling separator noise
    val cleaned = when(q4 === "", base).otherwise(concat(base, lit("?"), q4))
    val schemePat = "^([A-Za-z][A-Za-z0-9+.-]*)://"
    val scheme = lower(regexp_extract(cleaned, schemePat, 1))
    val host0  = lower(regexp_extract(cleaned, schemePat + "([^/?#]*)", 2))
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val rest0 = regexp_replace(cleaned, schemePat + "[^/?#]*", "")
    val rest = when(rest0 === "", lit("/"))
      .when(substring(rest0, 1, 1) === "?", concat(lit("/"), rest0))
      .otherwise(rest0)
    when(url.isNull, lit(null))
      .when(scheme === "", cleaned)
      .otherwise(concat(scheme, lit("://"), host, rest))
  }

  /** [[normalizeUrl]] as a STAGED multi-projection rewrite of `urlCol`
    * in place — the form to use on a corpus. The single-Column form
    * inlines its intermediates (`cleaned`, `scheme`, `host`…) into
    * every CASE branch that references them; Spark's subexpression
    * elimination does not reach into conditional branches, so ONE copy
    * of that expression already overflows Janino's 64 KB method limit
    * and silently drops the whole stage out of codegen. Staging each
    * intermediate as a named column keeps every generated method small
    * (CollapseProject will not re-inline a non-cheap alias referenced
    * more than once) — same bytes out, codegen'd, still zero shuffle.
    */
  def normalizeUrlStaged(df: DataFrame, urlCol: String): DataFrame = {
    val tmp = Seq("__nu_frag", "__nu_base", "__nu_q", "__nu_clean",
      "__nu_scheme", "__nu_host", "__nu_rest")
    tmp.foreach(t => require(!df.columns.contains(t),
      s"normalizeUrlStaged: input already has internal column '$t'"))
    val trackers = "(?:utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)"
    val schemePat = "^([A-Za-z][A-Za-z0-9+.-]*)://"
    val q = regexp_extract(col("__nu_frag"), "\\?(.*)$", 1)
    val q1 = regexp_replace(q, s"&$trackers=[^&]*", "")
    val q2 = regexp_replace(q1, s"^$trackers=[^&]*&", "")
    val q3 = regexp_replace(q2, s"^$trackers=[^&]*$$", "")
    df
      .withColumn("__nu_frag", regexp_replace(trim(col(urlCol)), "#.*$", ""))
      .withColumn("__nu_base", regexp_replace(col("__nu_frag"), "\\?.*$", ""))
      .withColumn("__nu_q", regexp_replace(q3, "&+$", ""))
      .withColumn("__nu_clean",
        when(col("__nu_q") === "", col("__nu_base"))
          .otherwise(concat(col("__nu_base"), lit("?"), col("__nu_q"))))
      .withColumn("__nu_scheme", lower(regexp_extract(col("__nu_clean"), schemePat, 1)))
      .withColumn("__nu_host", {
        val h0 = lower(regexp_extract(col("__nu_clean"), schemePat + "([^/?#]*)", 2))
        when(col("__nu_scheme") === "http", regexp_replace(h0, ":80$", ""))
          .when(col("__nu_scheme") === "https", regexp_replace(h0, ":443$", ""))
          .otherwise(h0)
      })
      .withColumn("__nu_rest", {
        val r0 = regexp_replace(col("__nu_clean"), schemePat + "[^/?#]*", "")
        when(r0 === "", lit("/"))
          .when(substring(r0, 1, 1) === "?", concat(lit("/"), r0))
          .otherwise(r0)
      })
      .withColumn(urlCol,
        when(col(urlCol).isNull, lit(null))
          .when(col("__nu_scheme") === "", col("__nu_clean"))
          .otherwise(concat(col("__nu_scheme"), lit("://"),
            col("__nu_host"), col("__nu_rest"))))
      .drop(tmp: _*)
  }

  /** PII redaction patterns, applied in order (emails before URLs so a
    * mailto-ish token cannot be half-eaten by the URL rule; IPs last so
    * URL hosts keep priority). Kept to constructs with identical
    * semantics in Java regex and RE2 (DuckDB) — no backreferences, no
    * lookaround — so the DuckDB oracle can mirror the pipeline
    * verbatim. */
  val redactionPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "https?://[^\\s]+"                                -> "<URL>",
    "\\+\\d{1,3}\\s?\\(\\d{3}\\)\\s?\\d{3}-\\d{4}"    -> "<PHONE>",
    "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"                  -> "<IP>")

  /** Scrub emails / URLs / phone numbers / IPv4 addresses — the
    * standard pre-training PII pass. Scan-local (a chain of compiled
    * regexp_replace, no shuffle); replace-all per pattern. */
  def redact(text: Column): Column =
    redactionPatterns.foldLeft(text) { case (c, (pat, tag)) => regexp_replace(c, pat, tag) }

  /** One compiled pass over the normalized text computing every count
    * the stats projection needs. Semantics replicate the column-formula
    * helpers EXACTLY (the text_stats DuckDB oracle and the multilingual
    * specs pin this):
    *  - tokens: `size(split(n, " "))` == spaces + 1 (0 for empty);
    *  - punct: `length(regexp_replace(n, "[a-z0-9 ]", ""))` counts
    *    non-matching CODE POINTS (regex classes and Spark's length both
    *    operate on code points, so the scan does too);
    *  - bpe: matches of `[a-z]+|[0-9]+|[^a-z0-9 ]` — run transitions
    *    for letter/digit runs, one per other code point;
    *  - stopword scores: left-to-right NON-OVERLAPPING ` word `
    *    occurrences in the space-padded text (replace()'s scan order —
    *    "the the" counts once because the middle space is shared).
    * The formula version allocated ~40 replaced strings + two regex
    * passes + a split array per row; this is one scan and zero
    * intermediate strings. */
  // counts are returned as one flat Array[Long] — layout below — because
  // a (private, nested) case-class return makes the encoder's generated
  // accessors UNCOMPILABLE for Janino: the whole stats projection then
  // silently falls back to INTERPRETED UnsafeProjection (observed via
  // "Expr codegen error" warnings), exactly the per-row hot path this
  // operator exists to keep compiled. An array return serializes
  // natively with no struct encoder.
  private val IdxTokens = 0
  private val IdxPunct  = 1
  private val IdxBpe    = 2
  private val IdxScores = 3 // then one slot per statsLangs entry

  private val statsLangs = Seq("en", "de", "es", "fr", "zh")

  private val countsUdf = {
    val needles = statsLangs.map(l => stopwords(l).map(w => s" $w ").toArray).toArray
    udf { (n: String) =>
      if (n == null) null
      else {
        var tokens = if (n.isEmpty) 0L else 1L
        var punct  = 0L
        var bpe    = 0L
        var prev   = -1 // 0 = letter run, 1 = digit run, -1 = boundary
        var i      = 0
        while (i < n.length) {
          val cp = n.codePointAt(i)
          if (cp == ' ') { tokens += 1L; prev = -1 }
          else if (cp >= 'a' && cp <= 'z') { if (prev != 0) bpe += 1L; prev = 0 }
          else if (cp >= '0' && cp <= '9') { if (prev != 1) bpe += 1L; prev = 1 }
          else { punct += 1L; bpe += 1L; prev = -1 }
          i += Character.charCount(cp)
        }
        val padded = " " + n + " "
        val out = new Array[Long](IdxScores + needles.length)
        out(IdxTokens) = tokens
        out(IdxPunct)  = punct
        out(IdxBpe)    = bpe
        var l = 0
        while (l < needles.length) {
          var s = 0L
          var w = 0
          while (w < needles(l).length) {
            val needle = needles(l)(w)
            var idx = padded.indexOf(needle)
            while (idx >= 0) { s += 1L; idx = padded.indexOf(needle, idx + needle.length) }
            w += 1
          }
          out(IdxScores + l) = s
          l += 1
        }
        out
      }
    }
  }

  /** Chunk each document into overlapping token windows — the
    * training-sample preparation step (context-window packing) that
    * follows cleaning/dedup in an LLM data pipeline. Emits one row per
    * chunk: `chunk_id` (0-based), the chunk's token count, and the
    * re-joined chunk text. The final chunk may be shorter than `size`;
    * documents whose normalized text is empty emit no chunks.
    *
    * Scan-local and zero-shuffle: chunk starts are a `sequence` +
    * `posexplode` over the token array, the chunk itself a `slice` —
    * all built-in, codegen'd functions. Output volume is bounded by
    * ceil(size/stride) x input tokens (the overlap factor). */
  def chunkTokens(
      docs: DataFrame, idCol: String, textCol: String, size: Int, stride: Int
  ): DataFrame = {
    require(size > 0 && stride > 0, s"size/stride must be positive, got $size/$stride")
    docs
      .select(col(idCol), normalized(col(textCol)).as("__n"))
      .filter(col("__n") =!= "" && col("__n").isNotNull)
      .select(col(idCol), split(col("__n"), " ").as("__w"))
      .select(col(idCol), col("__w"),
        posexplode(sequence(lit(0), org.apache.spark.sql.functions.size(col("__w")) - 1, lit(stride))))
      .withColumnRenamed("pos", "chunk_id")
      .select(
        col(idCol),
        col("chunk_id").cast("int").as("chunk_id"),
        slice(col("__w"), col("col") + 1, lit(size)).as("__c"))
      .select(
        col(idCol),
        col("chunk_id"),
        org.apache.spark.sql.functions.size(col("__c")).as("n_chunk_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  /** Per-document repetition statistics — the Gopher-style "repetitious
    * document" quality filter: fraction of duplicate tokens, the top
    * token's share, and the duplicate-bigram fraction, plus a flag at
    * the usual curation thresholds. One compiled pass per document
    * (same design as [[stats]]' countsUdf — a flat Array[Long] return
    * keeps the projection codegen'd), zero shuffles. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    repEnrich(docs
      // null text counts as empty: zero rates, not a null-poisoned row
      .select(col(idCol), coalesce(normalized(col(textCol)), lit("")).as("__n")))
      .select(col(idCol), col("rep_n_tokens").as("n_tokens"), col("top_token_ratio"),
        col("dup_token_ratio"), col("dup_bigram_ratio"), col("flagged"))

  /** Add the repetition columns to a frame that already carries the
    * normalized text as `__n` (non-null). Internal columns are
    * `__rc`-prefixed so the enrichment composes with [[statsEnrich]] in
    * one projection ([[curate]]) without name collisions. */
  private def repEnrich(staged: DataFrame): DataFrame =
    staged
      .withColumn("__rc", repUdf(col("__n")))
      .withColumn("rep_n_tokens", col("__rc").getItem(RepIdxTokens).cast("int"))
      .withColumn("top_token_ratio",
        when(col("rep_n_tokens") === 0, lit(0.0))
          .otherwise(col("__rc").getItem(RepIdxMaxFreq).cast("double") / col("rep_n_tokens")))
      .withColumn("dup_token_ratio",
        when(col("rep_n_tokens") === 0, lit(0.0))
          .otherwise(
            (col("rep_n_tokens") - col("__rc").getItem(RepIdxDistinct)).cast("double") /
              col("rep_n_tokens")))
      .withColumn("dup_bigram_ratio",
        when(col("__rc").getItem(RepIdxBigrams) === 0, lit(0.0))
          .otherwise(
            (col("__rc").getItem(RepIdxBigrams) - col("__rc").getItem(RepIdxDistinctBi)).cast("double") /
              col("__rc").getItem(RepIdxBigrams)))
      .withColumn("flagged",
        col("top_token_ratio") > 0.20 || col("dup_bigram_ratio") > 0.30)

  // flat-array layout for repUdf (see countsUdf's note on why an array,
  // not a case class: Janino cannot compile private nested struct
  // encoders and the projection would silently go interpreted)
  private val RepIdxTokens     = 0
  private val RepIdxDistinct   = 1
  private val RepIdxMaxFreq    = 2
  private val RepIdxBigrams    = 3
  private val RepIdxDistinctBi = 4

  private val repUdf = udf { (n: String) =>
    if (n == null) null
    else if (n.isEmpty) Array(0L, 0L, 0L, 0L, 0L)
    else {
      val toks = n.split(' ')
      val freq = new java.util.HashMap[String, Long]()
      var maxFreq = 0L
      var i = 0
      while (i < toks.length) {
        val c = freq.merge(toks(i), 1L, (a, b) => a + b)
        if (c > maxFreq) maxFreq = c
        i += 1
      }
      val bigrams = new java.util.HashSet[String]()
      var nBi = 0L
      i = 0
      while (i < toks.length - 1) {
        bigrams.add(toks(i) + " " + toks(i + 1))
        nBi += 1L
        i += 1
      }
      Array(toks.length.toLong, freq.size.toLong, maxFreq, nBi, bigrams.size.toLong)
    }
  }

  /** All per-document text statistics in one scan-only projection:
    * normalization (one native regex) + [[countsUdf]] (one compiled
    * pass) + md5. Zero shuffles; scales linearly with the scan. */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    statsEnrich(docs
      .select(col(idCol), col(textCol).as("__t"))
      .withColumn("__n", normalized(col("__t"))))
      .select(col(idCol), col("n_tokens"), col("n_chars"), col("punct_ratio"),
        col("avg_token_len"), col("stopword_ratio"), col("quality_score"),
        col("lang_pred"), col("fingerprint"), col("n_bpe_tokens"))

  /** Add the full stats column set to a frame that already carries the
    * normalized text as `__n`. Composes with [[repEnrich]] in one
    * projection ([[curate]]). */
  private def statsEnrich(input: DataFrame): DataFrame = {
    val langs = statsLangs
    val staged = input
      .withColumn("__c", countsUdf(col("__n")))
      .withColumn("n_tokens", col("__c").getItem(IdxTokens).cast("int"))
      .withColumn("n_chars", length(col("__n")))
      .withColumn("punct_ratio",
        when(col("n_chars") === 0, lit(0.0))
          .otherwise(col("__c").getItem(IdxPunct).cast("double") / col("n_chars")))
      .withColumn("avg_token_len",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise((col("n_chars") - (col("n_tokens") - 1)).cast("double") / col("n_tokens")))
    val withScores = langs.zipWithIndex.foldLeft(staged) { case (d, (l, i)) =>
      d.withColumn(s"__s_$l", col("__c").getItem(IdxScores + i))
    }
    val best = langs.foldRight(lit(langs.last)) { (l, acc) =>
      when(langs.filter(_ != l).map(o => col(s"__s_$l") >= col(s"__s_$o")).reduce(_ && _), lit(l))
        .otherwise(acc)
    }
    withScores
      .withColumn("stopword_ratio",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("__s_en").cast("double") / col("n_tokens")))
      .withColumn("quality_score",
        lit(0.25) * least(lit(1.0), col("n_tokens").cast("double") / 100.0) +
          lit(0.25) * (lit(1.0) - col("punct_ratio")) +
          lit(0.30) * least(lit(1.0), col("stopword_ratio") * 4.0) +
          lit(0.20) * least(lit(1.0), col("avg_token_len") / 8.0))
      .withColumn("lang_pred",
        when(langs.map(l => col(s"__s_$l")).reduce(_ + _) === 0, lit("und")).otherwise(best))
      .withColumn("fingerprint", md5(col("__n")))
      // BPE-ish subword proxy: letter runs, digit runs, and single
      // non-alphanumeric marks each count as one token (the usual cheap
      // stand-in for a real tokenizer when budgeting training data)
      .withColumn("n_bpe_tokens", col("__c").getItem(IdxBpe).cast("int"))
  }

  /** One-scan curation decision: the quality/language/repetition
    * signals composed into keep-or-drop with machine-readable reasons.
    * [[statsEnrich]] and [[repEnrich]] stack in a single projection —
    * the corpus is scanned ONCE, zero shuffles (joining the public
    * `stats` and `repetitionStats` outputs would scan it twice and
    * shuffle on the id; TextPipelineSpec pins the scan-local plan).
    * Null text is an empty doc: dropped as too_short, never a crash. */
  def curate(
      docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 20, minQuality: Double = 0.4
  ): DataFrame = {
    val staged = docs
      .select(col(idCol), col(textCol).as("__t"))
      .withColumn("__n", coalesce(normalized(col("__t")), lit("")))
    val enriched = repEnrich(statsEnrich(staged))
    val tooShort   = col("n_tokens") < minTokens
    val lowQuality = col("quality_score") < minQuality
    enriched
      .withColumn("keep", !(tooShort || lowQuality || col("flagged")))
      // concat_ws skips nulls, so the reason list is dense and ordered
      .withColumn("reasons", concat_ws(",",
        when(tooShort, lit("too_short")),
        when(lowQuality, lit("low_quality")),
        when(col("flagged"), lit("repetitive"))))
      .select(col(idCol), col("n_tokens"),
        round(col("quality_score"), 6).as("quality_score"),
        col("lang_pred"), round(col("top_token_ratio"), 6).as("top_token_ratio"),
        round(col("dup_bigram_ratio"), 6).as("dup_bigram_ratio"),
        col("keep"), col("reasons"))
  }

  // ================================================================ HTML extraction

  /** Elements whose CONTENT is machinery or boilerplate, dropped whole:
    * script/style/head/template/noscript/svg are never prose;
    * nav/header/footer/aside are the HTML5 semantic boilerplate
    * containers (the jusText/Arc90 "bad containers"). One compiled
    * regex per tag because RE2 has no backreferences (`</\1>`) — the
    * pattern must stay valid in BOTH Java (Spark) and RE2 (a DuckDB
    * oracle), the [[redact]] discipline. Nested same-tag containers
    * fall back to the line heuristics below (the non-greedy match ends
    * at the first close tag). */
  private val htmlContainerTags = Seq("script", "style", "head", "template",
    "noscript", "svg", "nav", "header", "footer", "aside")

  /** Block-level boundaries become line breaks (open OR close tag);
    * inline tags (a, b, span, em, …) strip in place later. */
  private val htmlBlockPattern: String =
    "(?i)</?(?:p|div|li|ul|ol|dl|dt|dd|h1|h2|h3|h4|h5|h6|tr|td|th|table|thead|" +
      "tbody|section|article|blockquote|pre|form|hr|br)\\b[^>]*>"

  /** The five XML entities plus nbsp/apos, decoded AFTER tag stripping
    * so entity-encoded markup (`&lt;script&gt;`) stays text — the
    * standard safe order. `&amp;` is last (so `&amp;lt;` decodes to the
    * literal `&lt;`, not `<`). Other entities pass through. */
  private def htmlDecodeEntities(c: Column): Column =
    Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (e, ch)) => replace(acc, lit(e), lit(ch)) }

  /** A line's visible text: remaining tags stripped, entities decoded,
    * whitespace collapsed, trimmed. A tag opens only at `<` + letter
    * (or `</`) — the HTML tokenizer rule — so a bare `<` in prose
    * (`3 < 5`) stays text; `</?[A-Za-z][^>]*$` catches a tag left
    * unclosed at end of input. */
  private def htmlStripLine(l: Column): Column =
    trim(regexp_replace(htmlDecodeEntities(
      regexp_replace(l, "</?[A-Za-z][^>]*>|</?[A-Za-z][^>]*$", " ")), "\\s+", " "))

  /** HTML → main-content text: the FIRST step of a real web-crawl
    * pipeline, run before any other text operator. Deterministic,
    * regex-only main-content extraction with the public
    * Arc90-readability / jusText content rules:
    *
    *  1. comments and [[htmlContainerTags]] drop WITH their content
    *     (a `</p>` inside a script string is script, not structure);
    *  2. block-level tags become line breaks ([[htmlBlockPattern]]);
    *  3. a line is CONTENT iff its stripped text has at least
    *     `minChars` characters AND at most 1/5 of them are anchor
    *     text — `5·anchorLen ≤ strippedLen`, the link-density rule in
    *     exact integer arithmetic (no floats, the engine-portability
    *     contract) — navigation rows are mostly link text, prose is
    *     not;
    *  4. kept lines join with `\n`.
    *
    * Entirely built from regexp/collection functions with patterns
    * valid in BOTH Java and RE2 (no backreferences, no lookarounds):
    * scan-local, no UDF, no shuffle, and a DuckDB oracle can replay it.
    * Malformed HTML degrades safely: unclosed tags strip to the next
    * `>` (or end of line), never-closed containers fall through to the
    * line rules, bare `<`/`>` in text survive as text. */
  /** The page `<title>` — the crawl-metadata companion to
    * [[extractHtml]] (extractHtml drops the whole `<head>`, so the
    * title must be pulled FIRST): first title element's text, tag-
    * stripped, entity-decoded, whitespace-collapsed; empty when the
    * page has none. */
  def htmlTitle(html: Column): Column =
    htmlStripLine(regexp_extract(coalesce(html, lit("")),
      "(?is)<title[^>]*>([\\s\\S]*?)</title\\s*>", 1))

  def extractHtml(html: Column, minChars: Int = 25): Column = {
    require(minChars >= 1, s"minChars must be >= 1, got $minChars")
    val noComments = regexp_replace(coalesce(html, lit("")), "<!--[\\s\\S]*?-->", " ")
    val noContainers = htmlContainerTags.foldLeft(noComments) { (c, t) =>
      regexp_replace(c, s"(?i)<$t\\b[^>]*>[\\s\\S]*?</$t\\s*>", " ")
    }
    val lines = split(regexp_replace(noContainers, htmlBlockPattern, "\n"), "\n")
    // anchor text measured on the RAW line (tags still present), so
    // link density sees the structure the strip erases
    val scored = transform(lines, l => struct(
      htmlStripLine(l).as("txt"),
      aggregate(
        regexp_extract_all(l, lit("(?i)<a\\b[^>]*>([\\s\\S]*?)</a\\s*>"), lit(1)),
        lit(0), (acc, a) => acc + length(htmlStripLine(a))).as("alen")))
    val kept = filter(scored, s =>
      length(s("txt")) >= lit(minChars) && s("alen") * lit(5) <= length(s("txt")))
    array_join(transform(kept, s => s("txt")), "\n")
  }

  // ================================================================ link extraction

  /** The raw `href` values of every `<a>` tag, in document order:
    * double-quoted, single-quoted, and unquoted attribute forms, each
    * entity-decoded one level (an `&amp;` in a URL is an escaped `&`).
    * Codegen'd regexp chain, no UDF; comments/scripts are NOT excluded
    * here — run after the page passed [[extractHtml]]'s sibling
    * cleanup, or accept decoy anchors in machinery (the frontier's
    * admission dedup absorbs them). */
  def extractLinks(html: Column): Column = {
    val pat = "(?i)<a\\b[^>]*\\bhref\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)"
    transform(
      regexp_extract_all(coalesce(html, lit("")), lit(pat), lit(1)),
      v => htmlDecodeEntities(regexp_replace(v, "^[\"']|[\"']$", "")))
  }

  /** The page's `<meta name="robots" content="…">` directives,
    * lowercased and whitespace-normalized (`"noindex, nofollow"` →
    * `"noindex,nofollow"`), `""` when absent; the FIRST such meta tag
    * wins (the conservative reading of a malformed double tag). The
    * compliance companion to [[graft.operators.Robots]]: robots.txt
    * gates the FETCH, meta robots gates INDEXING/FOLLOWING of a page
    * already fetched. Attribute order is free (name before or after
    * content); quoting may be double or single. */
  def htmlMetaRobots(html: Column): Column = {
    // first matching TAG wins regardless of attribute order ([^>]*
    // before the name attribute covers a content-first spelling), then
    // the content attribute is read out of that one tag
    val tag = regexp_extract(coalesce(html, lit("")),
      "(?i)<meta\\b[^>]*\\bname\\s*=\\s*[\"']robots[\"'][^>]*", 0)
    lower(regexp_replace(
      regexp_extract(tag, "(?i)\\bcontent\\s*=\\s*[\"']([^\"']*)[\"']", 1),
      "\\s+", ""))
  }

  /** A named `<meta>` tag's content — the page-metadata read behind
    * snippet/freshness curation signals: Open Graph tags
    * (`property="og:title"`, `og:description`, …),
    * `article:published_time` / `article:modified_time` (the
    * publish-date source a freshness-weighted mix consumes — feed it
    * to [[Recrawl.dueVerdicts]]' lastmod column), plain
    * `name="description"`. Matches `property=` OR `name=` spellings
    * (publishers use either for OG), first tag wins, attribute order
    * free, entity-decoded; `""` when absent. `key` is restricted to
    * the tag-name alphabet so it embeds into the pattern verbatim.
    * Pure codegen'd Column — the [[htmlMetaRobots]] discipline. */
  def htmlMetaContent(html: Column, key: String): Column = {
    require(key.nonEmpty && key.forall(c => c.isLetterOrDigit || c == ':' ||
      c == '_' || c == '-' || c == '.'),
      s"meta key must be [A-Za-z0-9:_.-]+, got '$key'")
    // '.' is the only regex metacharacter the key alphabet admits;
    // escape it by hand (\Q…\E is Java-only — the RE2/DuckDB-portable
    // pattern discipline)
    val k = key.replace(".", "\\.")
    val tag = regexp_extract(coalesce(html, lit("")),
      s"(?i)<meta\\b[^>]*\\b(?:property|name)\\s*=\\s*[\"']$k[\"'][^>]*", 0)
    htmlDecodeEntities(
      regexp_extract(tag, "(?i)\\bcontent\\s*=\\s*[\"']([^\"']*)[\"']", 1))
  }

  /** The page's `<link rel="canonical" href="…">` target (raw — feed
    * [[resolveLinksStaged]] for the absolute form), `""` when absent;
    * first wins; attribute order free. The dedup key a crawl honors
    * BEFORE content fingerprints: the site already told us which
    * spelling is the real one. */
  def htmlCanonical(html: Column): Column = {
    val tag = regexp_extract(coalesce(html, lit("")),
      "(?i)<link\\b[^>]*\\brel\\s*=\\s*[\"']canonical[\"'][^>]*", 0)
    htmlDecodeEntities(
      regexp_extract(tag, "(?i)\\bhref\\s*=\\s*[\"']([^\"']*)[\"']", 1))
  }

  /** [[extractLinks]] restricted to FOLLOWABLE anchors: `<a>` tags
    * whose `rel` contains no `nofollow` token, and the empty set when
    * the page's [[htmlMetaRobots]] declares `nofollow`. Quoted-only
    * hrefs here (an unquoted `rel`-bearing tag is rare enough to
    * ignore); anchors with an empty or missing href drop — a follow
    * target must name a resource. */
  def extractFollowLinks(html: Column): Column = {
    val h = coalesce(html, lit(""))
    val tags = regexp_extract_all(h, lit("(?i)<a\\b[^>]*"), lit(0))
    val followed = filter(tags, t => {
      // quoted rel wins; an UNQUOTED rel=nofollow must also drop (the
      // conservative direction — following a nofollow is the bug)
      val relQ = regexp_extract(t, "(?i)\\brel\\s*=\\s*[\"']([^\"']*)[\"']", 1)
      val relU = regexp_extract(t, "(?i)\\brel\\s*=\\s*([^\\s\"'>]+)", 1)
      !when(relQ =!= "", relQ).otherwise(relU)
        .rlike("(?i)(^|[\\s,])nofollow($|[\\s,])")
    })
    val hrefs = transform(followed, t => htmlDecodeEntities(
      regexp_extract(t, "(?i)\\bhref\\s*=\\s*[\"']([^\"']*)[\"']", 1)))
    when(htmlMetaRobots(html).rlike("(^|,)nofollow($|,)"),
      array().cast("array<string>"))
      .otherwise(filter(hrefs, x => x =!= ""))
  }

  /** Resolve an extracted href against its page URL (RFC 3986 §5, the
    * deterministic subset a crawl frontier needs) — STAGED projections
    * only, the [[normalizeUrlStaged]] codegen discipline. Rules:
    *
    *  - a scheme-prefixed href is already absolute;
    *  - `//host/...` takes the base's scheme;
    *  - `/path` takes the base's origin;
    *  - `?query` replaces the base's query; `""`/`#frag` resolve to
    *    the base itself (query kept, fragment dropped);
    *  - anything else appends to the base's directory, then `./` and
    *    `segment/../` collapse (8 levels per pass shape — a fixed
    *    16-step regexp chain; deeper nesting and surplus leading
    *    `../` past the root are preserved as written, conservative);
    *    dot-segment collapse runs over path+query as one string
    *    (a query containing `/./` is normalized too — documented).
    *
    * A NULL/empty base leaves relative hrefs unresolvable: they come
    * back as written (schemeless), never a crash. */
  def resolveLinksStaged(df: DataFrame, baseCol: String, hrefCol: String,
      outCol: String): DataFrame = {
    val tmp = Seq("__rl_scheme", "__rl_origin", "__rl_nofq", "__rl_dir",
      "__rl_raw", "__rl_ro")
    tmp.foreach(t => require(!df.columns.contains(t),
      s"resolveLinksStaged: input already has internal column '$t'"))
    val base = coalesce(col(baseCol), lit(""))
    // browsers trim stray whitespace around attribute values before
    // resolving; a quoted href=" /x " must not become a relative link
    val href = regexp_replace(coalesce(col(hrefCol), lit("")), "^\\s+|\\s+$", "")
    // "/./" and trailing "/."; then one non-".." segment + "/../"
    val dotPat = "/\\.(/|$)"
    val parentPat = "/(\\.?[^/.][^/]*|\\.\\.[^/]+)/\\.\\.(/|$)"
    df
      .withColumn("__rl_scheme",
        regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*):", 1))
      .withColumn("__rl_origin",
        regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
      .withColumn("__rl_nofq", regexp_replace(base, "[?#].*$", ""))
      .withColumn("__rl_dir",
        when(col("__rl_nofq") === col("__rl_origin"),
          concat(col("__rl_origin"), lit("/")))
          .otherwise(regexp_replace(col("__rl_nofq"), "/[^/]*$", "/")))
      .withColumn("__rl_raw",
        when(href.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), href)
          // a base without a scheme cannot anchor anything: href as written
          .when(col("__rl_scheme") === "", href)
          .when(href.startsWith("//"), concat(col("__rl_scheme"), lit(":"), href))
          .when(href.startsWith("/"), concat(col("__rl_origin"), href))
          .when(href === "" || href.startsWith("#"),
            regexp_replace(base, "#.*$", ""))
          .when(href.startsWith("?"), concat(col("__rl_nofq"), href))
          .otherwise(concat(col("__rl_dir"), href)))
      // dot segments collapse only AFTER the resolved URL's own origin
      // — "/h/../" with h the HOST must never match (a surplus "/../"
      // straight after the authority would otherwise eat it)
      .withColumn("__rl_ro",
        regexp_extract(col("__rl_raw"), "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
      .withColumn(outCol, concat(col("__rl_ro"),
        (1 to 8).foldLeft(
          (1 to 8).foldLeft(
            expr(s"substring(__rl_raw, length(__rl_ro) + 1)")) { (c, _) =>
            regexp_replace(c, dotPat, "/") }) { (c, _) =>
          regexp_replace(c, parentPat, "/") }))
      .drop(tmp: _*)
  }
}
