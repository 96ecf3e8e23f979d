package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * Scale design: everything is expressed as joins/aggregations on
  * blocking keys (hash buckets, band signatures, shared n-grams) — no
  * cross join ever materializes the O(n^2) pair space. Bucket-size caps
  * bound worst-case skew (a degenerate bucket of k docs creates k^2
  * candidate pairs).
  */
object Dedup {

  /** Exact duplicate groups, keyed by md5 of normalized text (one
    * shuffle on the hash; map-side partial agg). Output one row per
    * distinct content: the survivor (min id), the duplicate count. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Incremental exact dedup — admit a NEW batch against an existing
    * corpus. A batch doc is dropped if its content fingerprint already
    * exists in the corpus, or if a batch-mate with the same
    * fingerprint has a smaller id (the [[exact]] survivor rule applied
    * within the batch, so admitting a batch then re-running full
    * [[exact]] changes nothing). The corpus contributes only its
    * DISTINCT fingerprint aggregate, which anti-joins the batch —
    * cost proportional to the batch plus one fingerprint pass; at
    * 100 TB the fingerprint set is a maintained table and the corpus
    * is never rescanned (pass it as `corpusFingerprints`). */
  def exactIncremental(
      batch: DataFrame, corpusFingerprints: DataFrame, idCol: String, textCol: String
  ): DataFrame = {
    // no distinct on the corpus side: anti-join output is unaffected
    // by right-side duplicates, and the maintained set is the LARGE
    // side — an extra aggregation over it per admission buys nothing
    val fresh = batch
      .withColumn("fingerprint", contentFingerprint(col(textCol)))
      .join(corpusFingerprints.select(col("fingerprint")),
        Seq("fingerprint"), "left_anti")
    val w = Window.partitionBy(col("fingerprint")).orderBy(col(idCol))
    fresh.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "fingerprint")
  }

  /** Fingerprint with nulls collapsed to a sentinel: [[exact]] groups
    * null-text docs together (groupBy treats null as a key), but an
    * anti-JOIN on a null fingerprint never matches — without the
    * sentinel a null-text doc would be "fresh" in every batch,
    * re-admitted forever, and the incremental path would disagree
    * with the batch one. */
  private[graft] def contentFingerprint(text: Column): Column =
    coalesce(TextAnalysis.fingerprint(text), lit("__NULL_TEXT__"))

  /** The maintained fingerprint set of a corpus (the other input of
    * [[exactIncremental]]; after admitting a batch, union the batch's
    * fingerprints in). */
  def fingerprints(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(contentFingerprint(col(textCol)).as("fingerprint")).distinct()

  /** (id, ng) exploded shingle stream WITH duplicates — for consumers
    * whose aggregate is duplicate-insensitive (minhash `min`), where
    * paying any dedup (shuffle `.distinct()` or per-row
    * `array_distinct`, which is quadratic on string arrays) buys
    * nothing. */
  /** The n-gram builder shared by every positioned/unpositioned
    * shingle stream (ONE home so a fix to the hot loop lands once):
    * out(i) = tokens i..i+n-1 space-joined. */
  private[graft] def ngramsOf(w: Seq[String], n: Int): Array[String] =
    if (w.length < n) Array.empty[String]
    else {
      val out = new Array[String](w.length - n + 1)
      val sb  = new java.lang.StringBuilder()
      var i = 0
      while (i < out.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(w(i + j))
          j += 1
        }
        out(i) = sb.toString
        i += 1
      }
      out
    }

  def shinglesRaw(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // JVM udf, not a transform(...) lambda: higher-order-function
    // lambdas evaluate INTERPRETED per n-gram, and this runs once per
    // token of the corpus — the single hottest expression in the dedup
    // family
    val ngramUdf = udf { (w: Seq[String]) => ngramsOf(w, n) }
    docs
      .select(col(idCol), toks.as("w"))
      .filter(size(col("w")) >= n)
      .select(col(idCol), explode(ngramUdf(col("w"))).as("ng"))
  }

  /** Distinct (id, ng) shingle set — set semantics for Jaccard. The
    * `.distinct()` exchange doubles as a reuse point: both sides of the
    * inverted-index self-join read the same shuffled output. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    shinglesRaw(docs, idCol, textCol, n).distinct()

  /** Scan-local per-document distinct shingles: identical set semantics
    * to [[shingles]] (dedup only ever applies within a document — the
    * id rides along), but deduped inside the per-row UDF, so the stream
    * plans NO exchange. Prefer this when the stream has a SINGLE
    * consumer (e.g. [[Decontaminate]]'s broadcast join): the n-gram
    * stream is larger than the input text, and shuffling it to disk
    * costs more than the hash-set it avoids. [[shingles]]' global
    * `.distinct()` still wins when several plan branches read the same
    * stream ([[ngramJaccardPairs]] has five) — there the exchange is
    * the one materialization they all reuse. */
  def shinglesLocal(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val ngramSetUdf = udf { (w: Seq[String]) =>
      if (w.length < n) Array.empty[String]
      else {
        val seen = new java.util.LinkedHashSet[String](w.length * 2)
        val sb   = new java.lang.StringBuilder()
        var i = 0
        while (i <= w.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(w(i + j))
            j += 1
          }
          seen.add(sb.toString)
          i += 1
        }
        seen.toArray(new Array[String](seen.size))
      }
    }
    docs
      .select(col(idCol), toks.as("w"))
      .filter(size(col("w")) >= n)
      .select(col(idCol), explode(ngramSetUdf(col("w"))).as("ng"))
  }

  /** Exact n-gram Jaccard similarity join via inverted index: explode
    * shingles, equi-join on the shingle (only docs sharing >=1 shingle
    * ever pair up), count intersections, compute
    * |A∩B| / (|A|+|B|-|A∩B|). This IS the scalable exact formulation —
    * the shuffle key is the shingle, not the pair.
    *
    * `maxDf` bounds the inverted index's worst case: a shingle present
    * in k documents emits k² intersection rows, so one boilerplate
    * shingle (a license header, a nav bar) shared by millions of docs
    * is a job-killer. Shingles with document frequency > maxDf are
    * dropped from BOTH the intersection and the size counts — the
    * result is exact Jaccard over the reduced shingle universe. Such
    * shingles carry ~zero discrimination signal (they intersect nearly
    * every pair), so near-dup ranking is preserved. The default never
    * triggers below 100k-doc corpora; set it to the scale where a
    * shingle is plainly boilerplate. */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.5, maxDf: Int = 100000
  ): DataFrame = {
    val all = shingles(docs, idCol, textCol, n)
    // hot shingles are FEW by definition — at df > maxDf their count is
    // bounded by total_shingles / maxDf — so the anti-join broadcasts
    // the hot side instead of re-shuffling the whole shingle stream on
    // the ng key (the Decontaminate shortlist shape: tiny blocklist,
    // streaming probe side)
    val hot = all.groupBy(col("ng")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select(col("ng"))
    val ngr   = all.join(broadcast(hot), Seq("ng"), "left_anti")
    val sizes = ngr.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = ngr
      .as("a")
      .join(ngr.as("b"),
        col("a.ng") === col("b.ng") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .agg(count(lit(1)).as("icount"))
    inter
      .join(sizes.withColumnRenamed(idCol, "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed(idCol, "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        col("icount").cast("double") / (col("sz_a") + col("sz_b") - col("icount")))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Exact n-gram Jaccard join via PREFIX FILTERING [Chaudhuri, Ganti
    * & Kaushik, ICDE 2006; Xiao et al., WWW 2008 (PPJoin)] — the
    * candidate-bounded alternative to [[ngramJaccardPairs]]' full
    * inverted index. Order every document's shingles by ascending
    * document frequency (rarest first, ties by shingle text): any pair
    * with Jaccard ≥ θ MUST share a shingle inside each side's first
    * `|A| − ceil(θ·|A|) + 1` shingles, so only those prefixes are
    * indexed. A boilerplate shingle (license header, nav bar) has
    * maximal df, sorts LAST, and lands in almost no prefix — the k²
    * posting blowup [[ngramJaccardPairs]] needs `maxDf` to cap simply
    * never forms, with NO reduced-universe approximation: candidates
    * are verified against the full shingle sets (the scan-local sorted
    * FNV hash sets of [[ngramJaccardForPairs]]), so the result is
    * exact Jaccard over the FULL universe — gated against the same
    * oracle as the inverted-index form.
    *
    * Candidates additionally pass PPJoin's LENGTH filter before they
    * exist as rows: jaccard ≥ θ forces |A∩B| ≥ θ·|A∪B| ≥ θ·max(|A|,|B|)
    * while |A∩B| ≤ min(|A|,|B|), so θ·max ≤ min is necessary. Both
    * sizes already ride on the prefix rows, making the filter a free
    * join predicate that drops every size-incompatible prefix collision
    * before the distinct and the verification pass.
    *
    * Shuffle shape: df agg + rank join on the shingle key, ONE window
    * exchange on the doc id (prefix rank + set size share it), the
    * prefix equi-join on the shingle key, and two id-key joins
    * attaching the scan-local hash sets to the (few) candidates — no
    * packed `collect_set` arrays ever ride on a pair row (a pair of
    * large web documents would otherwise carry both full shingle
    * arrays through the join). The pair space never materializes
    * beyond length-compatible prefix collisions. */
  def jaccardPrefixPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.5
  ): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      s"prefix filtering needs 0 < minJaccard <= 1, got $minJaccard")
    import org.apache.spark.sql.expressions.Window
    val all   = shingles(docs, idCol, textCol, n)
    val dfreq = all.groupBy(col("ng")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col(idCol)).orderBy(col("df"), col("ng"))
    val bySet    = Window.partitionBy(col(idCol))
    // the prefix bound ceil(θ·|A|) MUST be exact: in doubles,
    // θ=0.07 · |A|=100 is 7.000000000000001 and ceil gives 8 — one
    // prefix element too few, and a pair at exactly θ can silently
    // miss. Decimal multiplication of the θ literal (shortest decimal
    // rendering of the double) against the integer size is exact, so
    // the ceil is the rational one
    val thetaDec = lit(new java.math.BigDecimal(
      java.lang.Double.toString(minJaccard)))
    val prefix = all.join(dfreq, "ng")
      .withColumn("rn", row_number().over(byRarity))
      .withColumn("sz", count(lit(1)).over(bySet))
      .filter(col("rn") <= col("sz") - ceil(thetaDec * col("sz")) + 1)
      .select(col(idCol), col("ng"), col("sz"), col("rn"))
    // two join-side filters, both in exact decimal arithmetic so a
    // pair at exactly θ survives (the prefix bound's discipline):
    //  - LENGTH (PPJoin): jaccard ≥ θ forces θ·max(|A|,|B|) ≤ min.
    //  - POSITIONAL (PPJoin): a collision at prefix ranks (rn_a, rn_b)
    //    bounds the intersection by 1 + min(sz_a−rn_a, sz_b−rn_b),
    //    which must reach the θ-equivalent count θ·(sz_a+sz_b)/(1+θ).
    //    Lossless before the distinct: for any true pair the FIRST
    //    common shingle in the global (df, ng) order lies inside BOTH
    //    prefixes (else one prefix is disjoint from the other set and
    //    the intersection can't reach θ·sz), and at that collision the
    //    bound holds by construction — so at least one collision row
    //    per true pair passes.
    val cands = prefix.as("a")
      .join(prefix.as("b"),
        col("a.ng") === col("b.ng") && col(s"a.$idCol") < col(s"b.$idCol") &&
          thetaDec * greatest(col("a.sz"), col("b.sz")) <=
            least(col("a.sz"), col("b.sz")) &&
          (lit(1) + thetaDec) *
            (lit(1) + least(col("a.sz") - col("a.rn"), col("b.sz") - col("b.rn"))) >=
            thetaDec * (col("a.sz") + col("b.sz")))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
    // verification: sorted-xxhash64 shingle sets packed in ONE pass
    // over the shared distinct-shingle exchange (the groupBy exchange
    // is referenced twice and deduped by ReuseExchange), then a
    // merge-intersection over the two sorted long arrays per candidate
    // pair. Three wins over the packed-string form this replaced:
    // ~3x smaller join payload (8 B/shingle vs the string), no per-row
    // string hash-set build (`array_intersect` allocates one per pair),
    // and identical Jaccard values up to a ~2^-64 hash collision (the
    // same bound every verified LSH gate already accepts)
    val sets = all.groupBy(col(idCol))
      .agg(sort_array(collect_set(xxhash64(col("ng")))).as("sh"))
    cands
      .join(sets.select(col(idCol).as("doc_a"), col("sh").as("sa")), "doc_a")
      .join(sets.select(col(idCol).as("doc_b"), col("sh").as("sb")), "doc_b")
      .withColumn("jaccard", sortedJaccardUdf(col("sa"), col("sb")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Exact Jaccard of two SORTED distinct arrays by merge-intersection
    * — linear in the array lengths, no per-row hash-set allocation.
    * Parameter type is PRIMITIVE Array[Long] on purpose: Spark feeds it
    * via `ArrayData.toLongArray` (one memcpy), where a Seq[Long]
    * parameter boxes every element — at 10^5 candidate pairs times
    * hundreds of shingles that allocation dominates the verify. */
  private lazy val sortedJaccardUdf = udf { (a: Array[Long], b: Array[Long]) =>
    var i = 0
    var j = 0
    var inter = 0
    while (i < a.length && j < b.length) {
      val x = a(i)
      val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Per-document duplicated-span signal [Lee et al., ACL 2022,
    * "Deduplicating Training Data Makes Language Models Better"]: how
    * many of a document's distinct n-token spans also occur in at
    * least one OTHER document, plus the ratio. Exact-substring overlap
    * at span granularity is the memorization-risk complement to
    * whole-document Jaccard — a doc can be globally unique yet carry a
    * large verbatim block (quoted article, license text) that span
    * dedup flags and document dedup cannot.
    *
    * Shape: ONE distinct-shingle exchange feeds both the per-span
    * document frequency (group on the span) and, through a left join
    * back on the same key, a single per-doc aggregation — count vs
    * conditional count in one pass, no second corpus scan. A span
    * shared by k documents contributes k marker rows (linear), never
    * k² pair rows — no cap needed, unlike the intersection joins.
    * Documents shorter than n tokens emit no row (no spans exist). */
  def duplicatedSpans(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 10
  ): DataFrame = {
    val sh  = shingles(docs, idCol, textCol, n)
    // distinct (id, ng) stream => count per ng IS the document frequency
    val dup = sh.groupBy(col("ng")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select(col("ng"), lit(1).as("__dup"))
    sh.join(dup, Seq("ng"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"), count(col("__dup")).as("n_dup_ngrams"))
      .withColumn("dup_ratio",
        col("n_dup_ngrams").cast("double") / col("n_ngrams"))
  }

  /** Duplicated-span REMOVAL — the other half of [[duplicatedSpans]]'
    * signal, after Lee et al., ACL 2022 ("Deduplicating Training Data
    * Makes Language Models Better"): their ExactSubstr pipeline CUTS
    * corpus-repeated substrings instead of dropping whole documents.
    * Here the unit is the n-token shingle: every token covered by an
    * n-gram occurring in ≥ `minDf` distinct documents is removed, the
    * remaining tokens rejoin in order (so ONLY the boilerplate span
    * goes — the document survives with its unique content).
    *
    * Coverage is computed with ONE per-document window, not an
    * interval explode: token `j` is covered iff some flagged shingle
    * starts in `[j-n+1, j]`, i.e. iff the RUNNING MAX of flagged
    * start positions at `j` is ≥ `j-n+1` — an O(tokens) rule with no
    * n-fold fan-out, the [[graft.operators.Sessions]] window
    * discipline. Exchanges: the shingle distinct + df groupBy (shared
    * shape with [[duplicatedSpans]]), then one id-partitioned window
    * + grouped rebuild. Output keeps EVERY input document:
    * `(idCol, text_clean, n_tokens, n_tokens_kept)` — a fully-covered
    * document comes back with empty text, not silently dropped. */
  def removeDuplicatedSpans(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 10, minDf: Int = 2
  ): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val toks = TextAnalysis.tokens(col(textCol))
    val ngramUdf = udf { (w: Seq[String]) => ngramsOf(w, n) }
    val posSh = docs
      .select(col(idCol), toks.as("w"))
      .filter(size(col("w")) >= n)
      .select(col(idCol), posexplode(ngramUdf(col("w"))).as(Seq("spos", "ng")))
    val dup = posSh.select(col(idCol), col("ng")).distinct()
      .groupBy(col("ng")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("ng"))
    val flagged = posSh.join(dup, Seq("ng"), "left_semi")
      .select(col(idCol), col("spos"))
    val tok = docs
      .select(col(idCol), posexplode(toks).as(Seq("pos", "t")))
      .filter(col("t") =!= "") // empty text tokenizes to [""] — no tokens
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val covered = tok
      .join(flagged.withColumnRenamed("spos", "pos").withColumn("__f", lit(1)),
        Seq(idCol, "pos"), "left")
      .withColumn("__runmax", max(when(col("__f") === 1, col("pos"))).over(w))
      .withColumn("__covered",
        col("__runmax").isNotNull && col("__runmax") >= col("pos") - (n - 1))
    val rebuilt = covered
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(!col("__covered"),
            struct(col("pos"), col("t"))))),
          s => s.getField("t")), " ").as("text_clean"),
        count(when(!col("__covered"), lit(1))).as("n_tokens_kept"))
    // coalesce BEFORE counting: tokenCount(null) is NULL (or -1 under
    // legacy sizeOfNull), and a null/negative token count poisons
    // downstream ratio/budget arithmetic — null text counts 0
    docs.select(col(idCol),
        TextAnalysis.tokenCount(coalesce(col(textCol), lit(""))).as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("text_clean"), lit("")).as("text_clean"),
        col("n_tokens").cast("long").as("n_tokens"),
        coalesce(col("n_tokens_kept"), lit(0L)).cast("long").as("n_tokens_kept"))
  }

  import Hashing.{fnvShingle, mix64}

  /** MinHash signatures: k per-seed minimum hashes over the document's
    * shingle set, computed in ONE compiled pass per document — the
    * signature is a pure function of the token list, so it needs no
    * shingle explode, no groupBy, and therefore NO SHUFFLE at any
    * corpus size (the previous k-parallel-aggregate form shuffled
    * partially-aggregated rows per doc). Duplicate shingles are
    * harmless: min is duplicate-insensitive. */
  def minhashSignatures(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 3, k: Int = 64
  ): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val sigUdf = udf { (w: Seq[String]) =>
      val sig = Array.fill(k)(Long.MaxValue)
      var i = 0
      val last = w.length - n
      while (i <= last) {
        val h = fnvShingle(w, i, n)
        var j = 0
        while (j < k) {
          val hj = mix64(h + j * 0xD1B54A32D192ED03L)
          if (hj < sig(j)) sig(j) = hj
          j += 1
        }
        i += 1
      }
      sig
    }
    docs
      .select(col(idCol), toks.as("w"))
      .filter(size(col("w")) >= n)
      .select(col(idCol), sigUdf(col("w")).as("sig"))
  }

  /** Compiled band hashing (FNV fold of the band's rows, band index
    * mixed in); the lambda/concat_ws formulation interpreted 16
    * string-builds per doc. */
  private def bandHashUdf(k: Int, r: Int) = {
    val bands = k / r
    udf { (sig: Seq[Long]) =>
      Array.tabulate(bands) { b =>
        var h = 0xCBF29CE484222325L
        var i = b * r
        val end = b * r + r
        while (i < end) {
          var x = sig(i)
          var byte = 0
          while (byte < 8) { h ^= (x & 0xFFL); h *= 0x100000001B3L; x >>>= 8; byte += 1 }
          i += 1
        }
        mix64(h + b)
      }
    }
  }

  /** The LSH band postings of a corpus: one `(id, band, bh)` row per
    * document per band — scan-local (signature + band hash inside the
    * projection). This is the maintained artifact of incremental
    * near-dup admission ([[minhashIncremental]]): keep it as a table,
    * append each admitted batch's postings, and the corpus text is
    * only ever re-read for bucket-colliding docs. */
  def bandPostings(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, r: Int = 4
  ): DataFrame =
    minhashSignatures(docs, idCol, textCol, n, k)
      .select(col(idCol), posexplode(bandHashUdf(k, r)(col("sig"))).as(Seq("band", "bh")))

  /** MinHash + LSH near-duplicate pairs: band the signature (bands of
    * `r` rows), bucket-join on (band, band-hash), then verify candidate
    * pairs with exact Jaccard. Buckets larger than `maxBucket` are
    * dropped SILENTLY by construction (a degenerate bucket means the
    * band is non-discriminative — boilerplate-heavy corpora — and
    * would quadratically blow up candidate generation); operators who
    * need to see what was dropped can run
    * `Skew.keyHistogram(bandedSignatures, "bh")` as a diagnostic
    * before committing to a maxBucket. */
  def minhashLshPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, r: Int = 4,
      minJaccard: Double = 0.5, maxBucket: Int = 1000
  ): DataFrame = {
    val banded = bandPostings(docs, idCol, textCol, n, k, r)
    val bucketed = capBuckets(banded, Seq("band", "bh"), maxBucket)
      .groupBy("band", "bh")
      .agg(collect_list(col(idCol)).as("ids"))
    val candidates = bucketed
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), y -> named_struct('a', least(x, y), 'b', greatest(x, y)))))"))
        .as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
    // verify candidates with exact Jaccard, re-shingling ONLY docs that
    // appear in a candidate pair (left-semi pushdown): at corpus scale
    // candidates are a vanishing fraction, so the verification pass
    // tokenizes thousands of docs, not billions
    val candDocs = candidates
      .select(explode(array(col("doc_a"), col("doc_b"))).as(idCol))
      .distinct()
    val restricted = docs.join(candDocs, Seq(idCol), "left_semi")
    ngramJaccardForPairs(restricted, idCol, textCol, candidates, n, minJaccard)
  }

  /** Incremental NEAR-dup admission: the [[exactIncremental]] contract
    * lifted from fingerprints to MinHash-LSH. A batch doc is admitted
    * iff (a) it is the min-id representative of its within-batch
    * near-dup component ([[survivors]]' rule, so batch-mates of a
    * rejected doc stay rejected — they are transitively near the
    * corpus), and (b) no verified corpus near-dup exists.
    *
    * Cost is proportional to the batch: batch signatures/bands are
    * scan-local, corpus candidates come from an equi-join of the
    * batch's postings against the maintained `corpusBands` table
    * (bucket-capped on the corpus side like the in-batch path), and
    * the corpus TEXT is re-read only for colliding docs (left-semi
    * pushdown into the verification). After admission, append
    * `bandPostings` of the admitted docs to the store — the corpus is
    * never rescanned.
    *
    * Like all incremental admission, membership is judged against the
    * ADMITTED corpus: a chain doc→rejected→corpus does not reject,
    * because the middle doc never entered the corpus (the standard
    * production semantics; the batch-internal component rule above is
    * what keeps a single batch self-consistent). */
  def minhashIncremental(
      batch: DataFrame, corpus: DataFrame, corpusBands: DataFrame,
      idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, r: Int = 4,
      minJaccard: Double = 0.5, maxBucket: Int = 1000
  ): DataFrame = {
    val bb = bandPostings(batch, idCol, textCol, n, k, r)
    // restrict the corpus postings to the batch's (band, bh) keys FIRST
    // (left-semi): admission cost must be proportional to the batch,
    // not the store — a window over the whole posting table would pay
    // a full-store exchange per micro-batch. The bucket cap then
    // counts within the restricted set, which is the TRUE bucket size
    // for those keys (the semi-join keeps whole buckets). A degenerate
    // corpus bucket (boilerplate band hash) would otherwise blow up
    // the candidate join exactly like an uncapped in-batch bucket.
    val w = Window.partitionBy(col("band"), col("bh"))
    val cb = corpusBands
      .join(bb.select(col("band"), col("bh")).distinct(),
        Seq("band", "bh"), "left_semi")
      .withColumn("__bn", count(lit(1)).over(w))
      .filter(col("__bn") <= maxBucket)
      .select(col("band"), col("bh"), col(idCol).as("__corpus_id"))
    val cross = bb.join(cb, Seq("band", "bh"))
      .select(col("__corpus_id").as("doc_a"), col(idCol).as("doc_b"))
      .distinct()
    val crossDocIds = cross.select(col("doc_a").as(idCol))
      .unionAll(cross.select(col("doc_b").as(idCol))).distinct()
    val crossDocs = corpus.select(col(idCol), col(textCol))
      .unionAll(batch.select(col(idCol), col(textCol)))
      .join(crossDocIds, Seq(idCol), "left_semi")
    val rejectedByCorpus = ngramJaccardForPairs(
      crossDocs, idCol, textCol, cross, n, minJaccard)
      .select(col("doc_b").as(idCol)).distinct()
    val batchReps = survivors(batch, idCol, minhashLshPairs(
      batch, idCol, textCol, n, k, r, minJaccard, maxBucket))
    batchReps.join(rejectedByCorpus, Seq(idCol), "left_anti")
  }

  /** Keep only rows whose bucket has between 2 and `maxBucket` members,
    * BEFORE any collect_list materializes the bucket: filtering on
    * `size(collect_list(...))` would first build the full member array
    * of a degenerate bucket in a single aggregation buffer — the guard
    * itself OOMing on exactly the bucket it exists to drop. A window
    * count does it in the SAME single shuffle the caller's groupBy
    * needs (WindowExec buffers each bucket in a spillable row array,
    * disk-backed, never one in-memory aggregation buffer), and the
    * input — the expensive signature scan — is evaluated exactly once,
    * where a count + semi-join formulation would scan it twice. */
  private def capBuckets(rows: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    rows
      .withColumn("__bucket_n", count(lit(1)).over(w))
      .filter(col("__bucket_n").between(2, maxBucket))
      .drop("__bucket_n")
  }

  /** Exact Jaccard evaluated only for the given candidate (doc_a, doc_b)
    * pairs, as a PAIR-LOCAL computation. Each doc's distinct shingle set
    * is computed scan-side in one compiled pass (a sorted array of the
    * same 64-bit FNV shingle hashes [[minhashSignatures]] minimizes —
    * identity up to a ~2^-64 collision), the pair list joins its two
    * sides, and a merge-intersection over the two sorted arrays yields
    * the exact Jaccard. Two equi-joins total — no shingle explode, no
    * per-shingle shuffle, no pair groupBy, no size-lookup joins; the
    * relational formulation this replaced needed six exchanges for what
    * is a per-pair scalar. At corpus scale the pair list is small by
    * construction (LSH candidates), so both joins broadcast the pairs
    * and the shingle-set scan streams. */
  def ngramJaccardForPairs(
      docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, n: Int, minJaccard: Double
  ): DataFrame = {
    import Hashing.fnvShingle
    val setUdf = udf { (w: Seq[String]) =>
      // null text -> empty shingle set (jaccard 0 to everything), not
      // an executor NPE: at corpus scale a few null documents are a
      // certainty and must not kill the verification pass
      val m = if (w == null) 0 else w.length - n + 1
      if (m <= 0) Array.empty[Long]
      else {
        val hs = new Array[Long](m)
        var i = 0
        while (i < m) { hs(i) = fnvShingle(w, i, n); i += 1 }
        java.util.Arrays.sort(hs)
        var out = 1
        var j = 1
        while (j < m) { if (hs(j) != hs(j - 1)) { hs(out) = hs(j); out += 1 }; j += 1 }
        if (out == m) hs else java.util.Arrays.copyOf(hs, out)
      }
    }
    val sets = docs.select(col(idCol), setUdf(TextAnalysis.tokens(col(textCol))).as("sh"))
    pairs
      .join(sets.select(col(idCol).as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets.select(col(idCol).as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard", sortedJaccardUdf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 64-bit SimHash per document: sign-aggregate the per-token hash
    * bits (+1/-1 weighting), emitted as a long. Scan-local like
    * [[minhashSignatures]]. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // one compiled pass per doc: the 64 signed bit counters are a pure
    // function of the token list — no token explode, no groupBy, no
    // shuffle (the aggregate formulation shuffled 64 sums per doc)
    val shUdf = udf { (w: Seq[String]) =>
      val counts = new Array[Int](64)
      var i = 0
      while (i < w.length) {
        val h = mix64(fnvShingle(w, i, 1))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
        i += 1
      }
      var sh = 0L
      var j = 0
      while (j < 64) { if (counts(j) > 0) sh |= (1L << j); j += 1 }
      sh
    }
    // token-less docs emit no signature (as the exploded formulation did)
    docs
      .select(col(idCol), toks.as("w"))
      .filter(size(col("w")) >= 1)
      .select(col(idCol), shUdf(col("w")).as("simhash"))
  }

  /** SimHash near-duplicate pairs: band the 64-bit hash into four
    * 16-bit chunks (pigeonhole: hamming distance <= 3 implies at least
    * one identical chunk), bucket-join, verify by exact bit_count of
    * the xor. Buckets larger than `maxBucket` are dropped silently,
    * like [[minhashLshPairs]]: a degenerate (band, chunk) bucket —
    * boilerplate-heavy or near-empty docs sharing a 16-bit chunk —
    * would otherwise make candidate generation quadratic in the bucket.
    * The simhash value rides inside the bucket so verification needs no
    * second corpus scan. */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000
  ): DataFrame =
    hamming64Pairs(simhash(docs, idCol, textCol), idCol, "simhash", maxHamming, maxBucket)

  /** Hamming-ball candidate pairs over ANY 64-bit signature column
    * (SimHash, image dHash, …) with EXACT recall inside the radius:
    * split the hash into `maxHamming + 1` contiguous bit bands (widths
    * differing by at most one bit — pigeonhole: at most `maxHamming`
    * differing bits leave at least one band identical), bucket-join per
    * band, verify by exact xor `bit_count`. Banding derived from the
    * radius closes the silent-recall gap a fixed 4×16 split has for
    * `maxHamming > 3`. Buckets over `maxBucket` drop like every
    * blocking join here (a degenerate chunk is k² candidates). Output
    * `(doc_a, doc_b, hamming)`, doc_a < doc_b. */
  /** Pigeonhole banding of a 64-bit signature for hamming radius
    * `maxHamming`: one row per (id, hash, band, chunk), bands =
    * contiguous bit ranges [b·64/(maxHamming+1), (b+1)·64/(maxHamming
    * +1)) — at most `maxHamming` differing bits leave at least one
    * band identical. Shared by the pair join below and the
    * [[graft.streaming.StreamingImageDedup]] posting store. */
  def hamming64Bands(
      sigs: DataFrame, idCol: String, hashCol: String, maxHamming: Int
  ): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31,
      s"maxHamming must be in [0, 31] (bands need >= 2 bits), got $maxHamming")
    val nBands = maxHamming + 1
    // band b covers bits [b*64/nBands, (b+1)*64/nBands)
    val bandExprs = (0 until nBands).map { b =>
      val lo = b * 64 / nBands
      val w  = (b + 1) * 64 / nBands - lo
      val mask = if (w == 64) -1L else (1L << w) - 1L
      s"named_struct('band', $b, 'chunk', shiftright($hashCol, $lo) & CAST($mask AS BIGINT))"
    }.mkString("array(", ", ", ")")
    sigs.select(
      col(idCol), col(hashCol),
      explode(expr(bandExprs)).as("bb"))
      .select(col(idCol), col(hashCol), col("bb.band").as("band"), col("bb.chunk").as("chunk"))
  }

  def hamming64Pairs(
      sigs: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int, maxBucket: Int
  ): DataFrame = {
    val banded = hamming64Bands(sigs, idCol, hashCol, maxHamming)
    val bucketed = capBuckets(banded, Seq("band", "chunk"), maxBucket)
      .groupBy("band", "chunk")
      .agg(collect_list(struct(col(idCol), col(hashCol))).as("members"))
    // sort_array orders struct members by id (first field), so x always
    // precedes y and the emitted pair is already (min, max) — the same
    // slice-based intra-bucket pairing as minhashLshPairs
    val pairs = bucketed
      .withColumn("ms", sort_array(col("members")))
      .select(explode(expr(
        s"""flatten(transform(ms, (x, i) ->
           |  transform(slice(ms, i + 2, size(ms)), y ->
           |    named_struct('doc_a', x.$idCol, 'doc_b', y.$idCol,
           |                 'sha', x.$hashCol, 'shb', y.$hashCol))))""".stripMargin))
        .as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.sha").as("sha"), col("p.shb").as("shb"))
      .distinct()
    pairs
      .withColumn("hamming", bit_count(col("sha").bitwiseXOR(col("shb"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Cluster near-duplicate pairs into connected components:
    * every doc converges to the minimum id reachable through the pair
    * graph. Each round combines one hop of neighbor-min propagation
    * with pointer jumping (rep := rep's rep), so rounds needed grow
    * with log(diameter) — `maxIter = 20` covers any realistic
    * component; if a pathological graph still hasn't converged the
    * call FAILS rather than silently returning partial clusters
    * (callers compare against exact transitive closures).
    * Returns (doc, cluster_rep). */
  // rounds checkpoint through the shared [[Lineage]] snapshot (persisted
  // Row RDD wrapped in a fresh leaf plan, releasable once superseded)
  private def snapshot(df: DataFrame): Lineage.Snapshot = Lineage.snapshot(df)

  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .distinct()
      .cache()
    // every round re-derives from the previous round's MATERIALIZED
    // labels ([[snapshot]]), without which the self-referencing joins
    // double the logical plan per round and Catalyst planning blows up
    // after ~8 rounds
    var labels = snapshot(
      edges.select(col("a").as("doc"))
        .union(edges.select(col("b").as("doc")))
        .distinct()
        .withColumn("rep", col("doc")))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // each doc adopts the smallest rep among itself and its neighbors
      val viaNeighbors = edges
        .join(labels.df.withColumnRenamed("doc", "b").withColumnRenamed("rep", "nrep"), Seq("b"))
        .groupBy(col("a").as("doc"))
        .agg(min(col("nrep")).as("nrep"))
      val oneHop = snapshot(
        labels.df
          .join(viaNeighbors, Seq("doc"), "left_outer")
          .select(col("doc"), least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep")))
      // pointer jumping: rep := min(rep, rep's rep) — path lengths halve
      // per round, so long chains converge in O(log diameter) rounds
      // instead of one hop per round
      val updated = snapshot(
        oneHop.df
          .join(oneHop.df.select(col("doc").as("rep"), col("rep").as("rep2")), Seq("rep"), "left_outer")
          .select(col("doc"), least(col("rep"), coalesce(col("rep2"), col("rep"))).as("rep")))
      converged = updated.df.join(labels.df.withColumnRenamed("rep", "prev"), Seq("doc"))
        .filter(col("rep") =!= col("prev")).isEmpty
      // updated is materialized and the convergence probe has consumed
      // the old labels — release the superseded snapshots now, or a
      // slow-converging graph pins up to 2*maxIter label sets in
      // executor storage
      labels.release()
      oneHop.release()
      labels = updated
      i += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIter rounds")
    labels.df
  }

  /** Survivor view: keep one doc (the minimum id) per near-duplicate
    * cluster; unpaired docs survive untouched. */
  def survivors(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps  = connectedComponents(pairs)
    val losers = comps.filter(col("doc") =!= col("rep")).select(col("doc").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Survivor view keeping the BEST doc per near-duplicate cluster
    * instead of the smallest id: for each connected component of the
    * pair graph the survivor maximizes `scoreCol` (ties broken by
    * smallest id), so a dedup pass keeps the longest / highest-quality
    * copy of each near-duplicate group — the curation policy most
    * pipelines actually want (the boilerplate-stripped original beats
    * its truncated syndication copy).
    *
    * Scale shape: the window runs over the CLUSTER table (only docs
    * that appear in some pair — tiny relative to the corpus), keyed by
    * the cluster representative; the corpus itself is touched once by
    * the final anti-join. Determinism: (score desc, id asc) is a total
    * order per cluster. */
  def survivorsBest(
      docs: DataFrame, idCol: String, pairs: DataFrame, scoreCol: String
  ): DataFrame = {
    val comps  = connectedComponents(pairs)
    val scored = comps.join(
      docs.select(col(idCol).as("doc"), col(scoreCol).as("__score")), Seq("doc"))
    val w = Window.partitionBy(col("rep")).orderBy(col("__score").desc, col("doc"))
    val losers = scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") =!= 1)
      .select(col("doc").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Line-level boilerplate removal [CCNet: Wenzek et al., LREC 2020;
    * RefinedWeb: Penedo et al., NeurIPS 2023]: a line occurring in
    * `minDf` or more DISTINCT documents is boilerplate (navigation
    * bars, cookie banners, license headers) and is removed from EVERY
    * document, including the first. Output one row per input doc:
    * the id, `n_lines` (total lines), `n_removed` (boilerplate lines
    * dropped), and `text_clean` (the remaining lines re-joined in
    * original order; empty string when every line was boilerplate).
    * Blank lines (whitespace-only) never count toward document
    * frequency and are always kept.
    *
    * Scale shape: one exchange computes per-line document frequency
    * (map-side partial agg on the line key), the flag join is a plain
    * equi-join on the line key (AQE picks broadcast when the
    * duplicated-line set is small — in real web corpora it is large,
    * so the join is NOT hint-forced), and one groupBy on the doc id
    * reassembles each document from its own lines (per-group state
    * bounded by document size). No window, no collect, nothing
    * quadratic: cost is linear in total line count.
    *
    * Docs with NULL text produce no line rows and are absent from the
    * output (mirror a SQL `unnest`); guard upstream if they must
    * survive. */
  def lineDedup(
      docs: DataFrame, idCol: String, textCol: String,
      minDf: Int = 2, delim: String = "\n"
  ): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2 (1 would drop every non-blank line), got $minDf")
    guardLineCols(idCol) // before lineDf builds frames: the curated
    // message must win over an ambiguous-reference analysis error
    lineDedupAgainst(docs, idCol, textCol,
      lineDf(docs, idCol, textCol, delim)
        .filter(col("n_docs") >= minDf).select(col("line")),
      delim)
  }

  /** Per-line document frequency of a corpus: (line, n_docs) over
    * non-blank lines — the maintained statistic behind [[lineDedup]]
    * (and its streaming twin's per-batch summaries: distinct-doc
    * counts are additive across disjoint batches). */
  def lineDf(
      docs: DataFrame, idCol: String, textCol: String, delim: String = "\n"
  ): DataFrame = {
    guardLineCols(idCol)
    lineRows(docs, idCol, textCol, delim)
      .filter(trim(col("line")) =!= "")
      .groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
  }

  /** [[lineDedup]] against an EXTERNAL duplicated-line set (one `line`
    * column) — the admission path: clean a batch against a maintained
    * corpus-wide line-df store without rescanning the corpus. */
  def lineDedupAgainst(
      docs: DataFrame, idCol: String, textCol: String, hot: DataFrame,
      delim: String = "\n"
  ): DataFrame = {
    require(delim.nonEmpty, "delim must be non-empty")
    guardLineCols(idCol)
    // distinct on the external set: a duplicate hot row would multiply
    // matching line rows through the join and silently inflate
    // n_lines/n_removed — cheap insurance on the small side
    lineRows(docs, idCol, textCol, delim)
      .join(hot.select(col("line")).distinct()
        .withColumn("__hot", lit(true)), Seq("line"), "left")
      .withColumn("__hot", coalesce(col("__hot"), lit(false)))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__hot"), lit(1L)).otherwise(lit(0L))).as("n_removed"),
        array_join(
          transform(
            filter(
              sort_array(collect_list(struct(col("idx"), col("line"), col("__hot")))),
              e => !e.getField("__hot")),
            e => e.getField("line")),
          delim).as("text_clean"))
  }

  private def guardLineCols(idCol: String): Unit =
    require(!Seq("line", "idx", "n_lines", "n_removed", "text_clean").contains(idCol),
      s"idCol '$idCol' collides with a lineDedup working/output column")

  private def lineRows(
      docs: DataFrame, idCol: String, textCol: String, delim: String): DataFrame =
    docs.select(
      col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim)))
        .as(Seq("idx", "line")))

  // ================================================================ winnowing

  /** Winnowing document fingerprints [Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS local fingerprinting algorithm]: hash every
    * token `n`-gram (md5, 16 hex chars), slide a window of `w`
    * consecutive gram positions, select each window's minimum — ties by
    * the RIGHTMOST (largest position) minimal hash, i.e. min by
    * `(hash asc, pos desc)` — and emit the DISTINCT selected
    * `(pos, fp)` pairs. Density ~`2/(w+1)` of the gram stream, with the
    * winnowing guarantee: two documents sharing any token run of at
    * least `w + n - 1` tokens share at least one fingerprint — the
    * local-fingerprint property plain 0 mod p sampling lacks.
    *
    * Documents with fewer than `w` grams winnow one window over what
    * they have; fewer than `n` tokens → no fingerprints (absent).
    *
    * Scale shape: entirely SCAN-LOCAL — one compiled pass per document
    * (rolling monotonic deque, O(grams) amortized), no shuffle, no
    * state beyond one document's gram hashes. The md5-hex prefix makes
    * the selection rule reproducible by any engine (the DuckDB oracle
    * re-derives it relationally). */
  def winnowFingerprints(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 4, w: Int = 5
  ): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(w >= 1, s"w must be >= 1, got $w")
    val fpUdf = udf { (words: Seq[String]) =>
      if (words == null) Array.empty[(Int, String)]
      else {
        val m = words.length - n + 1
        if (m <= 0) Array.empty[(Int, String)]
        else {
          val md = java.security.MessageDigest.getInstance("MD5")
          val sb = new java.lang.StringBuilder()
          // First 8 md5 bytes as a big-endian unsigned Long: fixed-width
          // lowercase hex compares lexicographically exactly as the
          // unsigned numeric order, so comparing Longs in the deque and
          // hex-rendering only the ~2/(w+1) survivors is byte-identical
          // output at half the hot-path allocation.
          val hs = new Array[Long](m)
          var i = 0
          while (i < m) {
            sb.setLength(0)
            var j = 0
            while (j < n) {
              if (j > 0) sb.append(' ')
              sb.append(words(i + j))
              j += 1
            }
            md.reset()
            val d  = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            var h = 0L
            var b = 0
            while (b < 8) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
            hs(i) = h
            i += 1
          }
          // monotonic deque: pop tail while tail.h >= new.h, so the head
          // is the window min with rightmost-tie (pos desc) semantics
          val sel = scala.collection.mutable.LinkedHashSet.empty[Int]
          val dq  = new java.util.ArrayDeque[Integer]()
          val lastWin = math.max(0, m - w)
          var p = 0
          var win = 0
          while (win <= lastWin) {
            val hi = win + w - 1
            while (p < m && p <= hi) {
              while (!dq.isEmpty &&
                java.lang.Long.compareUnsigned(hs(dq.peekLast), hs(p)) >= 0) dq.pollLast()
              dq.addLast(p)
              p += 1
            }
            while (dq.peekFirst < win) dq.pollFirst()
            sel.add(dq.peekFirst.intValue)
            win += 1
          }
          sel.iterator.map { pos =>
            val hx = new java.lang.StringBuilder(16)
            var b = 60
            while (b >= 0) { hx.append(Character.forDigit(((hs(pos) >>> b) & 0xF).toInt, 16)); b -= 4 }
            (pos, hx.toString)
          }.toArray
        }
      }
    }
    docs
      .select(col(idCol), explode(fpUdf(TextAnalysis.tokens(col(textCol)))).as("__f"))
      .select(col(idCol), col("__f._1").as("pos"), col("__f._2").as("fp"))
  }

  /** Candidate near-dup pairs by SHARED winnowing fingerprints (the
    * MOSS similarity detector): docs sharing at least `minShared`
    * distinct selected hashes. The blocking key is the fingerprint
    * (density ~2/(w+1) of the shingle stream — the cheap index plain
    * shingle joins can't afford), bucket-capped like every other
    * blocking join here ([[minhashLshPairs]]'s degenerate-bucket
    * rationale: a boilerplate fingerprint bucket of k docs is k² pair
    * candidates). Output `(doc_a, doc_b, shared)`, doc_a < doc_b. */
  def winnowPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 4, w: Int = 5, minShared: Long = 2L, maxBucket: Int = 1000
  ): DataFrame =
    winnowPairsFromFps(
      winnowFingerprints(docs, idCol, textCol, n, w)
        .select(col(idCol), col("fp")).distinct(),
      idCol, minShared, maxBucket)

  /** [[winnowPairs]] over an ALREADY-computed distinct `(id, fp)` set —
    * for callers that need the fingerprints for something else too
    * (the streaming admission store probes, unions and pairs off ONE
    * persisted fingerprint pass instead of re-hashing the batch). */
  def winnowPairsFromFps(
      fps: DataFrame, idCol: String, minShared: Long, maxBucket: Int
  ): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val capped = capBuckets(fps.select(col(idCol), col("fp")), Seq("fp"), maxBucket)
    capped.as("a")
      .join(capped.as("b"),
        col("a.fp") === col("b.fp") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
