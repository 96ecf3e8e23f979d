package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-learned byte-pair-encoding vocabulary [Sennrich, Haddow &
  * Birch, ACL 2016 — "Neural Machine Translation of Rare Words with
  * Subword Units"]: iterative most-frequent-adjacent-pair merging over
  * the corpus word-frequency table, then scan-local tokenization
  * against the learned merge list. Replaces guessing (the
  * `len/4`-per-piece [[TextAnalysis.bpeTokenEstimate]] heuristic) with
  * counting for every token-budgeted operator (packing, domain-mix
  * budgets, cost models).
  *
  * Scale shape: the ONLY corpus-scale pass is the word-frequency
  * aggregation (one shuffle, map-side combined). Every training round
  * after that works on the DISTINCT-WORD table — bounded by vocabulary
  * size, not corpus size (a 100 TB crawl has millions of distinct
  * words, not billions) — as one partial-aggregated pair count plus a
  * one-row driver reduce, with [[Lineage]] snapshots bounding plan
  * depth exactly like PageRank's rounds. Tokenization never shuffles:
  * the merge list (numMerges rows) broadcasts into a per-partition
  * compiled fold.
  *
  * Determinism: the best pair each round is `(count DESC, left ASC,
  * right ASC)` — binary string order on both engines — so a DuckDB
  * oracle can replay training round by round (the unrolled
  * `events_pagerank` oracle pattern).
  */
object Bpe {

  /** Hard-truncate RDD lineage every this many training rounds (see
    * [[Lineage.snapshotTruncated]] — serialization depth, not plan
    * depth, is the binding constraint past ~100 rounds). */
  private val TruncateEvery = 24

  /** Split into UTF-8 BYTE symbols — the production tokenizer norm
    * (GPT-2/Llama byte-level BPE [Radford et al. 2019 §2.2]): a fixed
    * 256-symbol base alphabet, lossless on ANY input, no OOV by
    * construction. Each byte renders as its two-char UPPERCASE hex
    * pair (vs GPT-2's printable-unicode remap) so the symbol strings
    * are pure ASCII: merged symbols concatenate hex pairs, the
    * `(count DESC, left, right)` tie-break is the SAME binary string
    * order on Spark and DuckDB, and an oracle rebuilds the exact
    * alphabet from `hex(encode(w))` — engine-exact replayability, the
    * one property GPT-2's remap can't give a SQL cross-check.
    * Fixed-width pairs also preserve unsigned byte order under string
    * comparison. [[decodeByteTokens]] inverts. */
  private[graft] def byteSyms(w: String, endOfWord: String): Array[String] = {
    val hd = "0123456789ABCDEF"
    val bs = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bs.length)
    var i = 0
    while (i < bs.length) {
      val b = bs(i) & 0xff
      out(i) = "" + hd.charAt(b >> 4) + hd.charAt(b & 0xf)
      i += 1
    }
    if (out.nonEmpty) out(out.length - 1) = out(out.length - 1) + endOfWord
    out
  }

  /** Invert [[byteSyms]]-derived tokens back to text: strip the
    * end-of-word marker, concatenate the hex pairs, decode UTF-8 —
    * the losslessness witness (spec-pinned for arbitrary Unicode
    * including astral-plane and boundary-splitting merges). */
  private[graft] def decodeByteTokens(toks: Seq[String], endOfWord: String): String = {
    val hexStr = toks.map { t =>
      if (t.endsWith(endOfWord)) t.dropRight(endOfWord.length) else t
    }.mkString
    require(hexStr.length % 2 == 0, s"odd hex stream: '${hexStr.take(40)}'")
    val bs = new Array[Byte](hexStr.length / 2)
    var i = 0
    while (i < bs.length) {
      bs(i) = Integer.parseInt(hexStr.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    new String(bs, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The symbolizer both trainers and the tokenizer share: byte-level
    * ([[byteSyms]]) or codepoint-level ([[codepointSyms]]). */
  private[graft] def symsOf(
      w: String, endOfWord: String, byteLevel: Boolean): Array[String] =
    if (byteLevel) byteSyms(w, endOfWord) else codepointSyms(w, endOfWord)

  /** Split into Unicode CODEPOINT symbols (not UTF-16 chars), matching
    * SQL engines' character semantics for astral-plane text. */
  private[graft] def codepointSyms(w: String, endOfWord: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    if (out.nonEmpty) out(out.length - 1) = out(out.length - 1) + endOfWord
    out.toArray
  }

  /** One greedy left-to-right merge pass: every non-overlapping
    * adjacent `(a, b)` becomes `a+b` (a run `[a,a,a]` with merge
    * `(a,a)` yields `[aa,a]` — the Sennrich convention). */
  private[graft] def applyMerge(ss: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < ss.length) {
      if (i + 1 < ss.length && ss(i) == a && ss(i + 1) == b) { out += a + b; i += 2 }
      else { out += ss(i); i += 1 }
    }
    out.toSeq
  }

  /** The corpus word-frequency table over normalized tokens — the one
    * corpus-scale pass. */
  private def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Learn `numMerges` merges. Output `(merge_rank, left_sym,
    * right_sym)`, rank 0-based in learning order; fewer rows when the
    * vocabulary runs out of adjacent pairs first.
    *
    * Tokenization ([[tokenizeWith]]) is DEFINED as folding the merges
    * in rank order, one greedy pass each — exactly replayable by a SQL
    * oracle. For vocabularies this trainer learns it coincides with
    * classical lowest-rank-first tokenization (a merge consuming
    * symbol `ab` is learnable only after the merge creating `ab`, so
    * ranks are topologically ordered), except in the corner where two
    * distinct merge chains produce the same symbol STRING — there the
    * fold order is the contract. */
  def trainMerges(
      docs: DataFrame, textCol: String, numMerges: Int, endOfWord: String = "</w>",
      byteLevel: Boolean = false
  ): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(endOfWord.nonEmpty, "endOfWord marker must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val eow = endOfWord
    val bl = byteLevel
    val init = wordCounts(docs, textCol).as[(String, Long)]
      .map { case (w, f) => (f, symsOf(w, eow, bl).toSeq) }
      .toDF("freq", "syms")
    var cur = Lineage.snapshot(init)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var exhausted = false
    var r = 0
    while (r < numMerges && !exhausted) {
      // partial-aggregated pair count over the vocab table; ONE row to
      // the driver (the iterative-operator convergence-probe shape)
      val best = cur.df.as[(Long, Seq[String])]
        .flatMap { case (f, ss) =>
          (0 until ss.length - 1).iterator.map(i => (ss(i), ss(i + 1), f))
        }
        .toDF("l", "rt", "f")
        .groupBy("l", "rt").agg(sum("f").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("rt"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((r, a, b))
        val applied = cur.df.as[(Long, Seq[String])]
          .map { case (f, ss) => (f, applyMerge(ss, a, b)) }
          .toDF("freq", "syms")
        // plain snapshots bound the PLAN but their persisted RDDs still
        // chain dependencies; at vocab-scale round counts (hundreds of
        // merges) task serialization would overflow the stack — hard-
        // truncate the RDD lineage every TruncateEvery rounds
        val next =
          if ((r + 1) % TruncateEvery == 0) Lineage.snapshotTruncated(applied)
          else Lineage.snapshot(applied)
        cur.release()
        cur = next
        r += 1
      }
    }
    cur.release()
    merges.toSeq.toDF("merge_rank", "left_sym", "right_sym")
      .select(col("merge_rank").cast("int").as("merge_rank"),
        col("left_sym"), col("right_sym"))
  }

  /** Total order matching BOTH engines' string sort: unsigned UTF-8
    * byte comparison (Spark's UTF8String and DuckDB's binary collation
    * order strings this way; Java's String.compareTo does NOT — UTF-16
    * code-unit order flips supplementary vs U+E000..U+FFFF). */
  private[graft] def utf8Lt(a: String, b: String): Boolean = {
    val (x, y) = (a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** In-memory Sennrich trainer over a word-frequency table — the
    * classical `learn_bpe` shape: maintain pair→count stats plus a
    * pair→words index, update BOTH incrementally on each merge (only
    * words containing the merged pair are touched), and select each
    * round's best pair from a lazy-invalidation priority queue (every
    * count update pushes a fresh entry; stale entries are discarded at
    * pop when they disagree with current stats). Work per merge is
    * proportional to the merged pair's occurrence neighborhood — NOT
    * to the vocabulary — so a real 32k-merge vocabulary costs seconds,
    * not 64k sequential scans.
    *
    * Determinism contract: per-round pair counts are exact sums, and
    * the best pair is `(count DESC, left ASC, right ASC)` in UTF-8
    * byte order ([[utf8Lt]]) — bit-for-bit the distributed
    * [[trainMerges]] selection rule, pinned by BpeSpec. */
  private[graft] def trainMergesInMemory(
      wordFreqs: Seq[(String, Long)], numMerges: Int, endOfWord: String,
      byteLevel: Boolean = false
  ): Seq[(Int, String, String)] = {
    import scala.collection.mutable
    // ---- interned symbol table: the hot loops work on dense Int ids
    // and packed Long pair keys; strings (and their CACHED UTF-8
    // bytes — the tie-break comparator used to re-encode both sides on
    // every heap comparison) are touched only on ties and at the end.
    val symStr   = mutable.ArrayBuffer.empty[String]
    val symBytes = mutable.ArrayBuffer.empty[Array[Byte]]
    val symId    = mutable.HashMap.empty[String, Int]
    def intern(s: String): Int = symId.getOrElseUpdate(s, {
      symStr += s
      symBytes += s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      symStr.length - 1
    })
    // unsigned byte-order compare over the cached encodings — the same
    // total order as [[utf8Lt]] (ids are distinct ⟺ strings are
    // distinct, so ties cannot occur between different ids)
    def bytesLt(x: Array[Byte], y: Array[Byte]): Boolean = {
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    def pairKey(l: Int, r: Int): Long = (l.toLong << 32) | (r & 0xffffffffL)

    val nWords = wordFreqs.length
    val syms  = new Array[Array[Int]](nWords) // symbol ids, live prefix
    val lens  = new Array[Int](nWords)        // live length within syms(wi)
    val freqs = new Array[Long](nWords)
    var wi0 = 0
    wordFreqs.foreach { case (w, f) =>
      val ss = symsOf(w, endOfWord, byteLevel)
      val ids = new Array[Int](ss.length)
      var i = 0
      while (i < ss.length) { ids(i) = intern(ss(i)); i += 1 }
      syms(wi0) = ids; lens(wi0) = ids.length; freqs(wi0) = f
      wi0 += 1
    }

    val stats = mutable.LongMap.empty[Long]
    val index = mutable.LongMap.empty[mutable.BitSet]
    // entry ordering: count desc, then (l, rt) asc in UTF-8 byte order
    final case class Entry(cnt: Long, l: Int, rt: Int)
    val pq = mutable.PriorityQueue.empty[Entry](new Ordering[Entry] {
      def compare(a: Entry, b: Entry): Int =
        if (a.cnt != b.cnt) java.lang.Long.compare(a.cnt, b.cnt)
        else if (a.l != b.l) {
          if (bytesLt(symBytes(a.l), symBytes(b.l))) 1 else -1 }
        else if (a.rt != b.rt) {
          if (bytesLt(symBytes(a.rt), symBytes(b.rt))) 1 else -1 }
        else 0
    })
    def bump(p: Long, delta: Long, wi: Int): Unit = {
      val next = stats.getOrElse(p, 0L) + delta
      if (next <= 0L) { stats.remove(p); index.remove(p) }
      else {
        stats(p) = next
        val ws = index.getOrElseUpdate(p, mutable.BitSet.empty)
        if (delta > 0) ws += wi
        pq.enqueue(Entry(next, (p >>> 32).toInt, p.toInt))
      }
    }
    // initial accumulation fills stats/index SILENTLY and enqueues once
    // per distinct pair afterwards — bumping through the queue here
    // would flood it with one stale entry per pair OCCURRENCE
    // (intermediate partial counts that can never validate), ~10^8
    // dead heap entries at the maxDistinctWords scale
    var wi = 0
    while (wi < nWords) {
      val w = syms(wi); val f = freqs(wi)
      var i = 0
      while (i < w.length - 1) {
        val p = pairKey(w(i), w(i + 1))
        stats(p) = stats.getOrElse(p, 0L) + f
        index.getOrElseUpdate(p, mutable.BitSet.empty) += wi
        i += 1
      }
      wi += 1
    }
    stats.foreachEntry((p, c) =>
      pq.enqueue(Entry(c, (p >>> 32).toInt, p.toInt)))

    val merges = mutable.ArrayBuffer.empty[(Int, String, String)]
    val delta = mutable.LongMap.empty[Long] // reused per touched word
    var r = 0
    while (r < numMerges && stats.nonEmpty) {
      // pop to the first entry that agrees with current stats; every
      // live pair has a fresh entry by construction, so this finds the
      // true maximum under the selection order
      var top: Entry = null
      while (top == null && pq.nonEmpty) {
        val e = pq.dequeue()
        if (stats.get(pairKey(e.l, e.rt)).contains(e.cnt)) top = e
      }
      if (top == null) return merges.toSeq  // stats nonEmpty ⇒ unreachable, belt+braces
      val (a, b) = (top.l, top.rt)
      val abKey = pairKey(a, b)
      merges += ((r, symStr(a), symStr(b)))
      val merged = intern(symStr(a) + symStr(b))
      val touched = index.get(abKey).map(_.toArray).getOrElse(Array.empty[Int])
      // the merged pair leaves the pair universe entirely
      stats.remove(abKey); index.remove(abKey)
      touched.foreach { twi =>
        val w = syms(twi); val n = lens(twi); val f = freqs(twi)
        // snapshot the pre-merge content: the merged id's STRING can
        // already occur as a symbol from an earlier round (two pair
        // splits can concatenate to the same string), so the original
        // stream is not recoverable from the rewritten one
        val before = java.util.Arrays.copyOfRange(w, 0, n)
        // one greedy left-to-right non-overlapping pass ([[applyMerge]]
        // semantics), rewriting in place — write never outruns read
        var rd = 0; var wr = 0
        while (rd < n) {
          if (rd + 1 < n && w(rd) == a && w(rd + 1) == b) {
            w(wr) = merged; rd += 2
          } else { w(wr) = w(rd); rd += 1 }
          wr += 1
        }
        if (wr != n) {
          delta.clear()
          // old pairs leave…
          var i = 0
          while (i < n - 1) {
            val p = pairKey(before(i), before(i + 1))
            delta(p) = delta.getOrElse(p, 0L) - f
            i += 1
          }
          // …new pairs over the rewritten prefix arrive
          i = 0
          while (i < wr - 1) {
            val p = pairKey(w(i), w(i + 1))
            delta(p) = delta.getOrElse(p, 0L) + f
            i += 1
          }
          lens(twi) = wr
          delta.foreachEntry { (p, d) =>
            if (d != 0 && p != abKey) bump(p, d, twi)
            // d > 0 pairs gain word twi; d < 0 pairs may still occur in
            // twi (fewer times) — membership stays, harmless: merge
            // application re-checks the word's actual content
          }
        }
      }
      r += 1
    }
    merges.toSeq
  }

  /** Driver-side training fast path: the SAME distributed corpus-scale
    * word-frequency pass, then ONE bounded collect of the distinct-word
    * table and all merges trained in memory ([[trainMergesInMemory]]).
    * Identical output to [[trainMerges]] at `minFreq = 1` (BpeSpec pins
    * the equality on a seeded corpus); `minFreq > 1` prunes the
    * frequency tail first — the standard vocabulary-learning knob, and
    * the lever that bounds the collect at 100 TB (the tail of a
    * Zipf-distributed crawl is hapax noise that can never win a merge
    * round against the head, but CAN blow up the driver copy).
    * `maxDistinctWords` fail-louds the collect bound instead of
    * OOMing the driver. Use this for real (≥1k-merge) vocabularies;
    * [[trainMerges]] remains the fully-distributed reference (and the
    * round-replay oracle target). */
  def trainMergesLocal(
      docs: DataFrame, textCol: String, numMerges: Int,
      endOfWord: String = "</w>", minFreq: Long = 1L,
      maxDistinctWords: Int = 10000000, byteLevel: Boolean = false
  ): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(endOfWord.nonEmpty, "endOfWord marker must be non-empty")
    require(minFreq >= 1L, s"minFreq must be >= 1, got $minFreq")
    val spark = docs.sparkSession
    import spark.implicits._
    val pruned = wordCounts(docs, textCol).filter(col("freq") >= minFreq)
    val n = pruned.count()
    require(n <= maxDistinctWords,
      s"trainMergesLocal: $n distinct words above minFreq=$minFreq exceeds " +
        s"maxDistinctWords=$maxDistinctWords — raise minFreq (prune the Zipf tail) " +
        "or raise the bound if the driver has the memory")
    val words = pruned.as[(String, Long)].collect().toSeq
    trainMergesInMemory(words, numMerges, endOfWord, byteLevel)
      .toDF("merge_rank", "left_sym", "right_sym")
      .select(col("merge_rank").cast("int").as("merge_rank"),
        col("left_sym"), col("right_sym"))
  }

  /** One classical lowest-rank-first encode pass: repeatedly merge the
    * lowest-rank adjacent pair present (greedy left-to-right
    * non-overlap per application — the [[applyMerge]] convention)
    * until no learned pair remains. Work is O(len² · lookup) per word
    * — INDEPENDENT of vocabulary size, vs the fold's O(numMerges ·
    * len): the difference between practical and not at a real 32k
    * vocabulary. Coincides with the fold semantics except in the
    * same-symbol-STRING corner [[trainMerges]] documents (a collision
    * can re-expose a lower rank the fold has already passed);
    * BpeSpec pins fold ≡ ranked on seeded corpora. */
  private[graft] def encodeRanked(
      syms0: Seq[String], ranks: java.util.HashMap[String, Integer]): Seq[String] = {
    var ss = syms0
    var done = false
    while (!done && ss.length > 1) {
      // lowest-rank pair present this round
      var best: Int = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < ss.length - 1) {
        val r = ranks.get(ss(i) + " " + ss(i + 1))
        if (r != null && r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else ss = applyMerge(ss, ss(bi), ss(bi + 1))
    }
    ss
  }

  /** Tokenize with a learned merge table: per document, split to
    * normalized words, fold every merge in rank order over each word's
    * codepoint symbols — entirely scan-local (the merge list rides in
    * the closure; it is numMerges rows BY CONSTRUCTION, not corpus
    * data). Output `(idCol, bpe_tokens array<string>)` preserving
    * document word order.
    *
    * `ranked = true` swaps the per-word fold for [[encodeRanked]] —
    * same output on real vocabularies (spec-pinned), O(word² ) instead
    * of O(numMerges · word) per distinct word: REQUIRED at real
    * (≥ 32k-merge) vocabulary sizes, where folding every merge over
    * every distinct word costs more than the corpus scan itself. */
  def tokenizeWith(
      docs: DataFrame, idCol: String, textCol: String,
      mergesDf: DataFrame, endOfWord: String = "</w>", ranked: Boolean = false,
      byteLevel: Boolean = false
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // bounded driver collect: the merge table has numMerges rows
    val merges: Array[(String, String)] = mergesDf
      .select(col("merge_rank").cast("int"), col("left_sym"), col("right_sym"))
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2)))
    val eow = endOfWord
    docs
      .select(col(idCol).cast("long").as("__id"),
        // null text must tokenize as empty, not NPE the executor map
        // (trainMerges' explode skips nulls; this path must agree)
        TextAnalysis.tokens(coalesce(col(textCol), lit(""))).as("__ws"))
      .as[(Long, Seq[String])]
      .mapPartitions { rows =>
        // per-partition memo: the fold is a pure function of the word,
        // and real corpora are Zipf-distributed — caching by distinct
        // word bounds the merge work by vocabulary, not occurrences
        // (the same distinct-word argument trainMerges scales on)
        val memo = scala.collection.mutable.HashMap.empty[String, Seq[String]]
        // rank lookup built once per partition for the ranked path
        lazy val ranks: java.util.HashMap[String, Integer] = {
          val m = new java.util.HashMap[String, Integer](merges.length * 2)
          var i = 0
          while (i < merges.length) {
            val (a, b) = merges(i)
            // first (lowest) rank wins for a repeated pair string
            m.putIfAbsent(a + " " + b, Integer.valueOf(i))
            i += 1
          }
          m
        }
        def fold(w: String): Seq[String] = {
          val syms0: Seq[String] = symsOf(w, eow, byteLevel).toSeq
          if (ranked) encodeRanked(syms0, ranks)
          else {
            var ss = syms0
            var i = 0
            while (i < merges.length) {
              val (a, b) = merges(i)
              ss = applyMerge(ss, a, b)
              i += 1
            }
            ss
          }
        }
        // bounded memo (Zipf head covers most occurrences; the long
        // tail just folds) so a pathological all-distinct partition
        // can't grow the map without limit
        def segment(w: String): Seq[String] =
          memo.get(w) match {
            case Some(ts) => ts
            case None =>
              val ts = fold(w)
              if (memo.size < 1000000) memo.update(w, ts)
              ts
          }
        rows.map { case (id, ws) =>
          (id, ws.iterator.filter(_.nonEmpty).flatMap(segment).toSeq)
        }
      }
      .toDF(idCol, "bpe_tokens")
  }
}
