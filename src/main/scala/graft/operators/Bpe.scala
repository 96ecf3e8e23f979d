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
      docs: DataFrame, textCol: String, numMerges: Int, endOfWord: String = "</w>"
  ): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(endOfWord.nonEmpty, "endOfWord marker must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val eow = endOfWord
    val init = wordCounts(docs, textCol).as[(String, Long)]
      .map { case (w, f) => (f, codepointSyms(w, eow).toSeq) }
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

  /** Tokenize with a learned merge table: per document, split to
    * normalized words, fold every merge in rank order over each word's
    * codepoint symbols — entirely scan-local (the merge list rides in
    * the closure; it is numMerges rows BY CONSTRUCTION, not corpus
    * data). Output `(idCol, bpe_tokens array<string>)` preserving
    * document word order. */
  def tokenizeWith(
      docs: DataFrame, idCol: String, textCol: String,
      mergesDf: DataFrame, endOfWord: String = "</w>"
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
        def fold(w: String): Seq[String] = {
          var ss: Seq[String] = codepointSyms(w, eow).toSeq
          var i = 0
          while (i < merges.length) {
            val (a, b) = merges(i)
            ss = applyMerge(ss, a, b)
            i += 1
          }
          ss
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
