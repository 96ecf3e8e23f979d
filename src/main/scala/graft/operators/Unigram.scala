package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-learned unigram-LM subword vocabulary [Kudo, ACL 2018 —
  * "Subword Regularization: Improving Neural Network Translation
  * Models with Multiple Subword Candidates"; the SentencePiece
  * unigram trainer] — the OTHER production tokenizer family beside
  * [[Bpe]]: seed a candidate vocabulary from frequent substrings,
  * alternate Viterbi segmentation of the corpus with pruning of
  * low-usage pieces, then tokenize by Viterbi against the final
  * piece scores.
  *
  * This implementation is the HARD-EM (Viterbi-count) variant in
  * exact integer arithmetic, chosen for the repo's cross-engine
  * determinism contract (the [[Bpe]] / nearest-profile convention —
  * float log-likelihoods would make the DuckDB oracle replay depend
  * on libm rounding):
  *
  *  - piece scores are integer USAGE COUNTS (seeded with substring
  *    corpus counts), not log probabilities;
  *  - the Viterbi objective is lexicographic: FEWEST pieces, then
  *    HIGHEST total score, then the lexicographically-smallest
  *    space-joined segmentation in UTF-8 byte order — a total order
  *    both engines sort identically, standing in for the
  *    maximum-likelihood tie-break;
  *  - the E-step counts each piece once per use in the word's single
  *    best segmentation (Viterbi counts ≈ the EM expectations'
  *    argmax, the standard hard-EM approximation);
  *  - the M-step prune keeps every single-character piece (lossless
  *    coverage, SentencePiece's required-character rule) plus the
  *    top `keep_r` multi-character pieces by (usage DESC, piece ASC).
  *
  * Scale shape (the [[Bpe.trainMerges]] discipline): the only
  * corpus-scale pass is the word-frequency aggregation; seeding and
  * every EM round run over the DISTINCT-WORD table with the bounded
  * vocabulary broadcast into a scan-local DP — one exchange per
  * round (the Lloyd's-iteration shape), no driver loop over corpus
  * rows. The vocabulary itself is capped by `seedSize` (the
  * SentencePiece seed_sentencepiece_size bound) and collected
  * driver-side like the k-means centroids.
  */
object Unigram {

  /** Driver-side vocabulary bound — [[trainVocab]] collects at most
    * `seedSize` multi-char candidates + the corpus alphabet; a corpus
    * with more distinct single characters than this is not text. */
  val MaxAlphabet = 1 << 20

  /** The corpus word-frequency table over normalized tokens —
    * [[Bpe]]'s one corpus-scale pass, same normalization. */
  private def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** One word's best segmentation under the vocabulary: minimize
    * piece count, then maximize total score, then the smallest
    * space-joined rendering in UTF-8 byte order. Right-to-left DP,
    * O(len · maxPieceLen); a character absent from the vocabulary
    * segments as itself at score 0 (the OOV-coverage rule — a
    * tokenizer must never fail on unseen text). */
  private[graft] def segment(
      w: String, vocab: collection.Map[String, Long], maxPieceLen: Int
  ): Seq[String] = {
    val n = w.length
    if (n == 0) return Seq.empty
    // dp(i): best (ntok, ssum, pieces, joined) for the suffix from i
    final case class Best(ntok: Int, ssum: Long, pieces: List[String], joined: String)
    val dp = new Array[Best](n + 1)
    dp(n) = Best(0, 0L, Nil, "")
    var i = n - 1
    while (i >= 0) {
      var best: Best = null
      var l = 1
      val lMax = math.min(maxPieceLen, n - i)
      while (l <= lMax) {
        val t = w.substring(i, i + l)
        val score = vocab.get(t) match {
          case Some(s) => s
          case None => if (l == 1) 0L else -1L // OOV char covers at 0
        }
        if (score >= 0L && dp(i + l) != null) {
          val rest = dp(i + l)
          val joined = if (rest.joined.isEmpty) t else t + " " + rest.joined
          val cand = Best(1 + rest.ntok, score + rest.ssum, t :: rest.pieces, joined)
          if (best == null ||
              cand.ntok < best.ntok ||
              (cand.ntok == best.ntok && cand.ssum > best.ssum) ||
              (cand.ntok == best.ntok && cand.ssum == best.ssum &&
                Bpe.utf8Lt(cand.joined, best.joined)))
            best = cand
        }
        l += 1
      }
      dp(i) = best
      i -= 1
    }
    dp(0).pieces
  }

  /** Train the unigram vocabulary: `rounds` hard-EM iterations over
    * the distinct-word table, pruning to `keepSchedule(r)` multi-char
    * pieces after round r. Output `(token, score, rank)` — score the
    * final round's usage count, rank 0-based by (score DESC, token
    * ASC); single-char pieces always present. Deterministic: same
    * (corpus, params) → identical table, replayable round by round in
    * SQL (the [[Bpe.trainMerges]] oracle convention). */
  def trainVocab(
      docs: DataFrame, textCol: String, rounds: Int = 3,
      keepSchedule: Seq[Int] = Seq(24, 16, 12),
      maxPieceLen: Int = 6, minCount: Long = 2, seedSize: Int = 1024
  ): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(keepSchedule.length == rounds,
      s"keepSchedule has ${keepSchedule.length} entries for $rounds rounds")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(seedSize >= 1, s"seedSize must be >= 1, got $seedSize")
    val spark = docs.sparkSession
    import spark.implicits._
    val mpl = maxPieceLen
    // materialize the distinct-word table ONCE: the seed pass and every
    // EM round re-execute `wf`, and without the snapshot each of those
    // actions would replay the corpus-scale explode+groupBy —
    // rounds+1 corpus passes instead of the documented one
    // (the Bpe.trainMerges Lineage discipline)
    val wfSnap = Lineage.snapshot(wordCounts(docs, textCol))
    val wf = wfSnap.df.as[(String, Long)]
    // seed: every substring occurrence up to maxPieceLen, corpus-count
    // weighted — one distinct-word-scale pass + one groupBy
    val subCounts = wf.flatMap { case (w, f) =>
      for {
        i <- 0 until w.length
        l <- 1 to math.min(mpl, w.length - i)
      } yield (w.substring(i, i + l), f)
    }.toDF("token", "f").groupBy("token").agg(sum("f").as("cnt"))
    val singlesRows = subCounts.filter(length(col("token")) === 1)
      .limit(MaxAlphabet + 1).collect()
    require(singlesRows.length <= MaxAlphabet,
      s"trainVocab: corpus alphabet exceeds $MaxAlphabet distinct characters")
    val mc = minCount
    val multiRows = subCounts.filter(length(col("token")) >= 2 && col("cnt") >= mc)
      .orderBy(col("cnt").desc, col("token"))
      .limit(seedSize)
      .collect()
    val singles: Array[String] = singlesRows.map(_.getString(0))
    var vocab: Map[String, Long] =
      (singlesRows.map(r => r.getString(0) -> r.getLong(1)) ++
        multiRows.map(r => r.getString(0) -> r.getLong(1))).toMap
    var r = 0
    while (r < rounds) {
      val bc = spark.sparkContext.broadcast(vocab)
      // E-step: Viterbi usage counts — scan-local DP, one exchange
      val usage: Map[String, Long] = wf.flatMap { case (w, f) =>
        segment(w, bc.value, mpl).iterator.map(t => (t, f))
      }.toDF("token", "f").groupBy("token").agg(sum("f").as("u"))
        .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
      bc.destroy()
      // M-step: singles always survive (coverage); multis prune to the
      // round's budget by (usage DESC, token ASC) among used pieces
      val keep = keepSchedule(r)
      val multisKept = vocab.keysIterator
        .filter(t => t.length >= 2 && usage.getOrElse(t, 0L) > 0L)
        .toArray
        .sortWith { (a, b) =>
          val (ua, ub) = (usage(a), usage(b))
          if (ua != ub) ua > ub else Bpe.utf8Lt(a, b)
        }
        .take(keep)
      vocab = (singles.map(t => t -> usage.getOrElse(t, 0L)) ++
        multisKept.map(t => t -> usage(t))).toMap
      r += 1
    }
    wfSnap.release()
    val rows = vocab.toSeq.sortWith { (a, b) =>
      if (a._2 != b._2) a._2 > b._2 else Bpe.utf8Lt(a._1, b._1)
    }.zipWithIndex.map { case ((t, s), i) => (t, s, i) }
    rows.toDF("token", "score", "rank")
      .select(col("token"), col("score").cast("long").as("score"),
        col("rank").cast("int").as("rank"))
  }

  /** Tokenize against a trained `(token, score)` vocabulary table:
    * per doc the Viterbi piece count and the space-joined piece
    * stream in document order ([[Bpe.tokenizeWith]]'s shape). The
    * vocabulary broadcasts into a scan-local per-partition DP — the
    * corpus never shuffles. */
  def tokenizeWith(
      docs: DataFrame, idCol: String, textCol: String, vocab: DataFrame,
      maxPieceLen: Int = 6
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    Seq("token", "score").foreach(needed =>
      require(vocab.columns.contains(needed),
        s"tokenizeWith: vocab table must have a '$needed' column " +
          "(a unigram trainVocab output)"))
    val vocabRows = vocab.select(col("token"), col("score").cast("long"))
      .limit(MaxAlphabet + 1).collect()
    require(vocabRows.length <= MaxAlphabet,
      s"tokenizeWith: vocab table exceeds $MaxAlphabet rows — not a trained " +
        "vocabulary (did you pass the corpus by mistake?)")
    val vmap: Map[String, Long] =
      vocabRows.map(row => row.getString(0) -> row.getLong(1)).toMap
    // a vocab piece longer than maxPieceLen would silently never match
    // (the DP window caps at maxPieceLen), and a mismatched param would
    // silently change segmentations — the one silent-divergence gap in
    // an otherwise fail-loud tokenizer. Require the window to cover the
    // vocabulary it is segmenting against.
    vmap.keys.filter(_.length > maxPieceLen).toSeq
      .sortBy(t => (-t.length, t)).headOption
      .foreach(t => throw new IllegalArgumentException(
      s"tokenizeWith: vocab piece '$t' (${t.length} chars) exceeds " +
        s"maxPieceLen=$maxPieceLen — pieces past the DP window would " +
        "silently never match; pass the training maxPieceLen (or larger)"))
    val mpl = maxPieceLen
    val bc = spark.sparkContext.broadcast(vmap)
    docs.select(col(idCol).cast("long"),
        // null text must tokenize as empty, not NPE the executor map
        // (the Bpe.tokenizeWith guard; trainVocab's explode skips nulls)
        TextAnalysis.tokens(coalesce(col(textCol), lit(""))))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        it.map { case (id, words) =>
          val pieces = words.iterator.filter(_.nonEmpty)
            .flatMap(w => segment(w, bc.value, mpl)).toSeq
          (id, pieces.length.toLong, pieces)
        }
      }
      .toDF(idCol, "n_unigram_tokens", "unigram_tokens")
  }
}
