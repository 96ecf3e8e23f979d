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

  /** Fixed-point scale for soft-EM expected counts: expectations are
    * exact rationals quantized to multiples of 2^-20 per (word, piece)
    * before the corpus aggregation — floors of exact integer division,
    * so the quantization itself is deterministic on any engine and the
    * aggregated longs sum order-independently. */
  val SoftScale: Long = 1L << 20

  /** Soft-EM E-step for ONE word: forward–backward expected piece
    * counts under the Laplace-smoothed unigram model
    * `p(t) = (score_t + 1) / (T + |V|)`, in EXACT integer arithmetic —
    * the path-sum DP runs over BigInt numerators with the common
    * denominator folded in as powers of `totalSmoothed`
    * (`A(i+l) += A(i) · c_t · T^(l-1)` represents
    * `alpha(i+l) = Σ alpha(i) · p_t` with `alpha(i) = A(i)/T^i`), so
    * an edge's posterior `alpha(i)·p_t·beta(i+l)/Z` is the exact
    * rational `A(i)·c_t·T^(l-1)·B(i+l) / A(n)`. Returns
    * `freq · SCALE · E[count_t]` floored — the [[SoftScale]]
    * quantization, the only rounding anywhere. Smoothing keeps Z > 0
    * whenever the word's characters are in the vocabulary (the
    * required-character rule guarantees that on training corpora). */
  private[graft] def expectedCounts(
      w: String, vocab: collection.Map[String, Long], maxPieceLen: Int,
      tPow: Array[BigInt], freq: Long
  ): Iterator[(String, Long)] = {
    val n = w.length
    if (n == 0) return Iterator.empty
    val zero = BigInt(0)
    def wt(i: Int, l: Int): Option[BigInt] =
      vocab.get(w.substring(i, i + l)).map(c => BigInt(c) + 1)
    val a = Array.fill[BigInt](n + 1)(zero); a(0) = BigInt(1)
    var i = 0
    while (i < n) {
      if (a(i) != zero) {
        var l = 1
        val lMax = math.min(maxPieceLen, n - i)
        while (l <= lMax) {
          wt(i, l).foreach(c => a(i + l) += a(i) * c * tPow(l - 1))
          l += 1
        }
      }
      i += 1
    }
    if (a(n) == zero) return Iterator.empty // uncoverable word (OOV chars)
    val b = Array.fill[BigInt](n + 1)(zero); b(n) = BigInt(1)
    i = n - 1
    while (i >= 0) {
      var l = 1
      val lMax = math.min(maxPieceLen, n - i)
      while (l <= lMax) {
        if (b(i + l) != zero)
          wt(i, l).foreach(c => b(i) += c * tPow(l - 1) * b(i + l))
        l += 1
      }
      i -= 1
    }
    val acc = scala.collection.mutable.HashMap.empty[String, BigInt]
    i = 0
    while (i < n) {
      if (a(i) != zero) {
        var l = 1
        val lMax = math.min(maxPieceLen, n - i)
        while (l <= lMax) {
          if (b(i + l) != zero)
            wt(i, l).foreach { c =>
              val t = w.substring(i, i + l)
              acc(t) = acc.getOrElse(t, zero) + a(i) * c * tPow(l - 1) * b(i + l)
            }
          l += 1
        }
      }
      i += 1
    }
    val z = a(n)
    acc.iterator.map { case (t, num) =>
      t -> ((BigInt(freq) * SoftScale * num) / z).toLong
    }
  }

  /** `[T^0, T^1, …, T^(maxPieceLen-1)]` for [[expectedCounts]] — built
    * ONCE per partition (the BigInt multiplies of a corpus-sized
    * `totalSmoothed` are the dominant per-word setup cost otherwise,
    * the same hoist [[corpusLogLikelihood]] already does). */
  private[graft] def tPowTable(totalSmoothed: BigInt, maxPieceLen: Int): Array[BigInt] =
    Array.iterate(BigInt(1), maxPieceLen)(_ * totalSmoothed)

  /** Natural log of a BigInt (for likelihood comparison only — never
    * in an oracle path): mantissa + bit-length decomposition, exact to
    * double precision regardless of magnitude. */
  private def lnBig(v: BigInt): Double = {
    require(v > 0, "lnBig: non-positive")
    val bl = v.bitLength
    if (bl <= 62) math.log(v.toDouble)
    else {
      val shift = bl - 62
      math.log((v >> shift).toDouble) + shift * math.log(2.0)
    }
  }

  /** Corpus log-likelihood under a trained vocabulary's
    * Laplace-smoothed unigram model — the soft E-step's exact
    * marginal `Σ_w freq_w · ln P(w)`, `P(w) = Σ_seg Π p(t)` — for
    * MODEL COMPARISON in specs (soft-EM must beat hard-EM on held
    * corpus likelihood); double-valued, not oracle material. A word
    * with uncoverable characters contributes -∞. */
  def corpusLogLikelihood(
      docs: DataFrame, textCol: String, vocab: DataFrame, maxPieceLen: Int = 6
  ): Double = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocabRows = vocab.select(col("token"), col("score").cast("long"))
      .limit(MaxAlphabet + 1).collect()
    require(vocabRows.length <= MaxAlphabet,
      "corpusLogLikelihood: vocab table exceeds the alphabet bound")
    val vmap: Map[String, Long] =
      vocabRows.map(row => row.getString(0) -> row.getLong(1)).toMap
    val totalSmoothed = BigInt(vmap.valuesIterator.sum) + vmap.size
    val mpl = maxPieceLen
    val lnT = lnBig(totalSmoothed)
    val bc = spark.sparkContext.broadcast(vmap)
    val lls = wordCounts(docs, textCol).as[(String, Long)].mapPartitions { it =>
      // once per PARTITION: mpl BigInt pows of a potentially
      // hundreds-of-bits total, not once per word
      val tPow = Array.tabulate(mpl)(l => totalSmoothed.pow(l))
      it.map { case (w, f) =>
        val n = w.length
        val zero = BigInt(0)
        val a = Array.fill[BigInt](n + 1)(zero); a(0) = BigInt(1)
        var i = 0
        while (i < n) {
          if (a(i) != zero) {
            var l = 1
            val lMax = math.min(mpl, n - i)
            while (l <= lMax) {
              bc.value.get(w.substring(i, i + l))
                .foreach(c => a(i + l) += a(i) * (BigInt(c) + 1) * tPow(l - 1))
              l += 1
            }
          }
          i += 1
        }
        if (a(n) == zero) Double.NegativeInfinity
        else f * (lnBig(a(n)) - n * lnT)
      }
    }.collect()
    bc.destroy()
    lls.sum
  }

  /** Train the unigram vocabulary: `rounds` EM iterations over the
    * distinct-word table, pruning to `keepSchedule(r)` multi-char
    * pieces after round r. `em = "hard"` (default) counts each piece
    * once per use in the word's single Viterbi segmentation —
    * integer counts, SQL-replayable round by round (the
    * [[Bpe.trainMerges]] oracle convention); `em = "soft"` uses
    * forward–backward EXPECTED counts over all segmentations
    * ([[expectedCounts]] — exact rationals quantized at
    * [[SoftScale]]), the Kudo 2018 E-step proper, better corpus
    * likelihood at the same budget (UnigramSpec pins both the
    * improvement and run-to-run determinism). Output
    * `(token, score, rank)` — score the final round's (expected)
    * usage, rank 0-based by (score DESC, token ASC); single-char
    * pieces always present. Deterministic either way: same
    * (corpus, params) → identical table. */
  def trainVocab(
      docs: DataFrame, textCol: String, rounds: Int = 3,
      keepSchedule: Seq[Int] = Seq(24, 16, 12),
      maxPieceLen: Int = 6, minCount: Long = 2, seedSize: Int = 1024,
      em: String = "hard"
  ): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(keepSchedule.length == rounds,
      s"keepSchedule has ${keepSchedule.length} entries for $rounds rounds")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(seedSize >= 1, s"seedSize must be >= 1, got $seedSize")
    require(em == "hard" || em == "soft", s"em must be hard or soft, got '$em'")
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
      // E-step: scan-local DP over the distinct-word table, one
      // exchange — hard counts each piece once per Viterbi use; soft
      // aggregates forward-backward expectations (quantized longs)
      // the usage SUM aggregates as decimal(38,0): per-row values fit
      // a Long by construction, but soft-EM rows carry the 2^20 scale
      // and a Long sum would wrap SILENTLY at corpus scale (~8.8e12
      // occurrences of one piece) — the M-step would then rank
      // garbage with no error. Decimal sums are exact; the driver
      // bound check below turns would-be wraps into a loud failure.
      val usage: Map[String, Long] =
        (if (em == "hard")
          wf.flatMap { case (w, f) =>
            segment(w, bc.value, mpl).iterator.map(t => (t, f))
          }
        else {
          // BigInt fold: soft-scaled scores can overflow a Long sum
          val totalSmoothed =
            vocab.valuesIterator.foldLeft(BigInt(0))(_ + _) + vocab.size
          wf.mapPartitions { it =>
            // hoist the T-power table once per partition, not per word
            val tPow = tPowTable(totalSmoothed, mpl)
            it.flatMap { case (w, f) =>
              expectedCounts(w, bc.value, mpl, tPow, f)
            }
          }
        }).toDF("token", "f")
        .groupBy("token").agg(sum(col("f").cast("decimal(38,0)")).as("u"))
        .collect().map { row =>
          val u = row.getDecimal(1)
          require(u.compareTo(new java.math.BigDecimal(Long.MaxValue)) <= 0,
            s"trainVocab: usage of piece '${row.getString(0)}' overflows Long " +
              s"($u) — corpus too large for the $SoftScale-scaled soft-EM " +
              "counts; shard the corpus or train hard-EM")
          row.getString(0) -> u.longValueExact()
        }.toMap
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
