package graft

import org.apache.spark.sql.functions._
import graft.operators.Unigram
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Unigram-LM tokenizer: Viterbi objective (fewest pieces, highest
  * score, smallest joined rendering), OOV coverage, training
  * determinism, and tokenization losslessness. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("segment: lexicographic objective — fewest pieces first, then score, then rendering") {
    // "abc": {"abc"} beats {"ab","c"} on piece count regardless of score
    assert(Unigram.segment("abc",
      Map("abc" -> 1L, "ab" -> 100L, "c" -> 100L, "a" -> 1L, "b" -> 1L), 6)
      === Seq("abc"))
    // equal piece count: higher total score wins
    assert(Unigram.segment("abcd",
      Map("ab" -> 5L, "cd" -> 5L, "abc" -> 1L, "d" -> 1L,
        "a" -> 0L, "b" -> 0L, "c" -> 0L), 6)
      === Seq("ab", "cd"))
    // equal count AND score: smallest space-joined rendering
    // "a bc" < "ab c" (space sorts below any letter)
    assert(Unigram.segment("abc",
      Map("a" -> 3L, "bc" -> 4L, "ab" -> 3L, "c" -> 4L, "b" -> 1L), 6)
      === Seq("a", "bc"))
    // maxPieceLen caps the piece width
    assert(Unigram.segment("aaaa", Map("aaaa" -> 9L, "aa" -> 1L, "a" -> 1L), 2)
      === Seq("aa", "aa"))
  }

  test("segment: OOV characters cover as single-char pieces at score 0 — never fails on unseen text") {
    assert(Unigram.segment("axb", Map("a" -> 2L, "b" -> 2L), 6)
      === Seq("a", "x", "b"))
    assert(Unigram.segment("", Map("a" -> 1L), 6) === Seq.empty)
  }

  test("trainVocab: deterministic, singles always survive, schedule prunes multis, ranks total-ordered") {
    val corpus = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the bat sat"),
      (4L, "a cat sat"), (5L, "the cat sat"))
      .toDF("doc_id", "text")
    def train() = Unigram.trainVocab(corpus, "text", rounds = 2,
      keepSchedule = Seq(6, 3), maxPieceLen = 4, minCount = 2, seedSize = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    val v1 = train()
    assert(v1 === train(), "retrain diverged — training must be deterministic")
    val singles = corpus.select(explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= " ").distinct().collect().map(_.getString(0)).toSet
    assert(singles.subsetOf(v1.map(_._1).toSet),
      "every corpus character must survive every prune round")
    assert(v1.count(_._1.length >= 2) <= 3, "final multi budget exceeded")
    assert(v1.map(_._3).sorted === v1.indices.toSeq, "ranks must be dense 0-based")
    // rank order is (score DESC, token ASC)
    val sorted = v1.sortBy(_._3)
    sorted.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    case _ => }
  }

  test("tokenizeWith: piece streams are lossless — joining pieces reproduces each normalized word") {
    val corpus = Seq(
      (1L, "the cat sat on the mat"), (2L, "concatenation of the cats"),
      (3L, "  Mixed   CASE   text "))
      .toDF("doc_id", "text")
    val vocab = Unigram.trainVocab(corpus, "text", rounds = 2,
      keepSchedule = Seq(8, 4), maxPieceLen = 4, minCount = 2, seedSize = 16)
    val toks = Unigram.tokenizeWith(corpus, "doc_id", "text", vocab, maxPieceLen = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    val norm = corpus.select(col("doc_id"),
      graft.operators.TextAnalysis.tokens(col("text")).as("ws"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).filter(_.nonEmpty)).toMap
    norm.foreach { case (id, words) =>
      assert(toks(id).mkString === words.mkString,
        s"doc $id: pieces do not re-join to the normalized words")
    }
    // OOV document against the same vocab still tokenizes (char fallback)
    val oov = Unigram.tokenizeWith(
      Seq((9L, "zzz qqq")).toDF("doc_id", "text"), "doc_id", "text", vocab, 4)
      .collect().head
    assert(oov.getSeq[String](2).mkString === "zzzqqq")
    // NULL text tokenizes as empty (the Bpe.tokenizeWith guard), never
    // an executor NPE
    val nulls = Unigram.tokenizeWith(
      Seq((10L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text", vocab, 4).collect().head
    assert(nulls.getLong(1) === 0L && nulls.getSeq[String](2).isEmpty)
  }

  test("property: the Viterbi DP equals brute-force enumeration under the lexicographic objective") {
    def check(name: String, prop: Prop, n: Int = 200): Unit = {
      val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
      assert(res.passed, s"$name: $res")
    }
    // brute force: enumerate EVERY segmentation (pieces from the vocab,
    // OOV single chars at score 0), pick by (fewest, highest score,
    // smallest joined) — exactly the DuckDB oracle's construction
    def bruteBest(w: String, vocab: Map[String, Long], maxLen: Int): Seq[String] = {
      def segs(i: Int): Seq[List[String]] =
        if (i == w.length) Seq(Nil)
        else (1 to math.min(maxLen, w.length - i)).flatMap { l =>
          val t = w.substring(i, i + l)
          val ok = vocab.contains(t) || l == 1
          if (!ok) Seq.empty
          else segs(i + l).map(t :: _)
        }
      def score(seg: List[String]): Long = seg.map(t => vocab.getOrElse(t, 0L)).sum
      segs(0).minBy(seg => (seg.length, -score(seg), seg.mkString(" ")))(
        Ordering.Tuple3(Ordering.Int, Ordering.Long, Ordering.String))
    }
    val wordGen = Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val vocabGen = for {
      nPieces <- Gen.choose(0, 6)
      pieces <- Gen.listOfN(nPieces, Gen.choose(1, 3).flatMap(l =>
        Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
      scores <- Gen.listOfN(nPieces + 3, Gen.choose(0L, 5L))
    } yield (pieces ++ Seq("a", "b", "c")).distinct.zip(scores).toMap
    val prop = Prop.forAll(wordGen, vocabGen) { (w, vocab) =>
      val dp = Unigram.segment(w, vocab, 3)
      if (w.isEmpty) dp.isEmpty
      else dp == bruteBest(w, vocab, 3)
    }
    check("dp == brute", prop)
  }

  test("soft-EM (forward-backward expected counts) beats hard-EM corpus likelihood at the same budget; deterministic across runs") {
    val corpus = Seq(
      (1L, "the cater sat on the mat the cat sat"),
      (2L, "concatenation of the cats in the cathedral"),
      (3L, "scatter the catalog to the category cache"),
      (4L, "the cat and the cats scatter a catalog"),
      (5L, "casting the cast into the caster's catalog"))
      .toDF("doc_id", "text")
    // regime note (probed): soft-EM needs >= 2 rounds for its
    // expectations to converge and a non-degenerate budget (keep >=
    // ~10) — at keep=6 the argmax-ish prune aligns better with
    // Viterbi counts and hard can edge it. This is the production
    // shape: constant budget, 3 rounds.
    def train(em: String) = Unigram.trainVocab(corpus, "text", rounds = 3,
      keepSchedule = Seq(16, 16, 16), maxPieceLen = 4, minCount = 2,
      seedSize = 64, em = em)
    val hard = train("hard")
    val soft = train("soft")
    val llHard = Unigram.corpusLogLikelihood(corpus, "text", hard, maxPieceLen = 4)
    val llSoft = Unigram.corpusLogLikelihood(corpus, "text", soft, maxPieceLen = 4)
    assert(llSoft >= llHard,
      s"soft-EM likelihood $llSoft must be >= hard-EM $llHard at the same budget")
    assert(llSoft > Double.NegativeInfinity)
    // run-to-run determinism: the exact-rational quantized E-step has
    // no float or ordering freedom
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(rows(soft) === rows(train("soft")))
    // tokenization against the soft vocab is well-formed and lossless
    val toks = Unigram.tokenizeWith(corpus, "doc_id", "text", soft, maxPieceLen = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    val norm = corpus.select(col("doc_id"),
      graft.operators.TextAnalysis.tokens(col("text")).as("ws"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).filter(_.nonEmpty)).toMap
    norm.foreach { case (id, words) =>
      assert(toks(id).mkString === words.mkString)
    }
  }

  test("expectedCounts: posteriors sum to the word's expected piece count and match hand arithmetic on a two-path word") {
    // vocab {ab, a, b} over word "ab", Laplace-smoothed weights
    // c+1 = {ab: 3, a: 2, b: 2}, T = total+|V| as passed.
    // Paths: [ab] weight 3·T, [a b] weight 2·2 = 4 (over T²) —
    // A(2) = 3T + 4. Posteriors: P([ab]) = 3T/(3T+4),
    // P([a b]) = 4/(3T+4). Expected counts: ab -> 3T/(3T+4),
    // a and b -> 4/(3T+4) each.
    val vocab = Map("ab" -> 2L, "a" -> 1L, "b" -> 1L)
    val t = BigInt(4 + 3) // Σ(c) + |V| = 4 + 3
    val got = Unigram.expectedCounts("ab", vocab, 4, Unigram.tPowTable(t, 4), freq = 1L).toMap
    val scale = Unigram.SoftScale
    def want(num: Long, den: Long): Long = (BigInt(num) * scale / den).toLong
    val z = 3 * 7 + 4 // 3T + 4
    assert(got("ab") === want(3 * 7, z))
    assert(got("a") === want(4, z))
    assert(got("b") === want(4, z))
    // freq multiplies expectations linearly (before flooring)
    val f5 = Unigram.expectedCounts("ab", vocab, 4, Unigram.tPowTable(t, 4), freq = 5L).toMap
    assert(f5("ab") === (BigInt(5) * scale * (3 * 7) / z).toLong)
  }

  test("property: soft-EM forward-backward posteriors equal brute-force enumeration over all segmentations") {
    def check(name: String, prop: Prop, n: Int = 200): Unit = {
      val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
      assert(res.passed, s"$name: $res")
    }
    // brute force: enumerate EVERY vocab-covered segmentation; a
    // segmentation with k pieces has probability Π(c_t+1) / T^k, so
    // with the common denominator T^len its weight is
    // Π(c_t+1) · T^(len-k) — exact BigInt. The expected count of
    // piece t is Σ_s w_s·count_t(s) / Σ_s w_s, quantized exactly the
    // way expectedCounts quantizes (floor of freq·SCALE·num/den).
    def bruteExpected(w: String, vocab: Map[String, Long], maxLen: Int,
        t0: BigInt, freq: Long): Map[String, Long] = {
      def segs(i: Int): Seq[List[String]] =
        if (i == w.length) Seq(Nil)
        else (1 to math.min(maxLen, w.length - i)).flatMap { l =>
          val t = w.substring(i, i + l)
          if (!vocab.contains(t)) Seq.empty else segs(i + l).map(t :: _)
        }
      val all = segs(0)
      if (all.isEmpty) Map.empty
      else {
        val weights = all.map { s =>
          s -> (s.map(t => BigInt(vocab(t)) + 1).product * t0.pow(w.length - s.length))
        }
        val z = weights.map(_._2).sum
        val perPiece = weights.foldLeft(Map.empty[String, BigInt]) { case (acc, (s, ws)) =>
          s.foldLeft(acc)((a, t) => a.updated(t, a.getOrElse(t, BigInt(0)) + ws))
        }
        perPiece.map { case (t, num) =>
          t -> ((BigInt(freq) * Unigram.SoftScale * num) / z).toLong
        }
      }
    }
    val wordGen = Gen.choose(0, 7).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val vocabGen = for {
      nPieces <- Gen.choose(0, 6)
      pieces <- Gen.listOfN(nPieces, Gen.choose(1, 3).flatMap(l =>
        Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
      scores <- Gen.listOfN(nPieces + 3, Gen.choose(0L, 9L))
      freq <- Gen.choose(1L, 50L)
    } yield ((pieces ++ Seq("a", "b", "c")).distinct.zip(scores).toMap, freq)
    val prop = Prop.forAll(wordGen, vocabGen) { case (w, (vocab, freq)) =>
      val t0 = vocab.valuesIterator.foldLeft(BigInt(0))(_ + _) + vocab.size
      val dp = Unigram.expectedCounts(w, vocab, 3, Unigram.tPowTable(t0, 3), freq).toMap
      dp == bruteExpected(w, vocab, 3, t0, freq)
    }
    check("soft-EM dp == brute", prop)
  }

  test("tokenizeWith fails loud when a vocab piece exceeds maxPieceLen (silent never-match guard)") {
    val corpus = Seq((1L, "abcd ab")).toDF("doc_id", "text")
    val vocab = Seq(("abcd", 9L), ("ab", 3L), ("a", 1L), ("b", 1L),
      ("c", 1L), ("d", 1L)).toDF("token", "score")
    // window covers the vocab: fine
    assert(Unigram.tokenizeWith(corpus, "doc_id", "text", vocab, maxPieceLen = 4)
      .collect().head.getSeq[String](2) === Seq("abcd", "ab"))
    // window SHORTER than the longest piece: 'abcd' would silently never
    // match and segmentations would diverge from training — fail loud
    val e = intercept[IllegalArgumentException] {
      Unigram.tokenizeWith(corpus, "doc_id", "text", vocab, maxPieceLen = 3)
    }
    assert(e.getMessage.contains("abcd") && e.getMessage.contains("maxPieceLen"))
  }
}
