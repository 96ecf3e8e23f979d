package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** Learned-BPE trainer/tokenizer vs an independent in-memory reference
  * implementation of Sennrich et al. 2016. */
class BpeSpec extends SparkSpec {

  // ---------------------------------------------------------------- reference implementation
  private def refNormalize(t: String): String =
    t.trim.replaceAll("\\s+", " ").toLowerCase

  private def refSyms(w: String): Vector[String] = {
    val cps = w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
    cps.updated(cps.length - 1, cps.last + "</w>")
  }

  private def refApply(ss: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < ss.length) {
      if (i + 1 < ss.length && ss(i) == a && ss(i + 1) == b) { out += a + b; i += 2 }
      else { out += ss(i); i += 1 }
    }
    out.result()
  }

  /** Reference trainer: pair counts weighted by word freq, best by
    * (count desc, left asc, right asc). */
  private def refTrain(texts: Seq[String], numMerges: Int): Seq[(Int, String, String)] = {
    val wf = texts.flatMap(t => refNormalize(t).split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var vocab: Map[String, (Long, Vector[String])] =
      wf.map { case (w, f) => w -> ((f, refSyms(w))) }
    val merges = Seq.newBuilder[(Int, String, String)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.values.foreach { case (f, ss) =>
        ss.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), _) = counts.toSeq.minBy { case ((l, rt), c) => (-c, l, rt) }
        merges += ((r, a, b))
        vocab = vocab.map { case (w, (f, ss)) => w -> ((f, refApply(ss, a, b))) }
        r += 1
      }
    }
    merges.result()
  }

  // ---------------------------------------------------------------- specs

  test("applyMerge: greedy left-to-right non-overlap on runs") {
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(Bpe.applyMerge(Seq("a", "a", "a", "a", "a"), "a", "a") === Seq("aa", "aa", "a"))
    assert(Bpe.applyMerge(Seq("x", "a", "b", "a", "b"), "a", "b") === Seq("x", "ab", "ab"))
    assert(Bpe.applyMerge(Seq("a", "b"), "b", "a") === Seq("a", "b"))
  }

  test("trainMerges matches the reference on the classic corpus") {
    import spark.implicits._
    // Sennrich's running example shape: repeated words force clear
    // frequency ordering, suffix sharing forces multi-round structure
    val texts = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Bpe.trainMerges(df, "text", numMerges = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    assert(got === refTrain(texts, 10))
    // the famous first merges: 'est</w>' forms within 3 rounds
    val learned = got.map(m => m._2 + m._3)
    assert(learned.take(3).exists(_.contains("es") ) || learned.take(3).exists(_.contains("st")))
  }

  test("trainMerges matches the reference on a varied random corpus (fixed seed)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "abcabc", "aaaa", "zq")
    val texts = (0 until 40).map(_ =>
      (0 until 1 + rnd.nextInt(6)).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Bpe.trainMerges(df, "text", numMerges = 12)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    assert(got === refTrain(texts, 12))
  }

  test("trainMerges stops early when the vocabulary runs out of pairs") {
    import spark.implicits._
    // single-codepoint words have one symbol each — zero adjacent pairs
    val df = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    assert(Bpe.trainMerges(df, "text", numMerges = 5).count() === 0)
  }

  test("trainMergesLocal (driver fast path) equals trainMerges on the classic corpus") {
    import spark.implicits._
    val texts = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    // numMerges beyond exhaustion: both trainers must stop at the same
    // round with the same merges
    assert(rows(Bpe.trainMergesLocal(df, "text", numMerges = 50)) ===
      rows(Bpe.trainMerges(df, "text", numMerges = 50)))
  }

  test("trainMergesLocal equals trainMerges on a varied random corpus incl. multi-byte words") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // non-ASCII words exercise the UTF-8-byte tie-break order (Spark's
    // string sort), incl. a supplementary-plane word where Java's
    // UTF-16 compareTo would order differently
    val words = Vector("alpha", "beta", "gamma", "delta", "abcabc", "aaaa",
      "éclair", "über", new String(Character.toChars(0x1D552)) + "b",
      // U+FFFD sorts BEFORE the supplementary word in UTF-8 bytes but
      // AFTER it in UTF-16 code units — the exact divergence utf8Lt fixes
      "�x")
    val texts = (0 until 60).map(_ =>
      (0 until 1 + rnd.nextInt(6)).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    assert(rows(Bpe.trainMergesLocal(df, "text", numMerges = 24)) ===
      rows(Bpe.trainMerges(df, "text", numMerges = 24)))
  }

  test("trainMergesInMemory sustains deep vocabularies and matches the reference") {
    // 512 merges over a synthetic corpus with enough pair structure —
    // the incremental stats/index/queue path must stay exact deep into
    // training (the O(neighborhood)-per-merge fast path vs the
    // reference's full recount every round)
    val rnd = new scala.util.Random(13)
    val alphabet = "abcdefgh"
    val texts = (0 until 300).map(_ =>
      (0 until 3).map(_ =>
        (0 until 3 + rnd.nextInt(8)).map(_ => alphabet(rnd.nextInt(8))).mkString).mkString(" "))
    val wf = texts.flatMap(t => refNormalize(t).split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }.toSeq
    val got = Bpe.trainMergesInMemory(wf, numMerges = 512, endOfWord = "</w>")
    val want = refTrain(texts, 512)
    assert(got === want)
  }

  test("trainMergesLocal: minFreq prunes the tail before training; bound fails loudly") {
    import spark.implicits._
    val texts = Seq.fill(6)("looping") ++ Seq.fill(4)("loom") ++ Seq("hapax")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    // minFreq=2 trains on {looping, loom} only — identical to training
    // on a corpus that never contained the hapax
    val noHapax = texts.filter(_ != "hapax")
    val df2 = noHapax.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    assert(rows(Bpe.trainMergesLocal(df, "text", numMerges = 8, minFreq = 2L)) ===
      rows(Bpe.trainMergesLocal(df2, "text", numMerges = 8)))
    val ex = intercept[IllegalArgumentException] {
      Bpe.trainMergesLocal(df, "text", numMerges = 2, maxDistinctWords = 2)
    }
    assert(ex.getMessage.contains("minFreq"))
  }

  test("ranked encode equals the fold on classic, random, and deep-vocab corpora") {
    import spark.implicits._
    def toks(corpus: org.apache.spark.sql.DataFrame, merges: org.apache.spark.sql.DataFrame,
        ranked: Boolean) =
      Bpe.tokenizeWith(corpus, "doc_id", "text", merges, ranked = ranked)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val classic = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m1 = Bpe.trainMerges(classic, "text", numMerges = 10)
    assert(toks(classic, m1, ranked = true) === toks(classic, m1, ranked = false))
    val rnd = new scala.util.Random(17)
    val alphabet = "abcdefgh"
    val deep = (0 until 120).map { i =>
      (i.toLong, (0 until 4).map(_ =>
        (0 until 3 + rnd.nextInt(8)).map(_ => alphabet(rnd.nextInt(8))).mkString)
        .mkString(" "))
    }.toDF("doc_id", "text")
    // a deep vocabulary (256 merges) — the regime the ranked path exists for
    val m2 = Bpe.trainMergesLocal(deep, "text", numMerges = 256)
    assert(toks(deep, m2, ranked = true) === toks(deep, m2, ranked = false))
    // empty merge table: both paths emit raw codepoint symbols
    assert(toks(classic, m1.limit(0), ranked = true) ===
      toks(classic, m1.limit(0), ranked = false))
  }

  // ------------------------------------------------------ byte level

  /** Byte-level reference symbolizer: UTF-8 bytes as uppercase hex
    * pairs, end-of-word on the last — independent of Bpe.byteSyms. */
  private def refByteSyms(w: String): Vector[String] = {
    val bs = w.getBytes("UTF-8").toVector.map(b => f"${b & 0xff}%02X")
    bs.updated(bs.length - 1, bs.last + "</w>")
  }

  private def refTrainBytes(texts: Seq[String], numMerges: Int): Seq[(Int, String, String)] = {
    val wf = texts.flatMap(t => refNormalize(t).split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var vocab: Map[String, (Long, Vector[String])] =
      wf.map { case (w, f) => w -> ((f, refByteSyms(w))) }
    val merges = Seq.newBuilder[(Int, String, String)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.values.foreach { case (f, ss) =>
        ss.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), _) = counts.toSeq.minBy { case ((l, rt), c) => (-c, l, rt) }
        merges += ((r, a, b))
        vocab = vocab.map { case (w, (f, ss)) => w -> ((f, refApply(ss, a, b))) }
        r += 1
      }
    }
    merges.result()
  }

  test("byte level: local ≡ distributed ≡ independent reference incl. multi-byte boundaries") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // multi-byte words make byte merges CROSS codepoint boundaries:
    // 'é' is C3 A9, 'über' starts C3 BC — the shared C3 lead byte is
    // pair-mergeable across DIFFERENT characters, a byte-level-only
    // structure; plus an astral-plane word (4-byte F0 9D 95 92)
    val words = Vector("éclair", "über", "naïve", "abcabc", "aaaa",
      new String(Character.toChars(0x1D552)) + "b", "中文词")
    val texts = (0 until 60).map(_ =>
      (0 until 1 + rnd.nextInt(5)).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    val dist = rows(Bpe.trainMerges(df, "text", numMerges = 16, byteLevel = true))
    assert(dist === refTrainBytes(texts, 16))
    assert(rows(Bpe.trainMergesLocal(df, "text", numMerges = 16, byteLevel = true)) === dist)
    // every base symbol is a hex pair (+ optional marker): 256-symbol alphabet
    assert(dist.forall { case (_, l, rt) =>
      l.replace("</w>", "").matches("[0-9A-F]+") && rt.replace("</w>", "").matches("[0-9A-F]+")
    })
  }

  test("byte level: tokenization is LOSSLESS on arbitrary Unicode — no OOV by construction") {
    import spark.implicits._
    val texts = Seq(
      "naïve — café ✓", "中文 mixed ascii", new String(Character.toChars(0x1F600)),
      "plain words here", "ü ü ü über")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Bpe.trainMergesLocal(df, "text", numMerges = 24, byteLevel = true)
    for (ranked <- Seq(false, true)) {
      val toks = Bpe.tokenizeWith(df, "doc_id", "text", merges,
          ranked = ranked, byteLevel = true)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val wantWords = refNormalize(t).split(" ").filter(_.nonEmpty).toSeq
        // split the token stream at end-of-word markers and hex-decode:
        // must reproduce every normalized word byte-for-byte
        val gotWords = toks(i.toLong)
          .foldLeft(Vector(Vector.empty[String])) { (acc, tok) =>
            if (tok.endsWith("</w>")) acc.init :+ (acc.last :+ tok) :+ Vector.empty
            else acc.init :+ (acc.last :+ tok)
          }
          .filter(_.nonEmpty)
          .map(ws => Bpe.decodeByteTokens(ws, "</w>"))
        assert(gotWords === wantWords, s"ranked=$ranked doc=$i")
      }
    }
    // a word UNSEEN in training still encodes (to base bytes at worst)
    // and decodes exactly — the no-OOV contract
    val unseen = Seq((99L, "совершенно-unseen éࢉ")).toDF("doc_id", "text")
    val utoks = Bpe.tokenizeWith(unseen, "doc_id", "text", merges,
        ranked = true, byteLevel = true)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val decoded = {
      val ws = utoks(99L).foldLeft(Vector(Vector.empty[String])) { (acc, tok) =>
        if (tok.endsWith("</w>")) acc.init :+ (acc.last :+ tok) :+ Vector.empty
        else acc.init :+ (acc.last :+ tok)
      }.filter(_.nonEmpty)
      ws.map(w => Bpe.decodeByteTokens(w, "</w>")).mkString(" ")
    }
    assert(decoded === refNormalize("совершенно-unseen éࢉ"))
  }

  test("byte level: ranked encode equals the fold; byteSyms/decode are exact inverses") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val words = Vector("éclair", "über", "abcabc", "中文", "aaaa", "✓✓")
    val df = (0 until 80).map { i =>
      (i.toLong, (0 until 1 + rnd.nextInt(5)).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val merges = Bpe.trainMergesLocal(df, "text", numMerges = 48, byteLevel = true)
    def toks(ranked: Boolean) =
      Bpe.tokenizeWith(df, "doc_id", "text", merges, ranked = ranked, byteLevel = true)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(toks(ranked = true) === toks(ranked = false))
    // inverse property on raw symbolization (no merges)
    for (w <- words :+ new String(Character.toChars(0x1D552)) :+ "mixedé中") {
      assert(Bpe.decodeByteTokens(Bpe.byteSyms(w, "</w>").toSeq, "</w>") === w)
    }
  }

  test("tokenizeWith: reconstruction, counting, and merge effect") {
    import spark.implicits._
    val corpus = Seq((1L, "low lower"), (2L, "newest low"), (3L, "  Newest   LOW "))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMerges(corpus, "text", numMerges = 6)
    val toks = Bpe.tokenizeWith(corpus, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // concatenating tokens and stripping markers reconstructs the
    // normalized text exactly (BPE is a lossless segmentation)
    assert(toks(1L).mkString.replace("</w>", " ").trim === "low lower")
    assert(toks(3L).mkString.replace("</w>", " ").trim === "newest low")
    // normalization means doc 3 tokenizes identically to its unnormalized twin
    assert(toks(2L) === toks(3L))
    // 6 merges compress below the codepoint count, never below word count
    val nWords = 2
    assert(toks(1L).length < "lowlower".length + nWords)
    assert(toks(1L).length >= nWords)
    // with an empty merge table, tokens are exactly the codepoint symbols
    val none = Bpe.tokenizeWith(corpus, "doc_id", "text",
      merges.limit(0)).collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(none(1L) === Seq("l", "o", "w</w>", "l", "o", "w", "e", "r</w>"))
  }

  test("tokenizeWith: null text tokenizes as empty, not an executor NPE") {
    import spark.implicits._
    val corpus = Seq((1L, "low lower"), (2L, null.asInstanceOf[String]), (3L, "  "))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMerges(corpus, "text", numMerges = 2)
    val toks = Bpe.tokenizeWith(corpus, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(toks(2L) === Seq.empty)
    assert(toks(3L) === Seq.empty)
    assert(toks(1L).nonEmpty)
  }

  test("tokenizeWith is scan-local: no exchange in the plan") {
    import spark.implicits._
    val corpus = Seq((1L, "low lower newest")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(corpus, "text", numMerges = 3)
    val plan = Bpe.tokenizeWith(corpus, "doc_id", "text", merges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"tokenize shuffled:\n$plan")
  }
}
