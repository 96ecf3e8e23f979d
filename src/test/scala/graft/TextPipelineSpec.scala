package graft

import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, TextAnalysis}

/** Token chunking, repetition stats, and decontamination: exact window
  * arithmetic, Gopher-filter formulas, null hardening, and the plan
  * shapes (scan-local chunking/stats; broadcast bench side).
  */
class TextPipelineSpec extends SparkSpec {

  import spark.implicits._

  test("postings: df counts all docs, list caps at the smallest ids, pre-shuffle limit") {
    val docs = ((1L to 30L).map(i => (i, "common")) ++
      Seq((31L, "rare common"), (32L, "rare"))).toDF("doc_id", "text")
    val out = operators.TextAnalysis.postings(docs, "doc_id", "text", cap = 5)
    val rows = out.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getSeq[Long](2))).toMap
    assert(rows("common")._1 == 31L)                       // df over ALL docs
    assert(rows("common")._2 == Seq(1L, 2L, 3L, 4L, 5L))   // capped, smallest ids
    assert(rows("rare") == ((2L, Seq(31L, 32L))))          // under cap: complete
    // the cap happens before the exchange (bounded per-term heaps)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
  }

  test("chunkTokens: window starts, overlap, short tail, empty/null docs") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7"),
      (2L, "a b"),
      (3L, "   "),                       // normalizes to empty: no chunks
      (4L, null.asInstanceOf[String]))   // null: no chunks
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkTokens(docs, "doc_id", "text", size = 3, stride = 2)
      .select("doc_id", "chunk_id", "n_chunk_tokens", "chunk_text")
      .as[(Long, Int, Int, String)].collect().toSet
    assert(got == Set(
      (1L, 0, 3, "t1 t2 t3"),
      (1L, 1, 3, "t3 t4 t5"),
      (1L, 2, 3, "t5 t6 t7"),
      (1L, 3, 1, "t7"),
      (2L, 0, 2, "a b")))
  }

  test("chunkTokens rejects non-positive size/stride") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](TextAnalysis.chunkTokens(docs, "doc_id", "text", 0, 1))
    intercept[IllegalArgumentException](TextAnalysis.chunkTokens(docs, "doc_id", "text", 4, -1))
  }

  test("repetitionStats: formulas on a hand-checked document") {
    val docs = Seq(
      (1L, "a a a b"),   // top 3/4, dup (4-2)/4, bigrams {a a, a a, a b}: (3-2)/3
      (2L, "w x y z"),   // all unique: clean
      (3L, ""),          // empty: zero rates, unflagged
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "top_token_ratio", "dup_token_ratio",
        "dup_bigram_ratio", "flagged")
      .as[(Long, Int, Double, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4, 0.75, 0.5, 1.0 / 3.0, true)))
    assert(got(2L) == ((2L, 4, 0.25, 0.0, 0.0, true)))  // 1/4 > 0.20 on a tiny doc
    assert(got(3L) == ((3L, 0, 0.0, 0.0, 0.0, false)))
    assert(got(4L) == ((4L, 0, 0.0, 0.0, 0.0, false)), "null text must not poison the row")
    // a long unique document is NOT flagged (1/n below both thresholds)
    val long = Seq((9L, (1 to 50).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(long, "doc_id", "text")
      .select("flagged").as[Boolean].collect().head
    assert(!r)
  }

  test("chunking and repetition stats are scan-local (no exchange)") {
    val docs = sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")
    val chunks = TextAnalysis.chunkTokens(docs, "doc_id", "text", 32, 24)
    assert(!chunks.queryExecution.executedPlan.toString.contains("Exchange"),
      "chunking must not shuffle")
    val rep = TextAnalysis.repetitionStats(docs, "doc_id", "text")
    assert(!rep.queryExecution.executedPlan.toString.contains("Exchange"),
      "repetition stats must not shuffle")
  }

  test("decontaminate: overlap counts and the clean survivor set") {
    val bench = Seq((100L, "x y z w")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "p q x y z w r"), // shares 3-grams "x y z", "y z w" -> 2
      (2L, "x y q z w p"),   // no shared 3-gram
      (3L, "x y z"))         // shares exactly one
      .toDF("doc_id", "text")
    val overlap = Decontaminate.overlap(train, bench, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(overlap == Map(1L -> 2L, 3L -> 1L))
    val clean = Decontaminate.clean(train, bench, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L))
    // shuffled-bench fallback agrees
    val shuffled = Decontaminate.overlap(train, bench, "doc_id", "text", n = 3,
      broadcastBench = false).as[(Long, Long)].collect().toMap
    assert(shuffled == overlap)
  }

  test("decontaminate broadcasts the bench set; the train stream never shuffles") {
    val docs  = sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")
    val plan = Decontaminate.overlap(
      docs.filter(col("doc_id") % 97 =!= 0), docs.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", n = 3).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bench side must broadcast-hash-join:\n$plan")
    // exactly three exchanges: bench-side distinct, the broadcast, and
    // the final per-doc aggregation — the big train n-gram stream flows
    // scan-to-join with no shuffle (shinglesLocal, not a .distinct())
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 3, s"expected 3 exchanges (bench distinct, broadcast, " +
      s"final agg), got $exchanges:\n$plan")
  }

  test("bloom decontamination == exact decontamination (no false negatives survive)") {
    val bench = Seq((100L, "x y z w")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "p q x y z w r"),
      (2L, "x y q z w p"),
      (3L, "x y z"),
      (4L, null.asInstanceOf[String]),
      (5L, ""))
      .toDF("doc_id", "text")
    val exact = Decontaminate.overlap(train, bench, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    val bloom = Decontaminate.bloomOverlap(train, bench, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(bloom == exact && exact == Map(1L -> 2L, 3L -> 1L))
    val cleanExact = Decontaminate.clean(train, bench, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    val cleanBloom = Decontaminate.bloomClean(train, bench, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(cleanBloom == cleanExact && cleanExact == Set(2L, 4L, 5L))
    // corpus-scale agreement on real data (both paths, full result)
    val docs = sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")
    val tr = docs.filter(col("doc_id") % 97 =!= 0)
    val be = docs.filter(col("doc_id") % 97 === 0)
    val a = Decontaminate.overlap(tr, be, "doc_id", "text", n = 3)
    val b = Decontaminate.bloomOverlap(tr, be, "doc_id", "text", n = 3, fpp = 0.03)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("buildFilter: one count + one build job; one filter serves overlap AND clean; release() frees") {
    // duplicated bench text exercises the distinct-count sizing
    val bench = Seq((100L, "x y z w"), (101L, "x y z w")).toDF("doc_id", "text")
    val train = Seq((1L, "p q x y z w r"), (2L, "a b c d")).toDF("doc_id", "text")
    // count SQL executions (one per action) — job counts are AQE-stage
    // granular and meaningless here. r5 ran TWO counts + TWO builds
    // across the overlap/clean pair; the contract is now one of each.
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit = {
        actions.incrementAndGet(); ()
      }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(ql)
    val f =
      try {
        val built = Decontaminate.buildFilter(bench, "doc_id", "text", n = 3)
        // the execution-listener bus is async — settle before counting
        val deadline = System.currentTimeMillis() + 10000
        while (actions.get() < 2 && System.currentTimeMillis() < deadline) Thread.sleep(50)
        Thread.sleep(300)
        built
      } finally spark.listenerManager.unregister(ql)
    assert(actions.get() == 2,
      s"buildFilter must run exactly one count + one build action, saw ${actions.get()}")
    assert(f.benchSet.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE, "bench set must be persisted for verify")
    // the ONE filter serves both entry points and matches the exact path
    val overlap = Decontaminate.bloomOverlapWith(train, f, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val clean = Decontaminate.bloomCleanWith(train, f, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(overlap == Map(1L -> 2L))
    assert(clean == Set(2L))
    f.release()
    assert(f.benchSet.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("bloom pass is scan-shaped: the corpus n-gram stream meets a predicate, not a join") {
    val docs = sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")
    val plan = Decontaminate.bloomOverlap(
      docs.filter(col("doc_id") % 97 =!= 0), docs.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", n = 3).queryExecution.executedPlan.toString
    // the filter predicate is the codegen'd bloom probe...
    assert(plan.contains("might_contain"), s"bloom predicate missing from plan:\n$plan")
    // ...and the only join in the plan is the exact-verify of the
    // (tiny) flagged residue — the full stream itself is never joined
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 1,
      s"expected exactly the verify join:\n$plan")
    // filter must sit BELOW the join: the join's streamed side plans a
    // Filter containing the bloom probe
    val joinIdx  = plan.indexOf("BroadcastHashJoin")
    val probeIdx = plan.indexOf("might_contain")
    assert(probeIdx > joinIdx, s"bloom probe must be under the verify join:\n$plan")
  }

  test("bloom decontamination: empty bench set contaminates nothing") {
    val train = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val bench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Decontaminate.bloomOverlap(train, bench, "doc_id", "text", n = 3).isEmpty)
    assert(Decontaminate.bloomClean(train, bench, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet == Set(1L))
  }

  test("semantic decontamination: fast == exact; thresholds, nulls, scan-locality") {
    import graft.operators.Decontaminate
    def v(xs: Double*) = xs.map(_.toFloat)
    // benchmark: two unit-ish directions; corpus: a near-copy of b1
    // (contaminated), an orthogonal vector (clean), a negative-cosine
    // vector (clean), a NULL embedding (no geometry -> unflagged)
    val bench = Seq((100L, v(1, 0, 0)), (101L, v(0, 1, 0)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, v(0.99, 0.1, 0)),  // cos to b1 ~ 0.995
      (2L, v(0, 0, 1)),       // orthogonal to both
      (3L, v(-1, 0, 0)),      // cos -1 / 0
      (4L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val fast = Decontaminate.semantic(corpus, "vec_id", "embedding",
      bench, "embedding", minCosine = 0.9)
    val got = fast.select("vec_id", "contaminated").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
    // fast == exact on the same data (verdicts and rounded cosines)
    val exact = Decontaminate.semanticExact(corpus, "vec_id", "embedding",
      bench, "vec_id", "embedding", minCosine = 0.9)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.toString.toDouble), r.getBoolean(2)))).toMap
    val fastR = fast.select(col("vec_id"),
        round(col("max_bench_cosine"), 6).as("mc"), col("contaminated"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.toString.toDouble), r.getBoolean(2)))).toMap
    assert(fastR === exact)
    // the corpus side never shuffles: benchmark rides ONE broadcast row
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || plan.contains("BroadcastExchange"),
      s"corpus shuffled: $plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"benchmark not broadcast: $plan")
    // oversized 'benchmark' fails loud instead of building a giant row
    val e = intercept[IllegalArgumentException] {
      Decontaminate.semantic(corpus, "vec_id", "embedding",
        bench, "embedding", minCosine = 0.9, maxBenchRows = 1)
    }
    assert(e.getMessage.contains("maxBenchRows"))
  }

  test("pipeline decontaminate_semantic: paraphrase-close embeddings drop, others survive") {
    import java.nio.file.Files
    val (src, out) = (Files.createTempDirectory("graft-dsem-src").toString,
      Files.createTempDirectory("graft-dsem-out").toString)
    def v(xs: Double*) = xs.map(_.toFloat)
    (1L to 4L).map(i => (i, s"doc $i text")).toDF("doc_id", "text")
      .write.parquet(s"$src/documents.parquet")
    Seq((1L, v(1, 0, 0)), (2L, v(0, 1, 0)), (3L, v(0.98, 0.2, 0)))
      .toDF("doc_id", "embedding") // doc 4 has no embedding row
      .write.parquet(s"$src/embs.parquet")
    Seq(Tuple1(v(1, 0, 0))).toDF("embedding")
      .write.parquet(s"$src/bench.parquet")
    val yaml = Files.createTempFile("graft-pipe-dsem", ".yaml")
    Files.writeString(yaml,
      """pipeline: dsem
        |id: doc_id
        |text: text
        |steps:
        |  - name: cleaned
        |    op: decontaminate_semantic
        |    input: documents
        |    params: { embeddings: embs, benchmark: bench, minCosine: "0.9" }
        |""".stripMargin)
    Cli.run(Seq("pipeline", yaml.toString, src, out), spark)
    val kept = spark.read.parquet(s"$out/cleaned")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // doc 1 IS the benchmark direction (drops), doc 3 is its
    // paraphrase-close neighbor (drops), doc 2 orthogonal (survives),
    // doc 4 has no embedding (passes through)
    assert(kept === Set(2L, 4L))
  }

  test("shinglesLocal == shingles (set semantics, no exchange)") {
    val docs = sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")
    val local  = graft.operators.Dedup.shinglesLocal(docs, "doc_id", "text", 3)
    val global = graft.operators.Dedup.shingles(docs, "doc_id", "text", 3)
    assert(local.exceptAll(global).isEmpty && global.exceptAll(local).isEmpty,
      "per-doc UDF dedup must equal the global distinct")
    assert(!local.queryExecution.executedPlan.toString.contains("Exchange"),
      "shinglesLocal must be scan-local")
  }

  test("curate: one scan, zero exchanges; reasons compose; null text drops cleanly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat and a dog ran to a park in a field it was nice for all of them today"), // 24 tokens, stopword-rich, no repeated bigrams
      (2L, "short text"),                        // too_short (and low quality)
      (3L, (1 to 30).map(_ => "spam").mkString(" ")), // repetitive (+low quality: zero stopwords)
      (4L, null.asInstanceOf[String]))           // null text: empty doc, too_short
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.curate(docs, "doc_id", "text")
      .select("doc_id", "keep", "reasons")
      .as[(Long, Boolean, String)].collect()
      .map { case (id, k, r) => id -> ((k, r)) }.toMap
    assert(got(1L)._1, s"doc 1 must survive: ${got(1L)}")
    assert(got(1L)._2 == "")
    assert(!got(2L)._1 && got(2L)._2.startsWith("too_short"))
    assert(!got(3L)._1 && got(3L)._2.contains("repetitive"))
    assert(got(4L) == ((false, "too_short,low_quality")))
    val plan = graft.operators.TextAnalysis.curate(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"curate must compose the signals in ONE scan, not join two passes:\n$plan")
  }

  test("packChunks: contiguous per-shard fill, document adjacency, k boundary") {
    import spark.implicits._
    // one shard so the fill order is fully observable
    val chunks = Seq(
      (1L, 0, 10), (1L, 1, 10), (1L, 2, 4),
      (2L, 0, 10), (2L, 1, 7))
      .toDF("doc_id", "chunk_id", "n_chunk_tokens")
    val got = graft.operators.Packing
      .packChunks(chunks, "doc_id", "chunk_id", chunksPerSeq = 2, shards = 1)
      .select("doc_id", "chunk_id", "seq_id", "seq_pos")
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(got == Set(
      (1L, 0, 0, 0), (1L, 1, 0, 1),   // doc 1 fills seq 0
      (1L, 2, 1, 0), (2L, 0, 1, 1),   // seq 1 spans the doc boundary
      (2L, 1, 2, 0)))                 // tail sequence is short, never padded here
  }

  test("packChunks is deterministic and exhaustive across shards") {
    val docs = sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")
    val chunks = graft.operators.TextAnalysis.chunkTokens(docs, "doc_id", "text", 32, 32)
    val a = QueriesExt.textPack(spark, sf("sf0.001"))
    val b = QueriesExt.textPack(spark, sf("sf0.001"))
    assert(a.exceptAll(b).isEmpty, "packing must be a pure function of the corpus")
    assert(a.count() == chunks.count(), "every chunk must land in exactly one sequence")
    // no sequence holds more than k chunks, and positions are dense
    import org.apache.spark.sql.functions.{col, countDistinct, count, max}
    val bad = a.groupBy(col("shard"), col("seq_id"))
      .agg(count(col("seq_pos")).as("n"), countDistinct(col("seq_pos")).as("d"),
        max(col("seq_pos")).as("m"))
      .filter(col("n") > 8 || col("d") =!= col("n") || col("m") =!= col("n") - 1)
    assert(bad.isEmpty, "sequences must hold <= k chunks at dense positions")
  }

  test("packBudget: concat-and-split cuts on a hand-checked stream; zero-token rows span nothing") {
    import spark.implicits._
    // one shard, explicit order: tokens 300, 300, 0, 200 with a 512 cut
    val rows = Seq(
      (1L, 0, 0L, 300L), (2L, 0, 1L, 300L), (3L, 0, 2L, 0L), (4L, 0, 3L, 200L))
      .toDF("doc_id", "shard", "pos", "n_toks")
    val got = graft.operators.Packing
      .packBudget(rows, "shard", "pos", "n_toks", seqTokens = 512L)
      .select("doc_id", "tok_start", "seq_first", "seq_last", "seq_offset")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(got(1L) === ((0L, 0L, 0L, 0L)))       // [0, 300) inside seq 0
    assert(got(2L) === ((300L, 0L, 1L, 300L)))   // [300, 600) STRADDLES the 512 cut
    assert(got(3L) === ((600L, -1L, -1L, -1L)))  // zero tokens: spans nothing
    assert(got(4L) === ((600L, 1L, 1L, 88L)))    // [600, 800) inside seq 1
    // rerun is bit-identical (pure function of the ordered stream)
    val again = graft.operators.Packing
      .packBudget(rows, "shard", "pos", "n_toks", seqTokens = 512L)
    assert(graft.operators.Packing
      .packBudget(rows, "shard", "pos", "n_toks", 512L).exceptAll(again).isEmpty)
  }

  test("packBudget after shuffleShards is ONE exchange (the shard window re-sorts, not re-shuffles)") {
    val plan = QueriesExt.textPackBudget(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one shard exchange, got $exchanges:\n$plan")
  }

  test("packing after chunking is ONE exchange (the shard hash); chunking stays scan-local") {
    val plan = QueriesExt.textPack(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one shard exchange, got $exchanges:\n$plan")
  }

  test("textTfidf tokenizes the corpus once (df re-aggregates tf, no second explode)") {
    val plan = QueriesExt.textTfidf(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    val explodes = "Generate explode".r.findAllIn(plan).size
    assert(explodes == 1,
      s"df must derive from the tf aggregate, not re-explode the corpus — got $explodes explodes:\n$plan")
  }

  test("textBm25 keeps tfidf's single-tokenize shape and ranks identically") {
    val bm = QueriesExt.textBm25(spark, sf("sf0.001"))
    val plan = bm.queryExecution.executedPlan.toString
    val explodes = "Generate explode".r.findAllIn(plan).size
    assert(explodes == 1,
      s"df/dl must derive from the tf aggregate, not re-explode the corpus — got $explodes explodes:\n$plan")
    // same integer-exact ranking keys as tfidf → identical selected rows
    val bmKeys = bm.select("doc_id", "token", "rk")
    val tfKeys = QueriesExt.textTfidf(spark, sf("sf0.001")).select("doc_id", "token", "rk")
    assert(bmKeys.except(tfKeys).isEmpty && tfKeys.except(bmKeys).isEmpty)
    // BM25 scores are positive and finite for every selected term
    assert(bm.filter(col("bm25") <= 0 || col("bm25").isNull).count() == 0)
  }

  test("bpe pieces split words, digits, punctuation, and CJK the documented way") {
    import spark.implicits._
    val got = Seq("Hello, world42! 你好 extraordinarily")
      .toDF("text")
      .select(
        operators.TextAnalysis.bpePieces(col("text")).as("p"),
        operators.TextAnalysis.bpeTokenEstimate(col("text")).as("est"))
      .head()
    // letter runs whole, digits single, punct runs together, CJK per char
    assert(got.getSeq[String](0) ===
      Seq("Hello", ",", "world", "4", "2", "!", "你", "好", "extraordinarily"))
    // ceil(len/4) per piece: 2+1+2+1+1+1+1+1+4 = 14
    assert(got.getLong(1) === 14L)
  }

  test("bpe estimate: null and empty text cost zero, never null") {
    import spark.implicits._
    val got = Seq(Some(""), None).toDF("text")
      .select(operators.TextAnalysis.bpeTokenEstimate(col("text")).as("est"))
      .collect()
    assert(got.forall(r => !r.isNullAt(0) && r.getLong(0) == 0L))
  }

  // ------------------------------------------------------------ URL canonicalization

  test("normalizeUrl: hand-checked canonical forms") {
    val cases = Seq(
      // scheme/host lowercased, default port stripped, trackers out,
      // path+query case preserved, fragment dropped
      "HTTP://WWW.Example.COM:80/Path/One?utm_source=a&x=1&fbclid=z#frag"
        -> "http://www.example.com/Path/One?x=1",
      // empty path -> '/', :443 stripped under https only
      "https://A.b:443" -> "https://a.b/",
      "https://a.b:8443/x" -> "https://a.b:8443/x",
      "http://a.b:443/x" -> "http://a.b:443/x",
      // a query that becomes empty loses its '?'; path still added
      "http://a.b?utm_a=1" -> "http://a.b/",
      // consecutive leading trackers fold away
      "http://a.b/p?utm_a=1&utm_b=2&q=1" -> "http://a.b/p?q=1",
      // query preserved before an empty path
      "HTTP://A.B?id=2" -> "http://a.b/?id=2",
      // no scheme: only the cleanup half applies
      "example.com/Path?utm_source=1&q=2" -> "example.com/Path?q=2")
    val got = cases.map(_._1).toDF("u")
      .select(operators.TextAnalysis.normalizeUrl(col("u")).as("n"))
      .collect().map(_.getString(0)).toSeq
    cases.map(_._2).zip(got).foreach { case (want, g) => assert(g == want) }
    // null passes through as null
    val n = Seq((1, Option.empty[String])).toDF("i", "u")
      .select(operators.TextAnalysis.normalizeUrl(col("u"))).head()
    assert(n.isNullAt(0))
  }

  test("normalizeUrlStaged == normalizeUrl on every case (the codegen-viable form)") {
    val urls = Seq(
      "HTTP://WWW.Example.COM:80/Path/One?utm_source=a&x=1&fbclid=z#frag",
      "https://A.b:443", "https://a.b:8443/x", "http://a.b:443/x",
      "http://a.b?utm_a=1", "http://a.b/p?utm_a=1&utm_b=2&q=1",
      "HTTP://A.B?id=2", "example.com/Path?utm_source=1&q=2",
      "", "   ", "not a url at all", null)
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("i", "u")
    val viaColumn = df.select(col("i"),
      operators.TextAnalysis.normalizeUrl(col("u")).as("u")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    val staged = operators.TextAnalysis.normalizeUrlStaged(df, "u").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(staged === viaColumn)
    // internal-column collision is loud, not silent corruption
    val e = intercept[IllegalArgumentException] {
      operators.TextAnalysis.normalizeUrlStaged(
        df.withColumn("__nu_clean", lit(1)), "u")
    }
    assert(e.getMessage.contains("__nu_clean"))
  }

  test("extractLinks: quoting variants, entity decode, anchors without href skip") {
    val html = """<a href="/dq">a</a> <A HREF='/sq?x=1&amp;y=2'>b</A>
      |<a id="n" href=/uq>c</a> <a name="no-href">d</a>
      |<a href="">e</a> 3 < 5 plain text""".stripMargin
    val got = Seq((1L, html)).toDF("id", "h")
      .select(operators.TextAnalysis.extractLinks(col("h")).as("l"))
      .head().getSeq[String](0)
    assert(got === Seq("/dq", "/sq?x=1&y=2", "/uq", ""))
    val none = Seq((1L, null: String)).toDF("id", "h")
      .select(operators.TextAnalysis.extractLinks(col("h")).as("l"))
      .head().getSeq[String](0)
    assert(none === Seq.empty)
  }

  test("resolveLinksStaged: every RFC 3986 branch and the dot-segment collapse") {
    val cases = Seq(
      // (base, href, expected)
      ("http://h/a/b/index.html", "http://x/y", "http://x/y"),
      ("https://h/a/", "//cdn/x.js", "https://cdn/x.js"),
      ("http://h/a/b/c.html", "/root", "http://h/root"),
      ("http://h/a/b/c.html", "d/e.html", "http://h/a/b/d/e.html"),
      ("http://h/a/b/c.html", "../up", "http://h/a/up"),
      ("http://h/a/b/c/d.html", "../../x/./y", "http://h/a/x/y"),
      ("http://h/a/b/c.html", "?q=1", "http://h/a/b/c.html?q=1"),
      ("http://h/a/b/c.html?old=1", "?q=1", "http://h/a/b/c.html?q=1"),
      ("http://h/a/b/c.html#top", "", "http://h/a/b/c.html"),
      ("http://h/a/b/c.html", "#s", "http://h/a/b/c.html"),
      ("http://h/a/b/c.html", "mailto:x@y.z", "mailto:x@y.z"),
      // base without a path: directory is the root
      ("http://h", "x", "http://h/x"),
      // surplus ../ past the root is preserved as written (documented)
      ("http://h/a/x.html", "../../y", "http://h/../y"),
      // a schemeless base cannot anchor: href comes back as written
      ("", "rel/x", "rel/x"),
      ("no-scheme/base", "/abs", "/abs"),
      // stray whitespace around a quoted href trims before resolution
      ("http://h/a/b.html", "  /spaced \n", "http://h/spaced"))
    val df = cases.zipWithIndex
      .map { case ((b, h, _), i) => (i.toLong, b, h) }.toDF("i", "b", "h")
    val got = operators.TextAnalysis.resolveLinksStaged(df, "b", "h", "u")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    cases.zipWithIndex.foreach { case ((b, h, want), i) =>
      assert(got(i.toLong) === want, s"base=$b href=$h")
    }
    val e = intercept[IllegalArgumentException] {
      operators.TextAnalysis.resolveLinksStaged(
        df.withColumn("__rl_raw", lit(1)), "b", "h", "u")
    }
    assert(e.getMessage.contains("__rl_raw"))
  }

  test("packSequences: fixed-length cuts reassemble the exact shard streams") {
    import graft.operators.Packing
    // shard 0: docs of 3, 7, 2 tokens (stream of 12 -> seqs 5,5,2)
    // shard 1: one 11-token doc (-> 5,5,1); an empty doc contributes nothing
    val rows = Seq(
      (0, 0L, (1 to 3).map(i => s"a$i")),
      (0, 1L, (1 to 7).map(i => s"b$i")),
      (0, 2L, Seq.empty[String]),
      (0, 3L, (1 to 2).map(i => s"c$i")),
      (1, 0L, (1 to 11).map(i => s"d$i"))
    ).toDF("shard", "pos", "toks")
    val got = Packing.packSequences(rows, "shard", "pos", "toks", seqTokens = 5L)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        ((r.getSeq[String](2), r.getInt(3), r.getInt(4))))
      .toMap
    val s0 = (1 to 3).map(i => s"a$i") ++ (1 to 7).map(i => s"b$i") ++
      (1 to 2).map(i => s"c$i")
    assert(got((0, 0L)) === ((s0.slice(0, 5), 5, 2)))  // a-doc + b-doc slices
    assert(got((0, 1L)) === ((s0.slice(5, 10), 5, 1))) // inside the b doc
    // doc b ends exactly at the seq-1 boundary: seq 2 is the c doc alone
    assert(got((0, 2L)) === ((s0.slice(10, 12), 2, 1)))
    val s1 = (1 to 11).map(i => s"d$i")
    assert(got((1, 0L)) === ((s1.slice(0, 5), 5, 1)))
    assert(got((1, 1L)) === ((s1.slice(5, 10), 5, 1)))
    assert(got((1, 2L)) === ((s1.slice(10, 11), 1, 1)))
    assert(got.size === 6)
    // every non-final sequence is exactly seqTokens long; streams equal
    val byShard = got.toSeq.groupBy(_._1._1)
    byShard.foreach { case (sh, seqs) =>
      val ordered = seqs.sortBy(_._1._2)
      ordered.init.foreach { case (_, (_, n, _)) => assert(n === 5) }
      val flat = ordered.flatMap(_._2._1)
      assert(flat === (if (sh == 0) s0 else s1), s"shard $sh stream")
    }
    // scale posture: the shard window + the (shard, seq) group — two
    // declared exchanges, never a token-level explode shuffle
    val plan = Packing.packSequences(rows, "shard", "pos", "toks", 5L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2, plan)
  }

  // ------------------------------------------------------------ co-occurrence

  private def cooc(
      docs: Seq[(Long, String)], window: Int,
      maxCount: Long = 100000L, topK: Int = 100): Map[(String, String), (Long, Long, Long)] =
    TextAnalysis.cooccurrence(docs.toDF("doc_id", "text"), "doc_id", "text",
      window, maxCount, topK)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("cooccurrence: hand-checked window counts, unordered normalization, totals") {
    // "a b c a": window 1 -> (a,b)@1-2, (b,c)@2-3, (a,c)@3-4 (normalized)
    assert(cooc(Seq((1L, "a b c a")), window = 1) == Map(
      ("a", "b") -> ((1L, 2L, 1L)),
      ("b", "c") -> ((1L, 1L, 1L)),
      ("a", "c") -> ((1L, 2L, 1L))))
    // window 2 adds (a,c)@1-3 and (b,a)@2-4 -> both directions fold
    // into one unordered pair
    assert(cooc(Seq((1L, "a b c a")), window = 2) == Map(
      ("a", "b") -> ((2L, 2L, 1L)),
      ("b", "c") -> ((1L, 1L, 1L)),
      ("a", "c") -> ((2L, 2L, 1L))))
  }

  test("cooccurrence: same-token pairs excluded; stopwords drop via maxCount") {
    // "x y x" window 2: the (x,x)@1-3 pair must NOT appear
    assert(cooc(Seq((1L, "x y x")), window = 2) ==
      Map(("x", "y") -> ((2L, 2L, 1L))))
    // "the" occurs 4 times > maxCount=3 -> excluded from every pair,
    // but the totals of surviving tokens still count full occurrences
    val out = cooc(Seq((1L, "the quick the brown the fox the")), window = 5, maxCount = 3L)
    assert(out.keys.flatMap(p => Seq(p._1, p._2)).toSet == Set("quick", "brown", "fox"))
  }

  test("cooccurrence: topK is a bounded TakeOrdered by (count desc, w1, w2)") {
    val docs = Seq((1L, "p q p q p q"), (2L, "r s"))
    val out = TextAnalysis.cooccurrence(docs.toDF("doc_id", "text"),
      "doc_id", "text", window = 1, topK = 1)
    val rows = out.collect()
    assert(rows.length == 1 && rows(0).getString(0) == "p" && rows(0).getString(1) == "q")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"topK must not global-sort:\n$plan")
  }
}
