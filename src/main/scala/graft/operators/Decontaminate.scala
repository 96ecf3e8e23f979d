package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share
  * verbatim n-grams with an evaluation/benchmark set — the standard
  * train/test-contamination pass an LLM data pipeline runs before
  * training.
  *
  * Scale design: the benchmark side is DISTINCT n-grams of the
  * benchmark set, which is small by construction (eval suites are
  * thousands of documents, not billions), so it broadcasts and the
  * whole pass is scan-shaped over the training corpus: explode train
  * n-grams, broadcast-hash-join against the benchmark set, one
  * aggregation keyed by doc id. No shuffle touches the full n-gram
  * stream when the broadcast applies. Set `broadcastBench = false` for
  * a degenerate huge benchmark set (falls back to a shuffled join —
  * still n-gram-keyed, never a cross join).
  */
object Decontaminate {

  /** (train doc id, number of distinct n-grams shared with the
    * benchmark set) for every train document sharing at least one.
    * Train-side n-grams are per-document distinct ([[Dedup.shingles]]),
    * so the count is the size of the n-gram intersection. */
  def overlap(
      train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int = 8, broadcastBench: Boolean = true
  ): DataFrame = {
    // scan-local per-doc distinct: the train n-gram stream is larger
    // than the corpus text, and it has exactly one consumer here, so a
    // global .distinct() exchange would shuffle it to disk for nothing
    val trainNg = Dedup.shinglesLocal(train, idCol, textCol, n)
    val benchNg = {
      // cross-document distinct still needed on the bench side (its
      // set is small by construction; the exchange moves almost nothing)
      val ng = Dedup.shinglesLocal(bench, idCol, textCol, n).select(col("ng")).distinct()
      if (broadcastBench) broadcast(ng) else ng
    }
    trainNg
      .join(benchNg, "ng")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The clean survivor set: train rows whose shared-n-gram count is
    * below `maxShared` (default: any overlap contaminates). The shape a
    * pipeline materializes as its decontaminated corpus. */
  def clean(
      train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int = 8, maxShared: Long = 1, broadcastBench: Boolean = true
  ): DataFrame = {
    val contaminated = overlap(train, bench, idCol, textCol, n, broadcastBench)
      .filter(col("n_shared") >= maxShared)
      .select(col(idCol))
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Spark's runtime-filter default cap (8 MiB of bits): above this the
    * filter stops being a cheap broadcast, and fpp degrades instead. */
  private val MaxNumBits = 1L << 26

  /** A built decontamination filter: the serialized bloom bytes plus
    * the PERSISTED distinct bench n-gram set it was built from (the
    * exact-verify side) and the shingle width `n` it applies to.
    * Build once with [[buildFilter]], share across [[bloomOverlapWith]]
    * and [[bloomCleanWith]] — the r5 shape rebuilt the same filter in
    * each entry point — then [[release]] when the pipeline moves on.
    * `bytes == null` iff the bench set had no n-grams. */
  final case class BenchBloom private[operators] (
      bytes: Array[Byte], benchSet: DataFrame, nItems: Long, n: Int) {
    def isEmpty: Boolean = bytes == null
    def release(): Unit  = benchSet.unpersist(blocking = false)
  }

  /** Build the bloom shortlist filter for `bench`: ONE count job (on
    * the persisted DISTINCT n-gram set — sizing from the exact distinct
    * count, so heavily duplicated bench text no longer oversizes the
    * filter) and ONE distributed build job (partial filters OR-merged
    * map-side via Spark's `BloomFilterAggregate`, only the final
    * `numBits/8 ≤ 8 MiB` bytes collected). The distinct set stays
    * persisted for the verify joins; callers own [[BenchBloom.release]].
    */
  def buildFilter(
      bench: DataFrame, idCol: String, textCol: String,
      n: Int = 8, fpp: Double = 0.01
  ): BenchBloom = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val set0 = Dedup.shinglesLocal(bench, idCol, textCol, n).select(col("ng")).distinct()
    // plan-based cache lookup: re-building over the same bench plan
    // reuses the existing entry instead of stacking persists
    val benchSet =
      if (set0.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        set0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else set0
    val nItems = benchSet.count()
    if (nItems == 0) return BenchBloom(null, benchSet, 0L, n)
    val numBits = math.min(
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(nItems, fpp), MaxNumBits)
    val bytes = benchSet
      .agg(call_function("bloom_filter_build",
        xxhash64(col("ng")), lit(nItems), lit(numBits)).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    BenchBloom(bytes, benchSet, nItems, n)
  }

  /** EXACT overlap counts via a pre-built bloom shortlist — same result
    * as [[overlap]], different scale regime. [[overlap]] broadcasts the
    * bench n-gram SET; at a few hundred million bench n-grams that
    * broadcast is GBs. A bloom filter at `fpp` is ~1.2 bytes/item at 1%
    * — 10-20× smaller — and turns the full-corpus pass into a pure
    * scan: explode train n-grams, apply the codegen'd
    * `bloom_filter_contains` PREDICATE (no join, no shuffle, no build
    * relation touches the full n-gram stream). Only the flagged residue
    * (true contamination + fpp of the stream) enters the exact-verify
    * join that removes false positives, so the result is exactly
    * [[overlap]]'s: blooms have no false negatives, and the verify join
    * re-checks every flagged n-gram against the real (persisted) set. */
  def bloomOverlapWith(
      train: DataFrame, filter: BenchBloom, idCol: String, textCol: String,
      broadcastVerify: Boolean = true
  ): DataFrame = {
    if (filter.isEmpty)
      return train.select(col(idCol)).limit(0).withColumn("n_shared", lit(0L))
    val trainNg = Dedup.shinglesLocal(train, idCol, textCol, filter.n)
    val flagged = trainNg.filter(
      call_function("bloom_filter_contains", lit(filter.bytes), xxhash64(col("ng"))))
    val verify = if (broadcastVerify) broadcast(filter.benchSet) else filter.benchSet
    flagged
      .join(verify, "ng")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** [[clean]] computed through a pre-built bloom shortlist — identical
    * output (the gate checks it against the same exact oracle),
    * scan-shaped over the corpus. */
  def bloomCleanWith(
      train: DataFrame, filter: BenchBloom, idCol: String, textCol: String,
      maxShared: Long = 1, broadcastVerify: Boolean = true
  ): DataFrame = {
    val contaminated = bloomOverlapWith(train, filter, idCol, textCol, broadcastVerify)
      .filter(col("n_shared") >= maxShared)
      .select(col(idCol))
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** One-shot convenience: [[buildFilter]] + [[bloomOverlapWith]]. The
    * bench set stays in the session cache (plan-keyed, reused on
    * re-call) because the returned frame is lazy; pipelines wanting
    * deterministic release or overlap+clean off one build should call
    * [[buildFilter]] themselves. */
  def bloomOverlap(
      train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int = 8, fpp: Double = 0.01, broadcastVerify: Boolean = true
  ): DataFrame =
    bloomOverlapWith(train, buildFilter(bench, idCol, textCol, n, fpp),
      idCol, textCol, broadcastVerify)

  /** One-shot convenience: [[buildFilter]] + [[bloomCleanWith]] — ONE
    * filter build (the r5 shape built it twice: once in its own
    * overlap call and once in the caller's). */
  def bloomClean(
      train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int = 8, maxShared: Long = 1, fpp: Double = 0.01,
      broadcastVerify: Boolean = true
  ): DataFrame =
    bloomCleanWith(train, buildFilter(bench, idCol, textCol, n, fpp),
      idCol, textCol, maxShared, broadcastVerify)

  // ---------------------------------------------------------- semantic

  /** SEMANTIC decontamination — the embedding-similarity companion to
    * the verbatim n-gram pass: a paraphrased or lightly-reworded copy
    * of an eval item shares few 8-grams but sits at high embedding
    * cosine, and training on it contaminates the benchmark just the
    * same. Annotate every corpus row with its MAX cosine to any
    * benchmark embedding and the `contaminated` verdict
    * (`max >= minCosine`); NULL-embedding rows carry no geometry and
    * pass unflagged (the [[Similarity.semDedup]] null rule).
    *
    * Fast/production form: the benchmark collapses to ONE broadcast
    * array row (eval suites are thousands of embeddings — bounded by
    * `maxBenchRows`, fail-loud) with per-item norms precomputed; each
    * corpus row's max-cosine is then a scan-local codegen'd
    * higher-order fold — the corpus never shuffles and never joins a
    * per-benchmark-row relation. [[semanticExact]] is the
    * engine-exact decimal explode twin for the oracle gate (the
    * semDedup/semDedupFast convention; equivalence spec-pinned). */
  def semantic(
      corpus: DataFrame, idCol: String, vecCol: String,
      bench: DataFrame, benchVecCol: String,
      minCosine: Double, maxBenchRows: Int = 100000
  ): DataFrame = {
    require(minCosine > 0.0 && minCosine <= 1.0,
      s"minCosine must be in (0, 1], got $minCosine")
    Seq("__bench", "__n2", "max_bench_cosine", "contaminated").foreach(t =>
      require(!corpus.columns.contains(t),
        s"Decontaminate.semantic: input already has column '$t'"))
    val nBench = bench.filter(col(benchVecCol).isNotNull).count()
    require(nBench <= maxBenchRows,
      s"Decontaminate.semantic: $nBench benchmark embeddings exceed " +
        s"maxBenchRows=$maxBenchRows — a 'benchmark' that size is a corpus; " +
        "use the clustered SemDeDup machinery instead")
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val benchArr = bench
      .filter(col(benchVecCol).isNotNull)
      .select(struct(
        col(benchVecCol).as("bv"),
        sqrt(dot(col(benchVecCol), col(benchVecCol))).as("bn")).as("b"))
      .agg(collect_list(col("b")).as("__bench"))
    val withNorm = corpus.withColumn("__n2",
      when(col(vecCol).isNotNull, sqrt(dot(col(vecCol), col(vecCol)))))
    withNorm
      .crossJoin(broadcast(benchArr))
      .withColumn("max_bench_cosine",
        when(col(vecCol).isNotNull && col("__n2") > 0,
          array_max(transform(col("__bench"), b =>
            dot(col(vecCol), b.getField("bv")) / (col("__n2") * b.getField("bn"))))))
      .withColumn("contaminated",
        coalesce(col("max_bench_cosine") >= minCosine, lit(false)))
      .drop("__bench", "__n2")
  }

  /** Engine-exact twin of [[semantic]] for the oracle gate: relational
    * explode-join with decimal partial sums — order-independent, so a
    * DuckDB oracle reproduces the flag bit-for-bit. Output
    * `(idCol, max_bench_cosine rounded to 6, contaminated)`. */
  def semanticExact(
      corpus: DataFrame, idCol: String, vecCol: String,
      bench: DataFrame, benchIdCol: String, benchVecCol: String,
      minCosine: Double
  ): DataFrame = {
    val pos = corpus.select(col(idCol).as("__cid"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col("__cid"), col("pos"), col("v").cast("double").as("v"))
    val bpos = bench.select(col(benchIdCol).as("__bid"),
        posexplode(col(benchVecCol)).as(Seq("pos", "bv")))
      .select(col("__bid"), col("pos"), col("bv").cast("double").as("bv"))
    val cn = pos.groupBy("__cid")
      .agg(sum((col("v") * col("v")).cast("decimal(30,15)")).as("cn2"))
    val bn = bpos.groupBy("__bid")
      .agg(sum((col("bv") * col("bv")).cast("decimal(30,15)")).as("bn2"))
    val dots = pos.join(bpos, Seq("pos"))
      .groupBy("__cid", "__bid")
      .agg(sum((col("v") * col("bv")).cast("decimal(30,15)")).as("dot"))
    val maxCos = dots
      .join(cn, Seq("__cid")).join(bn, Seq("__bid"))
      .withColumn("__cos", col("dot").cast("double") /
        (sqrt(col("cn2").cast("double")) * sqrt(col("bn2").cast("double"))))
      .groupBy("__cid").agg(max(col("__cos")).as("__mc"))
    corpus.select(col(idCol)).distinct()
      .join(maxCos, corpus(idCol) === maxCos("__cid"), "left")
      .select(col(idCol),
        round(col("__mc"), 6).as("max_bench_cosine"),
        coalesce(col("__mc") >= minCosine, lit(false)).as("contaminated"))
  }
}
