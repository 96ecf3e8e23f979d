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

  /** (id, ng) exploded shingle stream WITH duplicates — for consumers
    * whose aggregate is duplicate-insensitive (minhash `min`), where
    * paying any dedup (shuffle `.distinct()` or per-row
    * `array_distinct`, which is quadratic on string arrays) buys
    * nothing. */
  def shinglesRaw(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // JVM udf, not a transform(...) lambda: higher-order-function
    // lambdas evaluate INTERPRETED per n-gram, and this runs once per
    // token of the corpus — the single hottest expression in the dedup
    // family
    val ngramUdf = udf { (w: Seq[String]) =>
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
    }
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

  /** Exact n-gram Jaccard similarity join via inverted index: explode
    * shingles, equi-join on the shingle (only docs sharing >=1 shingle
    * ever pair up), count intersections, compute
    * |A∩B| / (|A|+|B|-|A∩B|). This IS the scalable exact formulation —
    * the shuffle key is the shingle, not the pair. */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.5
  ): DataFrame = {
    val ngr   = shingles(docs, idCol, textCol, n)
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

  /** MinHash signatures: k per-seed minimum xxhash64 values over the
    * document's shingle set. Computed as k parallel `min` aggregates
    * over the exploded shingle table — fully codegen'd (a lambda-based
    * array formulation is ~10x slower: higher-order functions are
    * interpreted per element). One shuffle on the doc id. */
  def minhashSignatures(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 3, k: Int = 64
  ): DataFrame = {
    // raw (duplicated) shingles: min() is duplicate-insensitive, so
    // the signature needs no dedup pass at all — the only shuffle is
    // the tiny partially-aggregated groupBy(id). Hash the shingle
    // STRING once; the k per-seed hashes re-hash the resulting 8-byte
    // long, not the string (k x string-bytes -> k x 8 bytes of hashing)
    val ngr = shinglesRaw(docs, idCol, textCol, n)
      .select(col(idCol), xxhash64(col("ng")).as("ngh"))
    val mins = (0 until k).map(j => min(xxhash64(col("ngh"), lit(j))).as(s"h$j"))
    ngr
      .groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(j => col(s"h$j")): _*).as("sig"))
  }

  /** MinHash + LSH near-duplicate pairs: band the signature (bands of
    * `r` rows), bucket-join on (band, band-hash), then verify candidate
    * pairs with exact Jaccard. Buckets larger than `maxBucket` are
    * dropped (logged skew guard — a degenerate bucket is evidence the
    * band is non-discriminative, not useful candidates). */
  def minhashLshPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, r: Int = 4,
      minJaccard: Double = 0.5, maxBucket: Int = 1000
  ): DataFrame = {
    val bands = k / r
    // the shingle subtree is recomputed by both the signature and the
    // verification branches — at corpus scale caching it is infeasible,
    // and the explode+normalize is a cheap scan-local pass
    val sigs = minhashSignatures(docs, idCol, textCol, n, k)
    val banded = sigs.select(
      col(idCol),
      explode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> named_struct('band', b, 'bh', xxhash64(concat_ws(',', slice(sig, b * $r + 1, $r)), b)))"))
        .as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val bucketed = banded
      .groupBy("band", "bh")
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
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

  /** Exact Jaccard evaluated only for the given candidate (doc_a, doc_b)
    * pairs. */
  def ngramJaccardForPairs(
      docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, n: Int, minJaccard: Double
  ): DataFrame =
    jaccardForPairs(shingles(docs, idCol, textCol, n), idCol, pairs, minJaccard)

  private def jaccardForPairs(
      ngr: DataFrame, idCol: String, pairs: DataFrame, minJaccard: Double
  ): DataFrame = {
    val sizes = ngr.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(ngr.as("a"), col("doc_a") === col(s"a.$idCol"))
      .join(ngr.as("b"), col("doc_b") === col(s"b.$idCol") && col("a.ng") === col("b.ng"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("icount"))
    inter
      .join(sizes.withColumnRenamed(idCol, "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed(idCol, "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        col("icount").cast("double") / (col("sz_a") + col("sz_b") - col("icount")))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 64-bit SimHash per document: sign-aggregate the per-token hash
    * bits (+1/-1 weighting), emitted as a long. Like
    * [[minhashSignatures]], computed as 64 parallel integer-bit-sum
    * aggregates over the exploded token table (codegen'd) rather than
    * nested array lambdas (interpreted, ~30x slower). */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .select(col(idCol), xxhash64(col("t")).as("h"))
    val bitSums = (0 until 64).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$j"))
    val sh = (0 until 64)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    toks
      .groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol), sh.as("simhash"))
  }

  /** SimHash near-duplicate pairs: band the 64-bit hash into four
    * 16-bit chunks (pigeonhole: hamming distance <= 3 implies at least
    * one identical chunk), bucket-join, verify by exact bit_count of
    * the xor. */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000
  ): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    val banded = sh.select(
      col(idCol), col("simhash"),
      explode(expr(
        "transform(sequence(0, 3), b -> named_struct('band', b, 'chunk', shiftright(simhash, b * 16) & 65535))"))
        .as("bb"))
      .select(col(idCol), col("simhash"), col("bb.band").as("band"), col("bb.chunk").as("chunk"))
    val pairs = banded
      .as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        col("a.simhash").as("sha"), col("b.simhash").as("shb"))
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
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .distinct()
      .cache()
    // every round re-derives from the previous round's MATERIALIZED
    // labels: localCheckpoint truncates lineage, without which the
    // self-referencing joins double the logical plan per round and
    // Catalyst planning blows up after ~8 rounds
    var labels = edges.select(col("a").as("doc"))
      .union(edges.select(col("b").as("doc")))
      .distinct()
      .withColumn("rep", col("doc"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // each doc adopts the smallest rep among itself and its neighbors
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("doc", "b").withColumnRenamed("rep", "nrep"), Seq("b"))
        .groupBy(col("a").as("doc"))
        .agg(min(col("nrep")).as("nrep"))
      val oneHop = labels
        .join(viaNeighbors, Seq("doc"), "left_outer")
        .select(col("doc"), least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep"))
        .localCheckpoint(true)
      // pointer jumping: rep := min(rep, rep's rep) — path lengths halve
      // per round, so long chains converge in O(log diameter) rounds
      // instead of one hop per round
      val updated = oneHop
        .join(oneHop.select(col("doc").as("rep"), col("rep").as("rep2")), Seq("rep"), "left_outer")
        .select(col("doc"), least(col("rep"), coalesce(col("rep2"), col("rep"))).as("rep"))
        .localCheckpoint(true)
      converged = updated.join(labels.withColumnRenamed("rep", "prev"), Seq("doc"))
        .filter(col("rep") =!= col("prev")).isEmpty
      labels = updated
      i += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIter rounds")
    labels
  }

  /** Survivor view: keep one doc (the minimum id) per near-duplicate
    * cluster; unpaired docs survive untouched. */
  def survivors(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps  = connectedComponents(pairs)
    val losers = comps.filter(col("doc") =!= col("rep")).select(col("doc").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }
}
