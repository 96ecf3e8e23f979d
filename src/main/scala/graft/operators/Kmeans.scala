package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DotProduct

/** Distributed k-means over an embedding column — the corpus-scale
  * counterpart of the driver-side sampled [[Quantizer]] that trains the
  * IVF coarse quantizer. Use THIS when every row needs a cluster id
  * (cluster-then-sample curation, domain discovery, diversity-aware
  * dedup), and [[Quantizer]] when a bounded sample suffices.
  *
  * Scale shape: assignment is a scan-local projection — per row, k
  * codegen'd [[graft.functions.DotProduct]] evaluations against literal
  * centroid vectors (no shuffle, no UDF, no per-row allocation beyond
  * the k-element argmin array). One Lloyd iteration adds exactly ONE
  * exchange: the per-(cluster, dimension) mean aggregation, which
  * partial-aggregates map-side to at most k*d rows per task. The k*d
  * doubles collected per iteration are the same bounded driver
  * materialization the IVF quantizer already makes (k, d ≪ corpus).
  *
  * Distance algebra: `argmin_j |v - c_j|^2 = argmin_j (|c_j|^2 - 2 v·c_j)`
  * — `|v|^2` is constant across centroids, so the hot loop is k dot
  * products; the reported `dist2` adds `v·v` back once per row.
  */
object Kmeans {

  /** The argmin struct `(rel, cluster)` over the literal centroids,
    * where `rel = |c_j|^2 - 2 v·c_j` (struct ordering is lexicographic:
    * minimal relative distance, ties to the lowest cluster index). */
  private def bestOf(vec: Column, centroids: Seq[Array[Double]]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    val d = centroids.head.length
    require(centroids.forall(_.length == d),
      s"centroid dimensions differ: ${centroids.map(_.length).distinct}")
    array_min(array(centroids.zipWithIndex.map { case (c, j) =>
      val n2c = c.foldLeft(0.0)((a, x) => a + x * x)
      struct(
        (lit(n2c) - lit(2.0) * DotProduct(vec, lit(c))).as("rel"),
        lit(j).as("cluster"))
    }: _*))
  }

  /** Nearest-centroid index of `vec` as a column (null for a null
    * vector) — the scan-local assignment reusable inside any
    * projection (streaming stats, enrichment) without a join. */
  def clusterColumn(vec: Column, centroids: Seq[Array[Double]]): Column =
    when(vec.isNotNull, bestOf(vec, centroids).getField("cluster"))

  /** Nearest-centroid assignment: `(id, cluster, dist2)` per input row,
    * `cluster` = index into `centroids`, ties to the lowest index.
    * Scan-local and codegen'd; `centroids` ride the plan as literals. */
  def assign(
      emb: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Array[Double]]): DataFrame = {
    val vec  = col(vecCol)
    val best = bestOf(vec, centroids)
    // a null vector has no geometry: null cluster + dist2, not an
    // executor NPE (mirrors ivfKnn's null-cell rule)
    emb.select(
      col(idCol),
      when(vec.isNotNull, best.getField("cluster")).as("cluster"),
      when(vec.isNotNull, DotProduct(vec, vec) + best.getField("rel"))
        .as("dist2"))
  }

  /** Deterministic gate-friendly init: the k lowest-id vectors.
    * Accepts array<float> AND array<double> columns — everything else
    * in this family ([[graft.functions.DotProduct]], [[assign]]) does,
    * so seeding from e.g. a [[Projection.randomProject]] output
    * (array<double>) must not be the one path that throws. */
  def initLowestIds(
      emb: DataFrame, idCol: String, vecCol: String, k: Int): Seq[Array[Double]] =
    emb.select(col(idCol), col(vecCol))
      .where(col(vecCol).isNotNull)
      .orderBy(col(idCol))
      .limit(k)
      .collect()
      .map(_.getSeq[Any](1).toArray.map {
        case f: Float  => f.toDouble
        case d: Double => d
        case x => throw new IllegalArgumentException(
          s"$vecCol must be array<float|double>, found element $x")
      })
      .toSeq

  /** Lloyd's iterations over the full corpus. Returns the final
    * centroids and the final assignment. Each iteration is one
    * scan-local assignment plus ONE mean-aggregation exchange; clusters
    * that lose all members keep their previous centroid (the standard
    * empty-cluster rule, and what keeps `k` stable).
    *
    * `emb` is scanned `2 * maxIters + 1` times — persist it first if it
    * is not a cheap parquet scan (caller-owned, the
    * [[LanguageModel.scoreWith]] lifecycle convention).
    */
  def lloyd(
      emb: DataFrame, idCol: String, vecCol: String,
      init: Seq[Array[Double]], maxIters: Int): (Seq[Array[Double]], DataFrame) = {
    val live = emb.where(col(vecCol).isNotNull)
    var centroids = init
    var iter = 0
    while (iter < maxIters) {
      val assigned = live
        .withColumn("__cluster", clusterColumn(col(vecCol), centroids))
      // one exchange: (cluster, dim) partial means — ≤ k*d rows survive
      // the map side of the hash aggregate
      val means = assigned
        .select(col("__cluster"), posexplode(col(vecCol)).as(Seq("__pos", "__v")))
        .groupBy(col("__cluster"), col("__pos"))
        .agg(avg(col("__v")).as("__mean"))
        .collect()
      val next = Array.tabulate(centroids.length)(j => centroids(j).clone())
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      centroids = next.toSeq
      iter += 1
    }
    (centroids, assign(live, idCol, vecCol, centroids))
  }

  /** Total within-cluster sum of squares of an [[assign]] result. */
  def cost(assigned: DataFrame): Double =
    assigned.agg(sum(col("dist2"))).head().getDouble(0)
}
