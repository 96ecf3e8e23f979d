package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link centrality over a weighted edge list — fixed-point integer
  * PageRank (Page et al. 1999, "The PageRank Citation Ranking").
  *
  * Web-scale corpus curation weights documents by link centrality (the
  * Common-Crawl-style quality prior), so the engine ships the
  * canonical iterate. All arithmetic is EXACT fixed-point integer:
  * ranks live at scale 1e9, each edge contribution is
  * floor((d * r_src * w) / (100 * W_src)) computed with an integral
  * decimal `div` (no intermediate float, no decimal-scale rounding),
  * and inflow sums are integral — summation order cannot perturb the
  * result, so the unrolled DuckDB oracle (`events_pagerank`)
  * reproduces it bit-for-bit, which float PageRank cannot promise
  * across engines.
  *
  * Execution shape per iteration: ranks join the out-weighted edge
  * list on src (the rank table broadcasts while small; at web scale
  * both sides shuffle on the join key — the classic Pregel-equivalent
  * join/agg), a partial-aggregated groupBy dst produces inflow, and a
  * left join back to the node set adds the teleport floor so isolated
  * and dangling-target nodes keep a nonzero rank. The edge+out-weight
  * join is loop-invariant and computed once. Dangling-SOURCE mass
  * (nodes with no out-edges) is dropped — the standard simplification;
  * total rank then sums below the scale constant, which only shifts
  * every score by a shared factor.
  *
  * The node count enters the plan as a 1-row aggregate attached by
  * crossJoin (broadcast by construction) — no driver-side collect.
  */
object Centrality {

  /** Scoped edge-list lifecycle for pipelines that rank repeatedly:
    * persists the (node^2-bounded) aggregated edge list, runs `f`,
    * releases — the [[graft.operators.LanguageModel.withModel]]
    * loan shape. */
  def withEdges[A](edges: DataFrame)(f: DataFrame => A): A = {
    val e = edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try f(e)
    finally e.unpersist(blocking = false)
  }

  /** @param edges     AGGREGATED weighted edge list (one row per edge;
    *                  node^2-bounded, NOT the raw event stream). The
    *                  plan references it from every iteration plus the
    *                  node set and out-weights, so it is persisted
    *                  idempotently (plan-based lookup — a second call
    *                  over the same edges reuses the entry rather than
    *                  stacking persists); scoped pipelines use
    *                  [[withEdges]] to release it.
    * @param iterations unrolled iteration count (each adds one
    *                   join+agg stage to the plan)
    * @param dampingPct damping factor in percent (85 = the canonical 0.85)
    * @param scale      fixed-point scale; ranks sum to ~scale
    * @return (node, rank_fp) — rank_fp is the fixed-point rank at `scale`
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String, weightCol: String,
      iterations: Int, dampingPct: Int = 85, scale: Long = 1000000000L
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingPct > 0 && dampingPct < 100, s"dampingPct in (0,100), got $dampingPct")
    require(scale >= 1000000L, s"scale too small for meaningful fixed-point ranks: $scale")

    // without materialization Catalyst replans the edge subtree for
    // every reference (3 iterations x (join + nodes + out-weights) =
    // ~7 rebuilds of whatever scan/window/agg produced the edges)
    val e0 =
      if (edges.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else edges

    val src = col(srcCol)
    val dst = col(dstCol)

    val nodes = e0.select(src.as("node"))
      .union(e0.select(dst.as("node")))
      .distinct()
    // 1-row node count, attached by broadcast crossJoin (stays lazy)
    val nDf = nodes.agg(count(lit(1)).cast("decimal(38,0)").as("__n"))

    // loop-invariant: edges with their source's total out-weight
    val outW = e0.groupBy(src)
      .agg(sum(col(weightCol)).cast("decimal(38,0)").as("__w"))
    val weighted = e0
      .select(src.as("__s"), dst.as("__d"),
        col(weightCol).cast("decimal(38,0)").as("__e"))
      .join(outW.select(src.as("__s"), col("__w")), Seq("__s"))

    val withN = nodes.crossJoin(broadcast(nDf))
    val ranks0 = withN.select(col("node"),
      expr(s"CAST($scale AS DECIMAL(38,0)) div __n").as("rank_fp"))

    (1 to iterations).foldLeft(ranks0) { (ranks, _) =>
      val inflow = weighted
        .join(ranks.select(col("node").as("__s"), col("rank_fp")), Seq("__s"))
        .select(col("__d"), expr(
          s"(CAST($dampingPct AS DECIMAL(38,0)) * CAST(rank_fp AS DECIMAL(38,0)) * __e)" +
            " div (CAST(100 AS DECIMAL(38,0)) * __w)").as("__c"))
        .groupBy(col("__d"))
        .agg(sum(col("__c")).as("__infl"))
      withN
        .join(inflow.select(col("__d").as("node"), col("__infl")), Seq("node"), "left")
        .select(col("node"),
          (expr(s"CAST(${100 - dampingPct} AS DECIMAL(38,0)) * CAST($scale AS DECIMAL(38,0))" +
            " div (CAST(100 AS DECIMAL(38,0)) * __n)") +
            coalesce(col("__infl"), lit(0L))).cast("long").as("rank_fp"))
    }
  }
}
