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

  /** Per-node triangle participation counts over an undirected simple
    * graph (the clustering-coefficient numerator — community density
    * signal for curation graphs like near-dup pair graphs or
    * transition graphs).
    *
    * The classic MR-scale shape [Suri & Vassilvitskii, WWW 2011,
    * "Counting triangles and the curse of the last reducer"]: edges
    * are ORIENTED from the (degree, node)-smaller endpoint to the
    * larger, wedges are built only around each edge's low-degree
    * center, and each wedge probes the canonical edge set once. The
    * orientation bounds every node's out-degree by O(√m), so the
    * wedge intermediate is O(m^1.5) worst-case instead of Σ deg² —
    * a hub with a million neighbors contributes NO wedges from its
    * own adjacency (its edges all point inward). Joins are plain
    * equi-joins (shuffle on node / pair keys, partial-aggregated
    * counts); nothing touches the driver.
    *
    * Input edges may be directed/weighted/duplicated; they are
    * canonicalized (self-loops dropped, direction collapsed,
    * distinct). Nodes in no triangle are absent from the result. */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // canonical undirected simple edge set: a < b
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    // degree-based total order: (degree, node) — ties broken by node id
    // so the orientation is acyclic
    val deg = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val oriented = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst"))).as("o"))
      .select(col("o.src").as("src"), col("o.dst").as("dst"))
    // wedges around each low-degree center; y < z keeps one per pair
    val o2 = oriented.select(col("src"), col("dst").as("dst2"))
    val wedges = oriented.join(o2, "src")
      .where(col("dst") < col("dst2"))
      .select(col("src").as("x"), col("dst").as("y"), col("dst2").as("z"))
    // close the wedge against the canonical set ((y, z) already y < z)
    val tri = wedges.join(e,
      wedges("y") === e("a") && wedges("z") === e("b"))
      .select(col("x"), col("y"), col("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Scoped edge-list lifecycle for pipelines that rank repeatedly:
    * persists the (node^2-bounded) aggregated edge list, runs `f`,
    * releases — the [[graft.operators.LanguageModel.withModel]]
    * loan shape. */
  /** Canonical undirected simple edge set: self-loops dropped,
    * direction collapsed (a < b), duplicates removed. */
  private def canonical(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** One k-core peeling round: drop every node of degree < k (and its
    * edges). Two aggregations + two anti-joins, all on node keys. */
  private def peelOnce(e: DataFrame, k: Int): DataFrame = {
    val deg = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val bad = deg.filter(col("deg") < k).select(col("node"))
    e.join(bad.select(col("node").as("a")), Seq("a"), "left_anti")
      .join(bad.select(col("node").as("b")), Seq("b"), "left_anti")
  }

  /** Degrees of the surviving graph: (node, deg). */
  private def degrees(e: DataFrame): DataFrame =
    e.select(col("a").as("node")).union(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

  /** Exactly `rounds` k-core peeling rounds, returning the surviving
    * nodes with their remaining degrees — the bounded, oracle-mirrorable
    * slice of [[kCore]] (same per-round arithmetic, no data-dependent
    * loop), the way the `events_pagerank` gate pins a fixed iteration
    * count. After convergence extra rounds are the identity, so on a
    * graph whose peel converges within `rounds` this IS the k-core. */
  def kCorePeel(
      edges: DataFrame, srcCol: String, dstCol: String, k: Int, rounds: Int
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // every round MUST materialize: peelOnce references its input 4x
    // (degree union twice, two anti-joins), so a lazy chain re-executes
    // the edge-producing subtree 4^rounds times — with a pair-join
    // input that was a measured 75s at sf0.1 vs ~2s snapshotted (the
    // exact Spark-side analogue of the DuckDB CTE-inlining blowup the
    // oracle hit). The final snapshot backs the returned plan, the
    // [[kCore]] / [[pageRank]] convention.
    var snap = Lineage.snapshot(canonical(edges, srcCol, dstCol))
    try {
      (1 to rounds).foreach { _ =>
        val next = Lineage.snapshot(peelOnce(snap.df, k))
        snap.release()
        snap = next
      }
    } catch { case t: Throwable =>
      snap.release() // a mid-round failure must not pin the blocks
      throw t
    }
    degrees(snap.df)
  }

  /** k-core decomposition membership [Seidman 1983, "Network structure
    * and minimum degree"]: the maximal subgraph where every node keeps
    * degree >= k, found by iteratively peeling lower-degree nodes.
    * The curation read: the k-core of a near-duplicate pair graph is
    * its densely-duplicated heart (template farms, mirror rings) —
    * chains and isolated pairs peel away.
    *
    * Returns (node, deg) of the k-core (deg >= k by construction;
    * empty when no k-core exists). Each round is two node-keyed
    * aggregations + two anti-joins; the edge set materializes through
    * a [[Lineage]] snapshot every round (the [[graft.operators.Dedup
    * .connectedComponents]] pattern), so plan depth stays bounded and
    * a failure never recomputes the whole peel chain. Convergence is
    * detected by the edge count (no node peels ⟺ no edge drops);
    * rounds are bounded by the peel depth — O(√m) worst case, tiny in
    * practice — with `maxIter` as the fail-loud guard. */
  def kCore(
      edges: DataFrame, srcCol: String, dstCol: String, k: Int, maxIter: Int = 50
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var snap  = Lineage.snapshot(canonical(edges, srcCol, dstCol))
    var count = snap.df.count()
    var converged = false
    var i = 0
    try {
      while (!converged && i < maxIter) {
        val next  = Lineage.snapshot(peelOnce(snap.df, k))
        val nCnt  = next.df.count()
        converged = nCnt == count
        snap.release()
        snap  = next
        count = nCnt
        i += 1
      }
    } catch { case t: Throwable =>
      snap.release() // a mid-round failure must not pin the blocks
      throw t
    }
    if (!converged) {
      snap.release() // don't leak the persisted blocks on the error path
      throw new IllegalStateException(s"kCore did not converge after $maxIter rounds")
    }
    degrees(snap.df)
  }

  /** Synchronous label propagation [Raghavan, Albert & Kumara 2007,
    * "Near linear time algorithm to detect community structures"] over
    * the canonical undirected simple graph, run for EXACTLY `rounds`
    * rounds: labels start as node ids; each round every node adopts
    * the label most frequent among its neighbors' previous-round
    * labels (ties to the smallest label). Sync LPA can oscillate
    * (2-cycles on bipartite structures), so the fixed-round slice IS
    * the deterministic contract — the [[kCorePeel]] convention — and
    * what the unrolled SQL oracle mirrors. The curation read: label
    * plateaus on a near-dup pair graph are template families.
    *
    * Per round: one join of the neighbor list against the label table
    * and two node-keyed aggregations; labels materialize through a
    * [[Lineage]] snapshot per round (lazy chaining would re-execute
    * the edge-producing subtree per reference — the [[kCorePeel]]
    * lesson). Returns (node, label). */
  def labelPropagationRounds(
      edges: DataFrame, srcCol: String, dstCol: String, rounds: Int
  ): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = Lineage.snapshot(canonical(edges, srcCol, dstCol))
    val neigh = e.df.select(col("a").as("node"), col("b").as("nb"))
      .union(e.df.select(col("b").as("node"), col("a").as("nb")))
    var labels = Lineage.snapshot(
      e.df.select(col("a").as("node")).union(e.df.select(col("b").as("node")))
        .distinct()
        .withColumn("lbl", col("node")))
    try {
      (1 to rounds).foreach { _ =>
        val cand = neigh.join(
          labels.df.select(col("node").as("nb"), col("lbl")), Seq("nb"))
        // argmax by (count desc, label asc) via min over (-count, label)
        // — a struct min, no window
        val next = Lineage.snapshot(
          cand.groupBy(col("node"), col("lbl")).agg(count(lit(1)).as("c"))
            .groupBy(col("node"))
            .agg(min(struct((-col("c")).as("negc"), col("lbl"))).as("m"))
            .select(col("node"), col("m.lbl").as("lbl")))
        labels.release()
        labels = next
      }
    } catch { case t: Throwable =>
      labels.release() // mid-round failure: pin nothing
      e.release()
      throw t
    }
    e.release()
    labels.df
  }

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
    * @param checkpointInterval every N iterations the rank table is
    *                   materialized through a [[Lineage]] snapshot and
    *                   the plan restarts from the fresh leaf — without
    *                   it plan depth and analysis cost grow per
    *                   iteration and a single task failure recomputes
    *                   the whole unrolled chain (real link ranking runs
    *                   20–50 iterations). Checkpoint blocks are
    *                   released as soon as a later one supersedes them;
    *                   the LAST snapshot backs the returned plan and
    *                   stays persisted (MEMORY_AND_DISK — evicted
    *                   blocks recompute). `0` disables (the ranks are
    *                   bit-identical either way — integral arithmetic).
    * @return (node, rank_fp) — rank_fp is the fixed-point rank at `scale`
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String, weightCol: String,
      iterations: Int, dampingPct: Int = 85, scale: Long = 1000000000L,
      checkpointInterval: Int = 10
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

    var prevSnap: Option[Lineage.Snapshot] = None
    (1 to iterations).foldLeft(ranks0) { (ranks, i) =>
      val inflow = weighted
        .join(ranks.select(col("node").as("__s"), col("rank_fp")), Seq("__s"))
        .select(col("__d"), expr(
          s"(CAST($dampingPct AS DECIMAL(38,0)) * CAST(rank_fp AS DECIMAL(38,0)) * __e)" +
            " div (CAST(100 AS DECIMAL(38,0)) * __w)").as("__c"))
        .groupBy(col("__d"))
        .agg(sum(col("__c")).as("__infl"))
      val next = withN
        .join(inflow.select(col("__d").as("node"), col("__infl")), Seq("node"), "left")
        .select(col("node"),
          (expr(s"CAST(${100 - dampingPct} AS DECIMAL(38,0)) * CAST($scale AS DECIMAL(38,0))" +
            " div (CAST(100 AS DECIMAL(38,0)) * __n)") +
            coalesce(col("__infl"), lit(0L))).cast("long").as("rank_fp"))
      // truncate lineage every N rounds; the final iteration returns
      // lazy (callers compose it — a snapshot there would force eager
      // execution inside what is otherwise a declarative operator)
      if (checkpointInterval > 0 && i % checkpointInterval == 0 && i < iterations) {
        val snap = Lineage.snapshot(next)
        prevSnap.foreach(_.release())
        prevSnap = Some(snap)
        snap.df
      } else next
    }
  }
}
