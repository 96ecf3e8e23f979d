package graft

import org.apache.spark.sql.functions._

import graft.operators.Centrality

/** Fixed-point PageRank: hand-computed exact values on tiny graphs
  * (the arithmetic is integral, so equality is exact, not within-ε),
  * ordering on asymmetric graphs, and conservation bounds. */
class CentralitySpec extends SparkSpec {

  private def ranksOf(edges: Seq[(String, String, Long)], iters: Int) = {
    val s = spark
    import s.implicits._
    Centrality.pageRank(edges.toDF("s", "d", "w"), "s", "d", "w", iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("symmetric 2-cycle is the exact fixed point") {
    // A<->B: r0 = 5e8 each; teleport = 15e9 div 200 = 75e6;
    // inflow = (85 * 5e8 * 1) div (100 * 1) = 425e6; rank = 5e8 again
    val r = ranksOf(Seq(("A", "B", 1L), ("B", "A", 1L)), iters = 3)
    assert(r == Map("A" -> 500000000L, "B" -> 500000000L))
  }

  test("one-way edge: source decays to the teleport floor, sink accumulates") {
    // A->B only. r1(A) = teleport = 75e6 exactly; r1(B) = 75e6 + 425e6
    val r1 = ranksOf(Seq(("A", "B", 1L)), iters = 1)
    assert(r1 == Map("A" -> 75000000L, "B" -> 500000000L))
    // iteration 2: inflow(B) = (85 * 75e6) div 100 = 63,750,000
    val r2 = ranksOf(Seq(("A", "B", 1L)), iters = 2)
    assert(r2 == Map("A" -> 75000000L, "B" -> 138750000L))
  }

  test("weighted out-edges split mass proportionally, exactly") {
    // A->B w=3, A->C w=1: W(A)=4
    // inflow(B) = (85 * 5e8 * 3) div (100 * 4) wait N=3: r0 = 1e9 div 3
    val r0 = 1000000000L / 3 // 333333333
    val tele = 15L * 1000000000L / (100L * 3L) // 50000000
    val inB = 85L * r0 * 3L / (100L * 4L)
    val inC = 85L * r0 * 1L / (100L * 4L)
    val r = ranksOf(Seq(("A", "B", 3L), ("A", "C", 1L)), iters = 1)
    assert(r("A") == tele)
    assert(r("B") == tele + inB)
    assert(r("C") == tele + inC)
    assert(r("B") > r("C"))
  }

  test("total rank stays positive and bounded by scale; hub outranks leaves") {
    val edges = Seq(
      ("a", "hub", 5L), ("b", "hub", 4L), ("c", "hub", 6L),
      ("hub", "a", 1L), ("hub", "b", 1L), ("hub", "c", 1L))
    val r = ranksOf(edges, iters = 3)
    assert(r.values.forall(_ > 0))
    assert(r.values.sum <= 1000000000L)
    assert(r("hub") > r("a") && r("hub") > r("b") && r("hub") > r("c"))
  }

  test("node count enters the plan as a broadcast, not a driver collect") {
    val s = spark
    import s.implicits._
    val df = Centrality.pageRank(
      Seq(("A", "B", 1L), ("B", "A", 1L)).toDF("s", "d", "w"), "s", "d", "w", 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected the 1-row count to broadcast:\n$plan")
  }

  test("checkpointing truncates the unrolled plan without changing a single rank") {
    val s = spark
    import s.implicits._
    val edges = Seq(
      ("a", "hub", 5L), ("b", "hub", 4L), ("c", "hub", 6L),
      ("hub", "a", 1L), ("hub", "b", 1L), ("hub", "c", 1L),
      ("a", "b", 2L), ("c", "a", 1L)).toDF("s", "d", "w")
    def run(ckpt: Int) =
      Centrality.pageRank(edges, "s", "d", "w", iterations = 12,
        checkpointInterval = ckpt)
    val plain   = run(0)
    val ckpted  = run(3)
    // integral arithmetic: equality is exact, not within-epsilon
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(toMap(ckpted) === toMap(plain))
    // the truncation must be VISIBLE in the plan: 12 unrolled
    // iterations carry ~12 rank-join stages; with interval 3 the
    // returned plan holds only the rounds since the last snapshot
    // (10..12) plus the leaf — well under half the joins
    def joins(df: org.apache.spark.sql.DataFrame) =
      "Join".r.findAllIn(df.queryExecution.analyzed.toString).size
    assert(joins(ckpted) * 2 < joins(plain),
      s"checkpointed plan has ${joins(ckpted)} joins vs ${joins(plain)} unrolled")
  }

  // ------------------------------------------------------------ triangles
  private def triOf(edges: Seq[(String, String)]): Map[String, Long] = {
    val s = spark
    import s.implicits._
    Centrality.triangles(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("triangles: K4 gives every node C(3,2)=3 triangles") {
    val k4 = for {
      a <- Seq("A", "B", "C", "D"); b <- Seq("A", "B", "C", "D") if a < b
    } yield (a, b)
    assert(triOf(k4) === Map("A" -> 3L, "B" -> 3L, "C" -> 3L, "D" -> 3L))
  }

  test("triangles: direction, duplicates, and self-loops are canonicalized away") {
    // one triangle A-B-C plus noise: reversed duplicates, a self-loop,
    // and a pendant edge that closes nothing
    val edges = Seq(
      ("A", "B"), ("B", "A"), ("B", "C"), ("C", "B"),
      ("C", "A"), ("A", "A"), ("C", "D"))
    assert(triOf(edges) === Map("A" -> 1L, "B" -> 1L, "C" -> 1L))
  }

  test("triangles match a brute-force reference on a pseudo-random graph") {
    // deterministic 12-node graph via a multiplicative hash
    val nodes = (0 until 12).map(i => f"n$i%02d")
    val edges = for {
      i <- 0 until 12; j <- 0 until 12 if i < j
      if ((i * 31 + j * 17) % 5) < 2
    } yield (nodes(i), nodes(j))
    val eset = edges.toSet
    def hasEdge(a: String, b: String) =
      eset.contains((a, b)) || eset.contains((b, a))
    val want = nodes.map { n =>
      n -> (for {
        a <- nodes; b <- nodes
        if a < b && a != n && b != n
        if hasEdge(n, a) && hasEdge(n, b) && hasEdge(a, b)
      } yield 1).size.toLong
    }.filter(_._2 > 0).toMap
    assert(triOf(edges) === want)
  }

  // ------------------------------------------------------------ k-core

  private def coreOf(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    graft.operators.Centrality.kCore(edges.toDF("src", "dst"), "src", "dst", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("kCore: a chain peels away over multiple rounds; the triangle survives") {
    // path 10-11-12-13-14 hanging off triangle 1-2-3 via 1-10: each
    // round peels one chain end, so convergence needs ~5 rounds — the
    // loop, not just one peel, is exercised
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (1L, 10L), (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L))
    assert(coreOf(edges, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // no 3-core exists here
    assert(coreOf(edges, 3).isEmpty)
  }

  test("kCore: direction, duplicates and self-loops are canonicalized away") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L), (3L, 1L))
    assert(coreOf(edges, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  // ------------------------------------------------------------ label propagation

  private def lpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    graft.operators.Centrality.labelPropagationRounds(
      edges.toDF("src", "dst"), "src", "dst", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("labelPropagation: a clique converges to its minimum label") {
    // triangle {1,2,3}: round1 -> (2,1,1), round2 -> (1,1,1), stable
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(lpa(tri, 1) == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
    assert(lpa(tri, 2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(lpa(tri, 3) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("labelPropagation: dense sides keep distinct communities across a bridge") {
    // two 4-cliques bridged by one edge: by round 3 each side has
    // flooded to its own minimum; the bridge can't overturn the
    // majority inside either clique
    def clique(ns: Seq[Long]) = for { a <- ns; b <- ns if a < b } yield (a, b)
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++ Seq((4L, 10L))
    val out = lpa(edges, 3)
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_) == 1L), out.toString)
    assert(Seq(11L, 12L, 13L).forall(out(_) == 10L), out.toString)
  }

  test("labelPropagation: ties break to the smallest label; direction and dups canonicalize") {
    // node 3 sees labels {1, 2} once each after round 1 init -> picks 1
    val edges = Seq((3L, 1L), (1L, 3L), (2L, 3L), (3L, 3L))
    assert(lpa(edges, 1) == Map(1L -> 3L, 2L -> 3L, 3L -> 1L))
  }

  test("kCorePeel after convergence equals kCore (extra rounds are the identity)") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 3L),
      (6L, 7L)).toDF("src", "dst")
    val fix = graft.operators.Centrality.kCore(edges, "src", "dst", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (rounds <- Seq(2, 4)) {
      val peeled = graft.operators.Centrality.kCorePeel(edges, "src", "dst", 2, rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(peeled == fix, s"rounds=$rounds")
    }
  }
}
