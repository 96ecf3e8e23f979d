package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Redirect-chain resolution — the post-fetch companion to the crawl
  * loop: 3xx responses yield a `(src, dst)` edge per page
  * ([[Warc.httpHeader]] `Location` against the record's target URI),
  * and the frontier wants every chain collapsed to its terminal
  * target before admission, or a re-crawl fetches each hop again.
  *
  * Resolution is POINTER DOUBLING, not iteration-per-hop: round k
  * rewrites every mapping `src -> cur` to `src -> M(cur)` where `M` is
  * the round's own mapping, so chains of length `2^k` collapse in `k`
  * self-joins — `ceil(log2(maxDepth)) + 1` shuffles total, each sized
  * by the EDGE table (never the corpus, never per-hop). A chain
  * longer than `maxDepth`, or any cycle (including a self-loop),
  * never leaves the source domain and reports `resolved = false` with
  * NULL target/hops — deterministic, no sentinel loops.
  *
  * Input contract: one redirect per source (a URL redirects to ONE
  * place) — a duplicate source raises in-plan before it silently
  * forks a chain; NULL-src/dst rows are dropped (a redirect without a
  * Location is not a redirect).
  */
object Redirects {

  /** Collapse every chain: `(src, final_url, hops, resolved)`. */
  def resolve(
      edges: DataFrame, srcCol: String, dstCol: String, maxDepth: Int = 32
  ): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val base = edges
      .select(col(srcCol).cast("string").as("src"), col(dstCol).cast("string").as("cur"))
      .filter(col("src").isNotNull && col("cur").isNotNull)
    // fail-loud duplicate-source guard, riding a filter so pruning
    // cannot drop it (the duplicateKeyGuard idiom)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
    val guarded = base
      .withColumn("__ok",
        when(count(lit(1)).over(w) > 1,
          raise_error(concat(lit("Redirects.resolve: source "), col("src"),
            lit(" redirects to more than one target — corrupt edge set"))))
          .otherwise(lit(true)))
      .filter(col("__ok")).drop("__ok")

    val rounds = math.max(1,
      (math.log(maxDepth.toDouble) / math.log(2.0)).ceil.toInt + 1)
    var m = guarded.withColumn("hops", lit(1L))
    for (_ <- 1 to rounds) {
      val a = m.select(col("src"), col("cur"), col("hops"))
      val b = m.select(col("src").as("__bsrc"), col("cur").as("__bcur"),
        col("hops").as("__bhops"))
      m = a.join(b, a("cur") === b("__bsrc"), "left")
        .select(col("src"),
          coalesce(col("__bcur"), col("cur")).as("cur"),
          when(col("__bsrc").isNotNull, col("hops") + col("__bhops"))
            .otherwise(col("hops")).as("hops"))
    }
    // terminal iff the final target is not itself a source (cycles and
    // over-deep chains never leave the domain)
    val srcs = guarded.select(col("src").as("__s")).distinct()
    m.join(srcs, m("cur") === srcs("__s"), "left")
      .withColumn("resolved", col("__s").isNull && col("hops") <= maxDepth)
      .select(col("src"),
        when(col("resolved"), col("cur")).as("final_url"),
        when(col("resolved"), col("hops")).as("hops"),
        col("resolved"))
  }
}
