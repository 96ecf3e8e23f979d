package graft.operators

import org.apache.spark.sql.DataFrame
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
}
