package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.rdd.RDD
import org.apache.spark.storage.StorageLevel

/** Manual lineage truncation for iterative operators
  * ([[Dedup.connectedComponents]], [[Centrality.pageRank]]).
  *
  * Iterative plans that self-reference double the logical plan per
  * round; after ~8 rounds Catalyst planning time dominates and a
  * single task failure recomputes the whole unrolled chain. Spark's
  * own answers don't fit here: `Dataset.localCheckpoint` blocks can
  * never be freed (`unpersist` is a no-op for them — the CacheManager
  * never tracked the blocks), and `checkpoint` needs a configured HDFS
  * dir. So rounds checkpoint manually: persist the Row RDD, wrap it in
  * a fresh leaf plan (the Catalyst lineage truncation), and
  * `release()` the blocks once a later snapshot supersedes it.
  * MEMORY_AND_DISK persistence (unlike localCheckpoint's truncated RDD
  * lineage) also stays recomputable if an executor drops a block.
  */
private[graft] object Lineage {

  /** A materialized label snapshot with a RELEASABLE storage handle. */
  final case class Snapshot(df: DataFrame, private val rdd: RDD[Row]) {
    def release(): Unit = rdd.unpersist(blocking = false)
  }

  def snapshot(df: DataFrame): Snapshot = {
    val rdd = df.rdd
    rdd.persist(StorageLevel.MEMORY_AND_DISK)
    rdd.count() // eager materialization, like localCheckpoint(true)
    Snapshot(df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  /** [[snapshot]] with HARD RDD-lineage truncation. Plain snapshots
    * truncate the CATALYST plan but the persisted RDDs still chain
    * through their dependency graphs, and task serialization walks
    * that chain — at round counts in the hundreds (BPE training's 256+
    * merges vs PageRank's 10-50 iterations) java serialization
    * overflows the stack. `localCheckpoint` replaces the dependency
    * graph with a checkpoint leaf after materialization. The price:
    * the blocks cannot be released explicitly (the CacheManager never
    * tracks them — [[Snapshot.release]] becomes a no-op) and an
    * executor-lost block is unrecoverable; use it every K rounds of a
    * long loop, with plain releasable snapshots in between. */
  def snapshotTruncated(df: DataFrame): Snapshot = {
    val rdd = df.rdd.localCheckpoint()
    rdd.count()
    Snapshot(df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }
}
