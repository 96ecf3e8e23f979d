package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed sequence packing — the training-data step after
  * [[TextAnalysis.chunkTokens]]: group fixed-size token chunks into
  * training sequences of `chunksPerSeq` chunks each.
  *
  * Packing is SHARD-LOCAL and fully deterministic: a document's chunks
  * hash to one of `shards` shards (md5-derived, engine-portable — the
  * same reproducibility contract as [[Sampling]]'s buckets), chunks
  * order within the shard by (doc, chunk), and every `chunksPerSeq`
  * consecutive chunks form one sequence. Consequences, all deliberate:
  *
  *  - a document's chunks stay ADJACENT (same shard, contiguous order),
  *    so intra-document context survives sequence boundaries;
  *  - the assignment is a pure function of the corpus — rerunning, or
  *    running on another engine, packs identically;
  *  - parallelism is `shards`, independent of corpus size: each shard
  *    is one window partition, so at 100 TB you raise `shards` (one
  *    sort partition each — Spark's window sort spills to disk, the
  *    shard need not fit in memory) rather than growing any per-task
  *    state. ONE exchange total (the shard hash), pinned in
  *    TextPipelineSpec.
  *
  * Greedy token-capacity packing (first-fit by running token count) was
  * rejected: the bin boundary depends on every preceding row, which is
  * inherently sequential per shard AND unstable under corpus growth;
  * with fixed-size chunks, k-chunks-per-sequence gives the same bounded
  * sequence length with a closed-form, window-expressible assignment.
  */
object Packing {

  /** Engine-portable shard id in [0, shards): first 4 md5 hex digits as
    * an int, mod `shards` (DuckDB: `CAST('0x' || substr(md5(..),1,4) AS
    * INTEGER) % shards`). */
  private def shardOf(key: Column, shards: Int): Column =
    (conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int") % shards).as("shard")

  /** Pack `chunks` (one row per chunk) into sequences.
    *
    * Output adds `shard`, `seq_id` (per-shard sequence ordinal) and
    * `seq_pos` (position of the chunk in its sequence, 0-based).
    * Sequence identity is the (shard, seq_id) pair.
    */
  def packChunks(
      chunks: DataFrame, docCol: String, chunkCol: String,
      chunksPerSeq: Int, shards: Int
  ): DataFrame = {
    require(chunksPerSeq > 0, s"chunksPerSeq must be positive, got $chunksPerSeq")
    require(shards > 0, s"shards must be positive, got $shards")
    Seq("shard", "seq_id", "seq_pos", "__rn").foreach { c =>
      require(!chunks.columns.contains(c),
        s"packChunks would overwrite existing column '$c' — rename it first")
    }
    val w = Window.partitionBy(col("shard")).orderBy(col(docCol), col(chunkCol))
    chunks
      .withColumn("shard", shardOf(col(docCol), shards))
      .withColumn("__rn", row_number().over(w) - 1)
      .withColumn("seq_id", floor(col("__rn") / chunksPerSeq).cast("int"))
      .withColumn("seq_pos", (col("__rn") % chunksPerSeq).cast("int"))
      .drop("__rn")
  }
}
