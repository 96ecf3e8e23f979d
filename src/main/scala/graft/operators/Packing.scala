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
  /** Token-budget packing by CONCAT-AND-SPLIT — the GPT-style training
    * shape: concatenate the shard-local token stream in a deterministic
    * order and cut a sequence every `seqTokens` tokens; documents may
    * straddle a cut (the trainer's attention mask owns the boundary).
    * Unlike first-fit bin packing (rejected above — sequential and
    * unstable), the cut points are a CLOSED-FORM function of the
    * running token sum, so the assignment is window-expressible,
    * engine-reproducible, and each shard is one window partition
    * (same scale posture as [[packChunks]]: raise `shards`, ONE
    * exchange total when the input is already shard-partitioned).
    *
    * Input must carry a shard column and a deterministic in-shard
    * order column ([[Sampling.shuffleShards]] provides both) plus a
    * non-negative token count (enforced in-plan — a negative count
    * raises rather than corrupting the prefix sum). Output adds:
    *  - `tok_start` — the row's first token position on its shard's
    *    number line (the exclusive prefix sum);
    *  - `seq_first` / `seq_last` — the sequence ids the row spans
    *    (`tok_start div seqTokens` / `(tok_start + n - 1) div
    *    seqTokens`); a zero-token row spans nothing (both NULL);
    *  - `seq_offset` — the row's offset inside `seq_first`.
    */
  def packBudget(
      rows: DataFrame, shardCol: String, orderCol: String, tokenCol: String,
      seqTokens: Long
  ): DataFrame = {
    require(seqTokens > 0, s"seqTokens must be positive, got $seqTokens")
    Seq("tok_start", "seq_first", "seq_last", "seq_offset").foreach { c =>
      require(!rows.columns.contains(c),
        s"packBudget would overwrite existing column '$c' — rename it first")
    }
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // fail-loud on a negative token count (the documented contract):
    // one would silently corrupt the EXCLUSIVE prefix sum for every
    // later row in the shard — seq_last < seq_first nonsense spans —
    // so the guard rides the projection instead of trusting the caller
    val n = when(col(tokenCol) < 0, raise_error(concat(
        lit(s"packBudget: negative token count in `$tokenCol` ("),
        col(tokenCol).cast("string"),
        lit(") — token counts must be non-negative"))))
      .otherwise(col(tokenCol)).cast("long")
    rows
      .withColumn("tok_start", sum(n).over(w) - n)
      // `div` is exact integral division on longs — no double rounding
      // even at 100 TB-scale shard token counts
      .withColumn("seq_first",
        when(n > 0, expr(s"tok_start div $seqTokens")).cast("long"))
      .withColumn("seq_last",
        when(n > 0, expr(s"(tok_start + CAST(`$tokenCol` AS BIGINT) - 1) div $seqTokens"))
          .cast("long"))
      .withColumn("seq_offset",
        when(n > 0, col("tok_start") - col("seq_first") * seqTokens).cast("long"))
  }

  /** MATERIALIZE the [[packBudget]] cuts: actual fixed-length training
    * sequences from per-document token arrays — concatenate each
    * shard's token stream in `orderCol` order and emit one row per
    * `seqTokens`-long window (the per-shard LAST sequence may be
    * short; a trainer drops or pads it). Documents straddle cuts by
    * design (the attention mask owns the boundary).
    *
    * Scale shape: NO token-level explode — each document contributes
    * one array SLICE per sequence it spans (fan-out `≈ n/seqTokens +
    * 1`), the shuffle moves those slices grouped by (shard, seq) with
    * group size bounded by `seqTokens`, and the reassembly is
    * sort_array + flatten inside the aggregate row. Two declared
    * exchanges: packBudget's shard window and the (shard, seq) group.
    *
    * Output: `(shard, seq_id, seq_tokens, n_seq_tokens, n_parts)` —
    * `n_parts` counts the documents (slices) the sequence drew from.
    */
  def packSequences(
      rows: DataFrame, shardCol: String, orderCol: String, tokensCol: String,
      seqTokens: Long
  ): DataFrame = {
    require(seqTokens > 0 && seqTokens <= Int.MaxValue,
      s"seqTokens must be in (0, 2^31), got $seqTokens — slice lengths are ints")
    require(!rows.columns.contains("__n_pack"),
      "packSequences would overwrite existing column '__n_pack' — rename it first")
    val L = seqTokens
    val budgeted = packBudget(
      rows.withColumn("__n_pack", size(coalesce(col(tokensCol), array())).cast("long")),
      shardCol, orderCol, "__n_pack", L)
    budgeted
      .filter(col("__n_pack") > 0)
      .select(col(shardCol).cast("int").as("shard"), col("tok_start"),
        col("__n_pack"), col(tokensCol).as("__ts"),
        explode(expr("sequence(seq_first, seq_last)")).as("__seq"))
      // the document's slice covering sequence __seq, in LOCAL (1-based
      // for `slice`) coordinates; abs* live on the shard's number line
      .withColumn("__ls", greatest(col("__seq") * L - col("tok_start"), lit(0L)))
      .withColumn("__abs_end",
        least((col("__seq") + 1) * L, col("tok_start") + col("__n_pack")))
      .withColumn("__len", col("__abs_end") - col("tok_start") - col("__ls"))
      .select(col("shard"), col("__seq").as("seq_id"),
        struct((col("tok_start") + col("__ls")).as("k"),
          slice(col("__ts"), (col("__ls") + 1).cast("int"),
            col("__len").cast("int")).as("part")).as("__p"))
      .groupBy(col("shard"), col("seq_id"))
      .agg(sort_array(collect_list(col("__p"))).as("__ps"))
      .withColumn("seq_tokens", flatten(transform(col("__ps"), p => p("part"))))
      .select(col("shard"), col("seq_id"), col("seq_tokens"),
        size(col("seq_tokens")).as("n_seq_tokens"),
        size(col("__ps")).as("n_parts"))
  }

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
