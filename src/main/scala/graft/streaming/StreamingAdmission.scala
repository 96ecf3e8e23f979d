package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Streaming corpus admission — the foreachBatch twin of
  * [[graft.operators.Dedup.exactIncremental]]: every micro-batch of
  * documents is admitted against a PERSISTENT fingerprint store (drop
  * if the content was ever seen; in-batch min-id survivor rule),
  * admitted docs append to the corpus sink and their fingerprints
  * join the store — the "never train on the same text twice" loop.
  *
  * Store layout mirrors [[StreamingUpsert]]: fingerprints partitioned
  * by a fingerprint-hash bucket, so a micro-batch READS only the
  * buckets its own fingerprints land in and APPENDS only fingerprints
  * the store has never seen (set semantics — a replayed batch
  * anti-joins empty and appends nothing, and no live file is ever
  * deleted under a concurrent reader). The corpus sink is
  * partitioned by batch id and each batch overwrites ITS partition —
  * the standard idempotent foreachBatch sink: a replayed batch
  * replaces its own output instead of duplicating it. Both writes are
  * idempotent, so failure recovery is a content no-op end to end.
  *
  * `numBuckets` is a table property recorded in a `_graft_buckets`
  * sidecar and re-checked fail-loud (a reader pruning with the wrong
  * modulus would silently re-admit known content).
  */
object StreamingAdmission {

  val BucketCol = "__kb"
  val BatchCol  = "__batch_id"

  private def bucketOf(numBuckets: Int) =
    pmod(hash(col("fingerprint")), lit(numBuckets))

  private def marker(path: String) = Paths.get(path, "_graft_buckets")

  private def writeMarker(path: String, numBuckets: Int): Unit = {
    Files.createDirectories(Paths.get(path))
    Files.write(marker(path), numBuckets.toString.getBytes(StandardCharsets.UTF_8))
  }

  private def checkMarker(path: String, numBuckets: Int): Unit = {
    require(Files.exists(marker(path)),
      s"$path has no _graft_buckets marker — initialize() the store first")
    val stored = new String(Files.readAllBytes(marker(path)), StandardCharsets.UTF_8).trim.toInt
    require(stored == numBuckets,
      s"bucket-count mismatch for $path: store laid out with $stored buckets, " +
        s"caller passed $numBuckets — pruning with the wrong modulus re-admits known content")
  }

  // explicit schema: an empty-corpus bootstrap writes a marker but no
  // parquet files, and schema inference over the empty directory would
  // throw on the FIRST micro-batch — the natural cold start (begin
  // streaming with no pre-existing corpus) must work
  private def readStore(spark: org.apache.spark.sql.SparkSession, path: String) =
    spark.read.schema(s"fingerprint STRING, $BucketCol INT").parquet(path)

  private def requireCleanColumns(df: DataFrame): Unit =
    Seq("fingerprint", BucketCol, BatchCol).foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column — rename it first (it would be " +
          "silently overwritten by the admission plumbing)")
    }

  /** Bootstrap the fingerprint store from the existing corpus
    * (static overwrite: re-initializing truncates; marker after
    * data). */
  def initialize(
      corpus: DataFrame, textCol: String, fpStorePath: String, numBuckets: Int
  ): Unit = {
    Dedup.fingerprints(corpus, textCol)
      .withColumn(BucketCol, bucketOf(numBuckets))
      .write.mode("overwrite")
      .partitionBy(BucketCol).parquet(fpStorePath)
    writeMarker(fpStorePath, numBuckets)
  }

  /** Admit one micro-batch: anti-join the touched store buckets,
    * in-batch survivor rule, write admitted docs to
    * `corpusOutPath/<BatchCol>=<batchId>` (overwriting that partition
    * — replay-idempotent) and append the never-seen fingerprints to
    * their buckets (set semantics — replay-idempotent). Exposed for
    * tests and custom sinks. */
  def applyBatch(
      batch: DataFrame, idCol: String, textCol: String,
      fpStorePath: String, corpusOutPath: String, numBuckets: Int, batchId: Long
  ): Unit = {
    if (batch.isEmpty) return
    requireCleanColumns(batch)
    checkMarker(fpStorePath, numBuckets)
    val spark = batch.sparkSession
    // fingerprint the batch ONCE (normalize+md5 is the hottest
    // expression of the loop) and feed every consumer from the cached
    // frame — the anti-join/survivor logic below is the
    // Dedup.exactIncremental algebra inlined over the same columns
    // (batch parity is spec-pinned against the batch operator)
    val withFp = batch
      .withColumn("fingerprint", Dedup.contentFingerprint(col(textCol)))
      .withColumn(BucketCol, bucketOf(numBuckets))
    withFp.persist()
    try {
      // bounded driver materialization: at most numBuckets ints
      val touched = withFp.select(col(BucketCol)).distinct()
        .collect().map(_.getInt(0)).toSeq
      val stored = readStore(spark, fpStorePath)
        .filter(col(BucketCol).isin(touched: _*))
        .select(col("fingerprint"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fingerprint")).orderBy(col(idCol))
      val admitted = withFp
        .join(stored, Seq("fingerprint"), "left_anti")
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn", "fingerprint", BucketCol)
      admitted
        .withColumn(BatchCol, lit(batchId))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy(BatchCol).parquet(corpusOutPath)
      // APPEND-ONLY store publish: the fingerprint store is a SET, so
      // only fingerprints it has never seen land — as new files beside
      // the old ones — instead of dynamic-overwriting every touched
      // bucket with (stored ∪ batch). A batch's store write is
      // O(new fingerprints), not O(touched buckets), no live file is
      // deleted under a concurrent reader, and a replayed batch
      // anti-joins empty and appends nothing — the same set semantics
      // and idempotence, cheaper.
      // the partition count is pinned to the session's shuffle
      // parallelism (not left to AQE): a column-only repartition
      // coalesces a small batch to ONE post-shuffle partition and the
      // single writer creates every touched bucket-dir file
      // sequentially (see StreamingAnnIndex.applyBatch). File count is
      // one per touched bucket either way.
      withFp.select(col("fingerprint"), col(BucketCol)).distinct()
        .join(stored, Seq("fingerprint"), "left_anti")
        .repartition(spark.sessionState.conf.numShufflePartitions,
          col(BucketCol))
        .write.mode("append")
        .partitionBy(BucketCol).parquet(fpStorePath)
    } finally withFp.unpersist()
  }

  /** Wire a document stream to corpus admission. */
  def maintain(
      stream: DataFrame, idCol: String, textCol: String,
      fpStorePath: String, corpusOutPath: String, numBuckets: Int,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")
  ): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, idCol, textCol, fpStorePath, corpusOutPath, numBuckets, batchId)
      }
      .start()
}
