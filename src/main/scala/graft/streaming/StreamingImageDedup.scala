package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Dedup, Multimodal}

/** Streaming/batch PERCEPTUAL image admission — the media member of
  * the admission ladder ([[StreamingAdmission]] exact text →
  * [[StreamingNearDup]] Jaccard → [[StreamingWinnowDedup]] local
  * overlap → [[StreamingSemDedup]] semantic → this): admit a batch of
  * images whose dHash lands outside the hamming ball of every
  * ALREADY-ADMITTED image. Recompressed, losslessly re-encoded, and
  * exact-factor-rescaled copies of an admitted image hash into the
  * ball (see [[Multimodal.dHash]]'s invariances) and are rejected
  * without the corpus ever being re-decoded.
  *
  * Store layout: the maintained artifact is the dHash POSTING table
  * `(vid, band, chunk, dhash)` under the [[Dedup.hamming64Bands]]
  * radius-derived banding (pigeonhole: any in-radius pair shares a
  * band chunk), partitioned by a chunk-hash bucket — a batch computes
  * its own postings scan-locally (decode + hash per partition), READS
  * only the buckets those postings land in, and REWRITES only those
  * buckets as a set union. The full hash rides in the posting row, so
  * hamming verification needs no second store read. Admitted images
  * append `(vid, dhash)` to the sink under their own batch partition.
  *
  * Admission contract (the [[graft.operators.Dedup.minhashIncremental]]
  * contract lifted to hamming balls): a batch image is admitted iff
  * (a) it is the min-id representative of its within-batch hamming
  * component and (b) no admitted image lies within `maxHamming`.
  * Replay is a content no-op by construction: a replayed batch's
  * postings are already in the store, every image collides with
  * itself at hamming 0 and is rejected, so the admitted set is empty
  * and the posting union is idempotent.
  *
  * Scale shape: decode+hash is scan-local mapPartitions; the store
  * probe is an equi-join of the batch's ≤(maxHamming+1)·|batch|
  * posting rows against bucket-pruned store partitions; the in-batch
  * pair join is [[Dedup.hamming64Pairs]] (capped buckets). The corpus
  * is never rescanned or re-decoded.
  */
object StreamingImageDedup {

  val BucketCol = "__kb"
  val BatchCol  = "__batch_id"

  final case class Params(
      numBuckets: Int, maxHamming: Int = 3, maxBucket: Int = 1000) {
    def encoded: String = s"$numBuckets;$maxHamming;$maxBucket"
  }

  private def bucketOf(numBuckets: Int) =
    pmod(hash(col("band"), col("chunk")), lit(numBuckets))

  private def marker(path: String) = Paths.get(path, "_graft_dhash")

  private def writeMarker(path: String, p: Params): Unit = {
    Files.createDirectories(Paths.get(path))
    Files.write(marker(path), p.encoded.getBytes(StandardCharsets.UTF_8))
  }

  private def checkMarker(path: String, p: Params): Unit = {
    require(Files.exists(marker(path)),
      s"$path has no _graft_dhash marker — initialize() the store first")
    val stored = new String(Files.readAllBytes(marker(path)), StandardCharsets.UTF_8).trim
    require(stored == p.encoded,
      s"dhash posting-table parameter mismatch for $path: store laid out with " +
        s"($stored), caller passed (${p.encoded}) — a different radius bands " +
        "differently and mixed postings silently lose recall")
  }

  // explicit schema: survives the empty-store cold start
  private def readStore(
      spark: org.apache.spark.sql.SparkSession, path: String, idCol: String) =
    spark.read
      .schema(s"`$idCol` BIGINT, dhash BIGINT, band INT, chunk BIGINT, $BucketCol INT")
      .parquet(path)

  /** dHash postings of an image table (`idCol`, `payload` binary). */
  private def postingsOf(
      images: DataFrame, idCol: String, p: Params): DataFrame =
    Dedup.hamming64Bands(
      Multimodal.dHash(images.select(col(idCol).cast("long").as("doc_id"), col("payload")))
        .toDF().select(col("doc_id").as(idCol), col("dhash")),
      idCol, "dhash", p.maxHamming)
      .withColumn(BucketCol, bucketOf(p.numBuckets))

  /** Bootstrap the posting store AND the admitted sink from an
    * existing image corpus (batch -1, admitted wholesale — the
    * [[StreamingNearDup.initialize]] shape). Marker written last, so
    * a crashed initialize is detectable (no marker → applyBatch fails
    * actionably). */
  def initialize(
      corpus: DataFrame, idCol: String,
      storePath: String, sinkPath: String, p: Params): Unit = {
    val posts = postingsOf(corpus, idCol, p)
    posts.write.mode("overwrite").partitionBy(BucketCol).parquet(storePath)
    posts.select(col(idCol), col("dhash")).distinct()
      .withColumn(BatchCol, lit(-1L))
      .write.mode("overwrite").partitionBy(BatchCol).parquet(sinkPath)
    writeMarker(storePath, p)
  }

  /** Admit one image batch against the posting store + sink. */
  def applyBatch(
      batch: DataFrame, batchId: Long, idCol: String,
      storePath: String, sinkPath: String, p: Params): Unit = {
    if (batch.isEmpty) return
    checkMarker(storePath, p)
    val spark = batch.sparkSession
    val batchPosts = postingsOf(batch, idCol, p).persist()
    try {
      // bounded driver materialization: at most numBuckets ints
      val touched = batchPosts.select(col(BucketCol)).distinct()
        .collect().map(_.getInt(0)).toSeq
      val stored = readStore(spark, storePath, idCol)
        .filter(col(BucketCol).isin(touched: _*))
      val hashes = batchPosts.select(col(idCol), col("dhash")).distinct()
      // (b) corpus rejection: chunk-equality candidates verified by
      // exact hamming. No same-id exclusion — a REPLAYED image finds
      // its own posting at hamming 0 and self-rejects (the NearDup
      // replay-as-rejection construction).
      val corpusMatched = batchPosts.as("a")
        .join(stored.as("b"),
          col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk"))
        .filter(bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))) <= p.maxHamming)
        .select(col(s"a.$idCol")).distinct()
      // (a) in-batch min-id component representative
      val inBatchPairs = Dedup.hamming64Pairs(
        hashes, idCol, "dhash", p.maxHamming, p.maxBucket)
      val admitted = Dedup.survivors(hashes, idCol, inBatchPairs)
        .join(corpusMatched, Seq(idCol), "left_anti")
        .persist()
      try {
        // sink FIRST, postings second: a crash in between replays with
        // the admitted docs' bands still absent from the store, so the
        // same admitted set recomputes and both writes repeat
        // byte-identically
        admitted.select(col(idCol), col("dhash"))
          .withColumn(BatchCol, lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy(BatchCol).parquet(sinkPath)
        val admittedPosts = batchPosts
          .join(admitted.select(col(idCol)), Seq(idCol), "left_semi")
        stored.unionByName(admittedPosts).distinct()
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy(BucketCol).parquet(storePath)
      } finally admitted.unpersist(blocking = false)
    } finally batchPosts.unpersist(blocking = false)
  }

  /** This batch's admitted `(id, dhash)` — empty when nothing
    * admitted. Existence-checked, not Try-swallowed. */
  def admittedOf(
      spark: org.apache.spark.sql.SparkSession, sinkPath: String,
      idCol: String, batchId: Long): DataFrame =
    if (Files.isDirectory(Paths.get(sinkPath)))
      spark.read
        .schema(s"`$idCol` BIGINT, dhash BIGINT, $BatchCol BIGINT")
        .parquet(sinkPath)
        .filter(col(BatchCol) === batchId)
        .select(col(idCol), col("dhash"))
    else {
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF(idCol, "dhash")
    }

  /** Wire an image stream (`idCol`, `payload`) to perceptual
    * admission. */
  def maintain(
      stream: DataFrame, idCol: String,
      storePath: String, sinkPath: String, p: Params,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")
  ): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch, id, idCol, storePath, sinkPath, p)
      }
      .start()
}
