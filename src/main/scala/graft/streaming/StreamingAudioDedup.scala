package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Multimodal

/** Streaming/batch PERCEPTUAL audio admission — the audio member of
  * the media admission ladder, [[StreamingImageDedup]]'s twin over
  * [[Multimodal.audioFingerprint]]: admit a batch of clips whose
  * sign-of-energy-delta fingerprint lands outside the hamming ball of
  * every ALREADY-ADMITTED clip. Attenuated (turned-down) and
  * losslessly re-encoded copies of an admitted clip fingerprint into
  * the ball (the Haitsma–Kalker delta-sign robustness — see
  * [[Multimodal.audioFingerprint]]) and are rejected without the
  * corpus ever being re-decoded.
  *
  * Store layout, admission contract, replay-idempotence and the 100 TB
  * shape are [[StreamingHammingDedup]]'s — the shared hamming-ball
  * admission core this store instantiates with the audio-fingerprint
  * signature pass (real WAV decode + windowed energies, scan-local
  * mapPartitions).
  */
object StreamingAudioDedup {

  val BucketCol = StreamingHammingDedup.BucketCol
  val BatchCol  = StreamingHammingDedup.BatchCol

  final case class Params(
      numBuckets: Int, maxHamming: Int = 3, maxBucket: Int = 1000) {
    def encoded: String = s"$numBuckets;$maxHamming;$maxBucket"
    private[streaming] def core =
      StreamingHammingDedup.Params(numBuckets, maxHamming, maxBucket)
  }

  private val core = new StreamingHammingDedup(
    markerName = "_graft_afp", hashCol = "afp",
    sigOf = (clips, idCol) =>
      Multimodal.audioFingerprint(
        clips.select(col(idCol).cast("long").as("doc_id"), col("payload")))
        .toDF().select(col("doc_id").as(idCol), col("afp")))

  /** Whether `initialize` completed for this store path. */
  def initialized(storePath: String): Boolean = core.initialized(storePath)

  /** Bootstrap the posting store AND the admitted sink from an
    * existing clip corpus (batch -1, admitted wholesale). Marker
    * written last, so a crashed initialize is detectable. */
  def initialize(
      corpus: DataFrame, idCol: String,
      storePath: String, sinkPath: String, p: Params): Unit =
    core.initialize(corpus, idCol, storePath, sinkPath, p.core)

  /** Admit one clip batch against the posting store + sink. */
  def applyBatch(
      batch: DataFrame, batchId: Long, idCol: String,
      storePath: String, sinkPath: String, p: Params): Unit =
    core.applyBatch(batch, batchId, idCol, storePath, sinkPath, p.core)

  /** This batch's admitted `(id, afp)` — empty when nothing admitted.
    * Existence-checked, not Try-swallowed. */
  def admittedOf(
      spark: org.apache.spark.sql.SparkSession, sinkPath: String,
      idCol: String, batchId: Long): DataFrame =
    core.admittedOf(spark, sinkPath, idCol, batchId)

  /** Wire a clip stream (`idCol`, `payload`) to perceptual
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
