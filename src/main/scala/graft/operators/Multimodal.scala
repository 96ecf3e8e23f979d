package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs as a
  * typed `mapPartitions` (the Scala analogue of `mapInPandas` batch
  * UDFs) so heavyweight codec state can be initialized once per
  * partition.
  *
  * The decode itself is a STUB: this container has no image/audio
  * codecs, so `decodeStub` derives deterministic fake metadata from the
  * bytes. The Spark-side plumbing — schema, batching, partition-level
  * execution, deterministic output — is real and tested; swapping in a
  * real codec changes only the function body marked below.
  */
object Multimodal {

  /** Extracted media features. `checksum` is the content address for
    * downstream exact dedup of media. */
  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Int,
      width: Int,
      height: Int,
      channels: Int,
      checksum: String
  )

  /** Attach a binary payload column. Real pipelines read binary from
    * parquet/`binaryFile`; the testdata has no media, so text bytes
    * stand in. */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).cast("binary").as("payload"))

  /** Per-partition decode: one codec init per partition, streaming over
    * rows (no per-row setup, no collect). */
  def decodeStub(payloads: DataFrame): Dataset[MediaFeatures] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])].mapPartitions {
      it =>
        // real codec/session initialization would happen HERE, once per
        // partition (cf. mapInPandas batch UDF pattern)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes0) =>
          val bytes = if (bytes0 == null) Array.empty[Byte] else bytes0
          // ---- STUB DECODE: deterministic fake metadata from bytes.
          // A real implementation would decode image/audio here.
          val b0  = if (bytes.length > 0) bytes(0) & 0xFF else 0
          val b1  = if (bytes.length > 1) bytes(1) & 0xFF else 0
          md.reset()
          val sum = md.digest(bytes).map("%02x".format(_)).mkString
          MediaFeatures(
            doc_id = id,
            byte_len = bytes.length,
            width = 1 + bytes.length % 640,
            height = 1 + (b0 * 256 + b1) % 480,
            channels = 3,
            checksum = sum)
        }
    }
  }

  /** Full stub pipeline over a text table standing in for media. */
  def features(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    decodeStub(withPayload(docs, idCol, textCol)).toDF()

  /** Resized media: stub decode -> scale to (outW, outH) -> stub
    * re-encode. `pixels` is the re-encoded payload (deterministic fake:
    * outW*outH*channels bytes sampled from the source by stride). */
  final case class Resized(
      doc_id: Long, out_width: Int, out_height: Int, out_bytes: Int, pixels: Array[Byte])

  /** Resize pipeline: same per-partition batch shape as [[decodeStub]].
    * The decode/rescale is STUBBED (no codecs in this container): the
    * output buffer is the right size and a deterministic function of
    * the input bytes (stride sampling), so schema, partitioning and
    * downstream content-addressing are real while only the pixel math
    * is fake. */
  def resizeStub(payloads: DataFrame, outW: Int, outH: Int, channels: Int = 3): Dataset[Resized] = {
    require(outW > 0 && outH > 0, "resize dims must be positive")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])].mapPartitions {
      it =>
        // real decoder/scaler init would happen HERE, once per partition
        val outLen = outW * outH * channels
        it.map { case (id, bytes0) =>
          val bytes = if (bytes0 == null) Array.empty[Byte] else bytes0
          val out = new Array[Byte](outLen)
          if (bytes.length > 0) {
            var i = 0
            while (i < outLen) {
              // stride-sample the source buffer (stand-in for bilinear)
              out(i) = bytes((i.toLong * bytes.length / outLen).toInt)
              i += 1
            }
          }
          Resized(id, outW, outH, outLen, out)
        }
    }
  }

  /** One sampled frame: byte window `[frame_offset, frame_offset +
    * frame_bytes)` of the payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame_offset: Int, frame_bytes: Int)

  /** Frame sampling over a video-like payload: emit one row per
    * fixed-size byte window (a stand-in for every-Nth-frame sampling;
    * a real decoder would seek timestamps instead of byte offsets).
    * Same per-partition batch-UDF shape as [[decodeStub]]: rows stream
    * through one iterator per partition, output fan-out is bounded by
    * payload size — no driver involvement, no collect. */
  def frameSample(payloads: DataFrame, frameBytes: Int = 256): Dataset[Frame] = {
    require(frameBytes > 0, "frameBytes must be positive")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])].mapPartitions {
      it =>
        // real frame decoder/seeker init would happen HERE, per partition
        it.flatMap { case (id, bytes0) =>
          val bytes = if (bytes0 == null) Array.empty[Byte] else bytes0
          val nFrames = (bytes.length + frameBytes - 1) / frameBytes
          (0 until nFrames).iterator.map { i =>
            val off = i * frameBytes
            Frame(id, i, off, math.min(frameBytes, bytes.length - off))
          }
        }
    }
  }
}
