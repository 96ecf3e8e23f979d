package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing AND real codec work: media payloads
  * travel as opaque `binary` columns with typed metadata; every decode
  * / feature-extraction pass runs as a typed `mapPartitions` (the
  * Scala analogue of `mapInPandas` batch UDFs) so codec state is
  * initialized once per partition, output fan-out stays bounded, and
  * nothing touches the driver.
  *
  * Most of this file is REAL codec work on JDK-native formats:
  * PNG encode/decode via `javax.imageio` (syntheticImages,
  * reencodeScaled, dHash and its oracle-replayable integer pixel
  * formula), WAV via `javax.sound.sampled` (syntheticAudio*,
  * reencodeAttenuated, VAD energy windows, the Haitsma–Kalker-style
  * delta-sign fingerprint), and a REAL RIFF/AVI mux/demux for video
  * (renderAvi/aviFrames with per-frame javax.imageio decode —
  * syntheticAviVideos, videoFrameHashes/videoFrameSet/
  * videoFrameDecode) — all exercised by oracle gates asserting
  * decoded pixel/sample content.
  *
  * Three functions are SPEC-ONLY plumbing stands-ins kept beside their
  * real counterparts (no gate measures them): `decodeStub` (fake
  * metadata derived deterministically from bytes — real path:
  * `decodeImage`), `resizeStub` (deterministic fake resample — real
  * path: `resizeImage`), and `frameSample` (byte-window sampling —
  * real path: `videoFrameDecode` over a demuxed container). They pin
  * the partition-batched plumbing shape — schema, streaming iterator,
  * bounded fan-out — for formats needing native libs (MP4/opus).
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

  /** Magic-byte MIME sniff over a binary payload — the routing key of
    * a multimodal ingest (a crawl's declared Content-Type lies often
    * enough that real pipelines route by the bytes): PNG/JPEG/GIF/BMP,
    * the RIFF containers (WAV/WEBP/AVI), ISO-BMFF (`ftyp` at byte 5 —
    * MP4/MOV family), Ogg, MP3 (ID3 or frame sync), PDF, ZIP, gzip;
    * anything else is `application/octet-stream`, NULL stays NULL.
    * Pure codegen'd Column over the hex of the first 16 bytes — no
    * UDF, no decode, scan-local. */
  def sniffMime(bin: Column): Column = {
    val hx = hex(substring(bin, 1, 16)) // byte k = hex chars 2k-1..2k
    val riffKind = substring(hx, 17, 8) // bytes 9-12: the RIFF format
    when(bin.isNull, lit(null))
      .when(hx.startsWith("89504E470D0A1A0A"), "image/png")
      .when(hx.startsWith("FFD8FF"), "image/jpeg")
      .when(hx.startsWith("47494638"), "image/gif")
      .when(hx.startsWith("424D"), "image/bmp")
      .when(hx.startsWith("52494646") && riffKind === "57415645", "audio/wav")
      .when(hx.startsWith("52494646") && riffKind === "57454250", "image/webp")
      .when(hx.startsWith("52494646") && riffKind === "41564920", "video/x-msvideo")
      .when(substring(hx, 9, 8) === "66747970", "video/mp4")
      .when(hx.startsWith("4F676753"), "application/ogg")
      .when(hx.startsWith("494433") || hx.startsWith("FFFB") ||
        hx.startsWith("FFF3") || hx.startsWith("FFF2"), "audio/mpeg")
      .when(hx.startsWith("255044462D"), "application/pdf")
      .when(hx.startsWith("504B0304"), "application/zip")
      .when(hx.startsWith("1F8B"), "application/gzip")
      .otherwise("application/octet-stream")
  }

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

  // ============================================================ real image codec (javax.imageio)
  //
  // The JDK ships PNG/JPEG codecs (javax.imageio) — no external
  // dependency, works headless. The decode below is REAL: gate images
  // are deterministic synthetic PNGs whose pixel bytes follow a pure
  // integer formula, PNG is lossless, so a correct decode reproduces
  // the formula bit-for-bit and a SQL oracle can verify position-
  // weighted pixel checksums without ever seeing a codec.

  /** Pixel byte `i` (row-major r,g,b interleave) of doc `docId`'s
    * synthetic image — the formula the DuckDB oracle recomputes. */
  def syntheticPixel(docId: Long, i: Int): Int =
    ((docId * 131 + i.toLong * 7 + 13) % 256).toInt

  /** Deterministic RGB PNG for `docId` at `w`×`h`. Encoded bytes are
    * JDK-encoder-specific (never asserted); decoded PIXELS are exact. */
  def syntheticPng(docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = (y * w + x) * 3
        img.setRGB(x, y,
          (syntheticPixel(docId, base) << 16) |
            (syntheticPixel(docId, base + 1) << 8) |
            syntheticPixel(docId, base + 2))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthetic PNG payloads from an id column: width `8 + id % 9`,
    * height `8 + id % 7` (SQL-predictable dims, every doc distinct).
    * Generation is scan-local mapPartitions — encoder setup once per
    * partition, no driver involvement, no collect. */
  def syntheticImages(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      System.setProperty("java.awt.headless", "true")
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache in executor dirs
      it.map { id =>
        (id, syntheticPng(id, (8 + id % 9).toInt, (8 + id % 7).toInt))
      }
    }.toDF("doc_id", "payload")
  }

  /** Really-decoded image features: `sum1`/`sum2` are position-weighted
    * checksums `Σ (i+1)·bᵢ` / `Σ (i+1)²·bᵢ` over the decoded row-major
    * RGB bytes (order-sensitive, exact integer — one flipped pixel
    * breaks both), `pixel_md5` the content address for media dedup. */
  final case class DecodedImage(
      doc_id: Long, width: Int, height: Int, channels: Int,
      n_bytes: Int, sum1: Long, sum2: Long, pixel_md5: String)

  /** Real PNG/JPEG decode via `javax.imageio`, same per-partition batch
    * shape as [[decodeStub]] (codec config once per partition, rows
    * stream). Fails loudly on an undecodable payload — media tables
    * carry a decodable contract; quarantine upstream like
    * [[graft.sources.TextTables]] if the corpus is dirty. */
  def decodeImage(payloads: DataFrame): Dataset[DecodedImage] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])].mapPartitions {
      it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"doc $id: payload is not a decodable image")
          val (w, h) = (img.getWidth, img.getHeight)
          val buf = rgbBytes(img, w, h)
          var (s1, s2, j) = (0L, 0L, 0)
          while (j < buf.length) {
            val v = buf(j) & 0xFF; val p = (j + 1).toLong
            s1 += p * v; s2 += p * p * v; j += 1
          }
          md.reset()
          DecodedImage(id, w, h, img.getColorModel.getNumComponents, buf.length,
            s1, s2, md.digest(buf).map("%02x".format(_)).mkString)
        }
    }
  }

  /** Packed sRGB ints for the whole image in ONE bulk `getRGB` call
    * (colorspace-normalized, raster-layout independent) — per-pixel
    * `getRGB(x,y)` repeats the colorspace conversion and bounds checks
    * per call and costs several× more at decode scale. */
  private def argbInts(img: java.awt.image.BufferedImage, w: Int, h: Int): Array[Int] =
    img.getRGB(0, 0, w, h, null, 0, w)

  /** Row-major RGB bytes from the bulk-read packed ints. */
  private def rgbBytes(img: java.awt.image.BufferedImage, w: Int, h: Int): Array[Byte] = {
    val ints = argbInts(img, w, h)
    val buf = new Array[Byte](w * h * 3)
    var (p, i) = (0, 0)
    while (p < ints.length) {
      val rgb = ints(p)
      buf(i) = ((rgb >> 16) & 0xFF).toByte
      buf(i + 1) = ((rgb >> 8) & 0xFF).toByte
      buf(i + 2) = (rgb & 0xFF).toByte
      i += 3; p += 1
    }
    buf
  }

  /** Real resize output; `pixels` is the resized row-major RGB buffer,
    * sums/md5 as in [[DecodedImage]]. */
  final case class ResizedImage(
      doc_id: Long, out_width: Int, out_height: Int, out_bytes: Int,
      sum1: Long, sum2: Long, pixels: Array[Byte])

  /** Real decode + nearest-neighbor resize with the FLOOR convention
    * `src_x = x·W div outW` (integer division) — deliberately hand-
    * rolled rather than Java2D's scaler so the sampling convention is
    * exact and SQL-recomputable; it still reads genuinely decoded
    * pixels. Bilinear would be a one-line swap (AffineTransformOp) at
    * the price of the cross-engine oracle. */
  def resizeImage(payloads: DataFrame, outW: Int, outH: Int): Dataset[ResizedImage] = {
    require(outW > 0 && outH > 0, "resize dims must be positive")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])].mapPartitions {
      it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"doc $id: payload is not a decodable image")
          val (w, h) = (img.getWidth, img.getHeight)
          val src = argbInts(img, w, h)
          val out = new Array[Byte](outW * outH * 3)
          var (y, i) = (0, 0)
          while (y < outH) {
            val sy = y * h / outH
            var x = 0
            while (x < outW) {
              val rgb = src(sy * w + x * w / outW)
              out(i) = ((rgb >> 16) & 0xFF).toByte
              out(i + 1) = ((rgb >> 8) & 0xFF).toByte
              out(i + 2) = (rgb & 0xFF).toByte
              i += 3; x += 1
            }
            y += 1
          }
          var (s1, s2, j) = (0L, 0L, 0)
          while (j < out.length) {
            val v = out(j) & 0xFF; val p = (j + 1).toLong
            s1 += p * v; s2 += p * p * v; j += 1
          }
          ResizedImage(id, outW, outH, out.length, s1, s2, out)
        }
    }
  }

  // ============================================================ perceptual near-dup (dHash)

  /** Per-image 64-bit difference hash. `dhash` is the packed bits,
    * `dhash_hex` the same value rendered row-byte by row-byte (grid
    * row y → byte `Σ_x bit(x,y)·2^x`, hex 2 chars per row, y
    * ascending) so any engine reproduces the string without signed-
    * 64-bit gymnastics. */
  final case class ImageDHash(doc_id: Long, dhash: Long, dhash_hex: String)

  /** dHash grid width/height: 9×8 luma samples → 8×8 = 64 gradient
    * bits. */
  private val (dhW, dhH) = (9, 8)

  /** Perceptual dHash [difference hash — the standard 64-bit
    * gradient fingerprint for image near-dup detection]: REAL decode,
    * nearest-neighbor FLOOR-convention downsample (`src = g·dim div
    * grid` — the [[resizeImage]] convention, so the whole hash is an
    * exact integer function of the decoded pixels that a SQL oracle
    * recomputes) to a 9×8 integer-luma grid (`(299r + 587g + 114b)
    * div 1000`, ITU-R BT.601 weights), bit `y·8 + x` set iff
    * `luma(x+1, y) > luma(x, y)`.
    *
    * Invariances this buys at 100 TB crawl scale: any lossless
    * re-encode hashes identically; an exact-factor nearest-neighbor
    * rescale hashes identically (floor-division composition:
    * `(g·(f·W)) div grid div f = (g·W) div grid`); lossy recompression
    * and mild resampling land within a small hamming radius — pair
    * via [[Dedup.hamming64Pairs]], the same exact-recall banding the
    * text SimHash path uses. Scan-local mapPartitions, codec config
    * once per partition, no shuffle. */
  def dHash(payloads: DataFrame): Dataset[ImageDHash] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])].mapPartitions {
      it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val (hash, hex) = dhashOf(id, bytes)
          ImageDHash(id, hash, hex)
        }
    }
  }

  /** Decode + dHash one encoded image — the per-frame unit [[dHash]]
    * and [[videoFrameHashes]] share. */
  private def dhashOf(id: Long, bytes: Array[Byte]): (Long, String) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"doc $id: payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val src = argbInts(img, w, h)
    val luma = new Array[Int](dhW * dhH)
    var gy = 0
    while (gy < dhH) {
      val sy = gy * h / dhH
      var gx = 0
      while (gx < dhW) {
        val rgb = src(sy * w + gx * w / dhW)
        luma(gy * dhW + gx) =
          (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
            114 * (rgb & 0xFF)) / 1000
        gx += 1
      }
      gy += 1
    }
    var hash = 0L
    val hex = new java.lang.StringBuilder(16)
    gy = 0
    while (gy < dhH) {
      var rowByte = 0
      var gx = 0
      while (gx < dhW - 1) {
        if (luma(gy * dhW + gx + 1) > luma(gy * dhW + gx)) {
          rowByte |= 1 << gx
          hash |= 1L << (gy * 8 + gx)
        }
        gx += 1
      }
      hex.append(Character.forDigit((rowByte >> 4) & 0xF, 16))
      hex.append(Character.forDigit(rowByte & 0xF, 16))
      gy += 1
    }
    (hash, hex.toString)
  }

  /** Integer-factor nearest-neighbor rescale + lossless PNG re-encode —
    * the synthetic "recompressed copy" generator for the near-dup gate
    * (floor-convention sampling, so the scaled copy's dHash equals the
    * original's exactly; see [[dHash]]). Emits `doc_id + idOffset` so a
    * corpus can union originals and copies. */
  def reencodeScaled(payloads: DataFrame, factor: Int, idOffset: Long): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])].mapPartitions {
      it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          (id + idOffset, scalePng(id, bytes, factor))
        }
    }.toDF("doc_id", "payload")
  }

  /** Decode → integer-factor NN upscale → lossless PNG re-encode of
    * one image — the per-frame unit [[reencodeScaled]] and
    * [[reencodeScaledVideo]] share. */
  private def scalePng(id: Long, bytes: Array[Byte], factor: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"doc $id: payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val src = argbInts(img, w, h)
    val out = new java.awt.image.BufferedImage(
      w * factor, h * factor, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h * factor) {
      var x = 0
      while (x < w * factor) {
        out.setRGB(x, y, src((y / factor) * w + x / factor) & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  // ============================================================ real audio codec (javax.sound.sampled)
  //
  // The JDK also ships a WAV codec — the audio twin of the PNG path
  // above: gate audio is deterministic synthetic PCM16 whose samples
  // follow a pure integer formula, WAV is lossless, so a correct
  // decode reproduces the formula bit-for-bit and a SQL oracle
  // verifies position-weighted sample checksums and per-window
  // energies without ever seeing a codec.

  /** Sample `i` of doc `docId`'s synthetic PCM16 signal — the formula
    * the DuckDB oracle recomputes. Full signed 16-bit range. */
  def syntheticSample(docId: Long, i: Int): Int =
    (((docId * 31 + i.toLong * 7 + 11) % 65536) - 32768).toInt

  /** Deterministic mono PCM16 WAV for `docId` with `n` samples at
    * 8 kHz, encoded by the REAL JDK WAV writer. */
  def syntheticWav(docId: Long, n: Int): Array[Byte] = {
    val raw = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = syntheticSample(docId, i)
      raw(i * 2) = (s & 0xFF).toByte            // little-endian PCM16
      raw(i * 2 + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Synthetic WAV payloads from an id column: `256 + id % 241`
    * samples (SQL-predictable, every doc distinct). Scan-local like
    * [[syntheticImages]]. */
  def syntheticAudio(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map(id => (id, syntheticWav(id, (256 + id % 241).toInt)))
    }.toDF("doc_id", "payload")
  }

  /** Really-decoded audio features: `sum1`/`sum2` are position-
    * weighted checksums `Σ (i+1)·sᵢ` / `Σ (i+1)²·sᵢ` over the decoded
    * PCM16 samples (order- and sign-sensitive, exact integer). */
  final case class DecodedAudio(
      doc_id: Long, n_samples: Long, sample_rate: Int, channels: Int,
      sum1: Long, sum2: Long)

  /** Real WAV decode via `javax.sound.sampled`, same per-partition
    * batch shape as [[decodeImage]]. Fails loudly on an undecodable
    * payload or a non-PCM16-mono stream (gate contract; transcode
    * upstream for other layouts). */
  def decodeAudio(payloads: DataFrame): Dataset[DecodedAudio] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])].mapPartitions {
      it =>
        it.map { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            !fmt.isBigEndian,
            s"doc $id: expected little-endian PCM16 mono, got $fmt")
          val raw = ais.readAllBytes()
          var (s1, s2) = (0L, 0L)
          var i = 0
          while (i * 2 + 1 < raw.length) {
            val s = ((raw(i * 2) & 0xFF) | (raw(i * 2 + 1) << 8)).toShort.toInt
            val p = (i + 1).toLong
            s1 += p * s; s2 += p * p * s
            i += 1
          }
          DecodedAudio(id, i.toLong, fmt.getSampleRate.toInt, fmt.getChannels, s1, s2)
        }
    }
  }

  /** Per-window audio energy over the decoded samples — the VAD /
    * silence-trim primitive: window w covers samples [w·size, (w+1)·
    * size) (short tail kept), `energy = Σ sᵢ²` within the window. */
  final case class AudioWindow(
      doc_id: Long, window_idx: Int, n: Int, energy: Long)

  /** Real decode + fixed-size energy windows, scan-local. */
  def audioEnergyWindows(payloads: DataFrame, windowSize: Int = 160): Dataset[AudioWindow] = {
    require(windowSize > 0, s"windowSize must be positive, got $windowSize")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])].mapPartitions {
      it =>
        it.flatMap { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            !fmt.isBigEndian,
            s"doc $id: expected little-endian PCM16 mono, got $fmt")
          val raw = ais.readAllBytes()
          val n = raw.length / 2
          val nWin = (n + windowSize - 1) / windowSize
          (0 until nWin).iterator.map { w =>
            val lo = w * windowSize
            val hi = math.min(lo + windowSize, n)
            var e = 0L
            var i = lo
            while (i < hi) {
              val s = ((raw(i * 2) & 0xFF) | (raw(i * 2 + 1) << 8)).toShort.toLong
              e += s * s
              i += 1
            }
            AudioWindow(id, w, hi - lo, e)
          }
        }
    }
  }

  // ===================================================== perceptual audio fingerprint
  //
  // The audio twin of [[dHash]]: a 64-bit SIGN-OF-ENERGY-DELTA
  // fingerprint in the spirit of Haitsma & Kalker's robust audio
  // fingerprint [ISMIR 2002 — sign of band-energy differences across
  // frames], simplified to the time domain: bit w is the sign of the
  // energy difference between consecutive fixed-size sample windows.
  // Amplitude attenuation scales every window energy by ~the same
  // factor, so the DIFFERENCE SIGNS survive re-encoding at a lower
  // level — the copies land within a small hamming radius and pair
  // via the same exact-recall banding the image path uses.

  /** Sample `i` of doc `docId`'s VARIED synthetic PCM16 signal. The
    * ramp formula of [[syntheticSample]] advances by 7 per sample —
    * near-linear over a whole clip, so every clip would carry the
    * same monotone energy profile and the fingerprint would not
    * discriminate. Here the doc id MULTIPLIES the quadratic phase
    * (an additive offset alone leaves the delta-sign pattern nearly
    * doc-independent — measured 14 distinct fingerprints per 50
    * docs), giving every doc its own sweep rate: 2000/2000 distinct
    * fingerprints, max 16-bit band bucket 9. Still an exact integer
    * formula a SQL oracle replays. */
  def syntheticSampleVaried(docId: Long, i: Int): Int =
    ((((docId + 17) * (i.toLong + 1) * (i.toLong + 2) + docId * 131 + 11) % 65536) - 32768).toInt

  /** PCM16 mono little-endian samples → WAV bytes via the REAL JDK
    * encoder. */
  private def pcm16Wav(samples: Array[Int]): Array[Byte] = {
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(i * 2) = (samples(i) & 0xFF).toByte
      raw(i * 2 + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Synthetic varied-signal WAV payloads from an id column —
    * [[syntheticAudio]]'s shape (`256 + id % 241` samples, real JDK
    * WAV encoder) over [[syntheticSampleVaried]]. */
  def syntheticAudioVaried(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (256 + id % 241).toInt
        (id, pcm16Wav(Array.tabulate(n)(i => syntheticSampleVaried(id, i))))
      }
    }.toDF("doc_id", "payload")
  }

  /** Decoded little-endian PCM16 mono samples of one WAV payload;
    * fails loudly on any other layout (gate contract — transcode
    * upstream). */
  private def pcm16Samples(id: Long, bytes: Array[Byte]): Array[Int] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian,
      s"doc $id: expected little-endian PCM16 mono, got $fmt")
    val raw = ais.readAllBytes()
    Array.tabulate(raw.length / 2) { i =>
      ((raw(i * 2) & 0xFF) | (raw(i * 2 + 1) << 8)).toShort.toInt
    }
  }

  /** Real decode → attenuate every sample by `1 << shift` (Java
    * truncating division — the DuckDB `//` convention, so the oracle
    * replays the copy's samples exactly) → re-encode with the real
    * WAV writer. The "turned-down re-encode" copy generator for the
    * audio near-dup gate, [[reencodeScaled]]'s twin. Emits `doc_id +
    * idOffset`. */
  def reencodeAttenuated(payloads: DataFrame, shift: Int, idOffset: Long): DataFrame = {
    require(shift >= 0 && shift < 16, s"shift must be in [0, 16), got $shift")
    val spark = payloads.sparkSession
    import spark.implicits._
    val div = 1 << shift
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])].mapPartitions {
      it =>
        it.map { case (id, bytes) =>
          (id + idOffset, pcm16Wav(pcm16Samples(id, bytes).map(_ / div)))
        }
    }.toDF("doc_id", "payload")
  }

  /** Per-clip 64-bit audio fingerprint. `afp` is the packed bits,
    * `afp_hex` byte b = bits `[8b, 8b+8)` rendered 2 lowercase hex
    * chars, b ascending — the [[ImageDHash]] rendering convention, so
    * any engine reproduces the string without signed-64-bit
    * gymnastics. */
  final case class AudioFp(doc_id: Long, afp: Long, afp_hex: String)

  /** Fingerprint window count: 65 energies → 64 delta-sign bits. */
  private val afpWindows = 65

  /** Perceptual audio fingerprint: REAL WAV decode, energies of the
    * first 65 `windowSize`-sample windows (`e_w = Σ s_i²` over
    * `[w·size, (w+1)·size)`, windows past the clip end count 0 —
    * fixed-duration front-of-clip coverage), bit `w` set iff
    * `e(w+1) > e(w)`. Entirely scan-local mapPartitions; pair via
    * [[Dedup.hamming64Pairs]]. An attenuated or losslessly
    * re-encoded copy scales all energies by ~one factor and keeps the
    * delta signs — near-dup copies land within a small hamming
    * radius, the Haitsma–Kalker robustness property in integer
    * arithmetic a SQL oracle recomputes exactly. */
  def audioFingerprint(payloads: DataFrame, windowSize: Int = 4): Dataset[AudioFp] = {
    require(windowSize > 0, s"windowSize must be positive, got $windowSize")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])].mapPartitions {
      it =>
        it.map { case (id, bytes) =>
          val s = pcm16Samples(id, bytes)
          val e = new Array[Long](afpWindows)
          var i = 0
          while (i < s.length) {
            val w = i / windowSize
            if (w < afpWindows) e(w) += s(i).toLong * s(i)
            i += 1
          }
          var fp = 0L
          val hex = new java.lang.StringBuilder(16)
          var b = 0
          while (b < 8) {
            var rowByte = 0
            var x = 0
            while (x < 8) {
              val w = b * 8 + x
              if (e(w + 1) > e(w)) { rowByte |= 1 << x; fp |= 1L << w }
              x += 1
            }
            hex.append(Character.forDigit((rowByte >> 4) & 0xF, 16))
            hex.append(Character.forDigit(rowByte & 0xF, 16))
            b += 1
          }
          AudioFp(id, fp, hex.toString)
        }
    }
  }

  // ===================================================== video (RIFF/AVI) near-dup
  //
  // Videos travel as one opaque binary column like every other media
  // payload. The REAL container path is RIFF/AVI ([[renderAvi]] /
  // [[aviFrames]]): a standards-shaped AVI with one video stream whose
  // frames are whole encoded images in `00dc` chunks — the MJPEG
  // layout, carried here with lossless PNG frames (fourcc `MPNG`) so
  // the decoded pixels stay an exact integer formula a SQL oracle
  // replays; a capture with real JPEG frames demuxes identically
  // (javax.imageio sniffs the frame codec). The parser is strict and
  // fail-loud: RIFF size, chunk bounds, word alignment, and the
  // header's declared frame counts (avih.dwTotalFrames,
  // strh.dwLength) must all agree with the chunks present.
  // [[demuxFrames]] dispatches on the RIFF magic, falling back to the
  // legacy length-prefixed container ([count:4BE][len:4BE][bytes]...)
  // for pre-demuxed keyframe streams.
  //
  // A video's signature is its DISTINCT frame-hash set; near-dup =
  // high set overlap, paired by shared-frame-hash blocking (the
  // winnow/MOSS pairing machinery — a frame hash is to a video what a
  // winnowed fingerprint is to a document).

  /** Pack encoded frames into the length-prefixed container. */
  def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 4 + frames.map(4 + _.length).sum
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(frames.length)
    frames.foreach { f => bb.putInt(f.length); bb.put(f) }
    bb.array()
  }

  /** Unpack a length-prefixed frame container; fails loudly on
    * truncation or a corrupt header. */
  def unpackFrames(id: Long, bytes: Array[Byte]): Seq[Array[Byte]] = {
    require(bytes != null && bytes.length >= 4,
      s"doc $id: payload is not a frame container (too short)")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    require(n >= 0 && n <= 1000000, s"doc $id: corrupt frame count $n")
    (0 until n).map { i =>
      require(bb.remaining >= 4, s"doc $id: truncated at frame $i header")
      val len = bb.getInt
      require(len >= 0 && bb.remaining >= len,
        s"doc $id: truncated at frame $i (declared $len, ${bb.remaining} left)")
      val f = new Array[Byte](len)
      bb.get(f)
      f
    }
  }

  // ------------------------------------------------------------ RIFF/AVI mux/demux

  /** Growable little-endian byte builder for the AVI writer. */
  private final class LeBuf(cap: Int) {
    private var arr = new Array[Byte](math.max(64, cap))
    private var len = 0
    def pos: Int = len
    private def ensure(n: Int): Unit =
      if (len + n > arr.length)
        arr = java.util.Arrays.copyOf(arr, math.max(arr.length * 2, len + n))
    def u8(v: Int): Unit = { ensure(1); arr(len) = v.toByte; len += 1 }
    def u16(v: Int): Unit = {
      ensure(2); arr(len) = v.toByte; arr(len + 1) = (v >> 8).toByte; len += 2
    }
    def u32(v: Long): Unit = {
      ensure(4)
      arr(len) = v.toByte; arr(len + 1) = (v >> 8).toByte
      arr(len + 2) = (v >> 16).toByte; arr(len + 3) = (v >> 24).toByte
      len += 4
    }
    def fourcc(s: String): Unit = {
      ensure(4); var i = 0
      while (i < 4) { arr(len + i) = s.charAt(i).toByte; i += 1 }
      len += 4
    }
    def bytes(b: Array[Byte]): Unit = {
      ensure(b.length); System.arraycopy(b, 0, arr, len, b.length); len += b.length
    }
    def patchU32(at: Int, v: Long): Unit = {
      arr(at) = v.toByte; arr(at + 1) = (v >> 8).toByte
      arr(at + 2) = (v >> 16).toByte; arr(at + 3) = (v >> 24).toByte
    }
    // big-endian writers for the ISO-BMFF (MP4) muxer — one buffer
    // class serves both container families
    def be16(v: Int): Unit = {
      ensure(2); arr(len) = (v >> 8).toByte; arr(len + 1) = v.toByte; len += 2
    }
    def be32(v: Long): Unit = {
      ensure(4)
      arr(len) = (v >> 24).toByte; arr(len + 1) = (v >> 16).toByte
      arr(len + 2) = (v >> 8).toByte; arr(len + 3) = v.toByte
      len += 4
    }
    def be64(v: Long): Unit = { be32(v >>> 32); be32(v & 0xFFFFFFFFL) }
    def patchBe32(at: Int, v: Long): Unit = {
      arr(at) = (v >> 24).toByte; arr(at + 1) = (v >> 16).toByte
      arr(at + 2) = (v >> 8).toByte; arr(at + 3) = v.toByte
    }
    def result: Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  /** Width/height from a PNG frame's IHDR (bytes 16..23, big-endian) —
    * used to stamp informational header dims on a rendered AVI; (0, 0)
    * for non-PNG frames (players derive dims from the frame codec). */
  private def pngDims(b: Array[Byte]): (Int, Int) =
    if (b != null && b.length >= 24 && (b(0) & 0xFF) == 0x89 &&
        b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
      def be32(p: Int) = ((b(p) & 0xFF) << 24) | ((b(p + 1) & 0xFF) << 16) |
        ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)
      (be32(16), be32(20))
    } else (0, 0)

  /** Render encoded frames as a REAL RIFF/AVI byte stream: `RIFF/AVI `
    * → `LIST hdrl` (`avih` main header + `LIST strl` with a `vids`
    * `strh` and a BITMAPINFOHEADER `strf`) → `LIST movi` with one
    * `00dc` chunk per frame (word-aligned) → an `idx1` keyframe index.
    * `handler` is the stream fourcc (`MPNG` for PNG frames, `MJPG`
    * for JPEG); header dims are the max frame dims ([[pngDims]], 0
    * when unknown). Deterministic: same frames → same bytes
    * ([[aviFrames]] ∘ renderAvi = id, CrawlFuzzSpec-pinned). */
  def renderAvi(
      frames: Seq[Array[Byte]], fps: Int = 10, handler: String = "MPNG"
  ): Array[Byte] = {
    require(fps > 0, s"fps must be positive, got $fps")
    require(handler.length == 4, s"handler must be a fourcc, got '$handler'")
    val dims = frames.map(pngDims)
    val width = if (dims.isEmpty) 0 else dims.map(_._1).max
    val height = if (dims.isEmpty) 0 else dims.map(_._2).max
    val maxLen = if (frames.isEmpty) 0 else frames.map(_.length).max
    val b = new LeBuf(64 + 256 + frames.map(f => 8 + f.length + (f.length & 1) + 16).sum)
    b.fourcc("RIFF"); val riffSizeAt = b.pos; b.u32(0); b.fourcc("AVI ")
    // LIST hdrl
    b.fourcc("LIST"); val hdrlSizeAt = b.pos; b.u32(0); b.fourcc("hdrl")
    b.fourcc("avih"); b.u32(56)
    b.u32(1000000L / fps) // dwMicroSecPerFrame
    b.u32(0)              // dwMaxBytesPerSec
    b.u32(0)              // dwPaddingGranularity
    b.u32(0x10)           // dwFlags = AVIF_HASINDEX
    b.u32(frames.length)  // dwTotalFrames
    b.u32(0)              // dwInitialFrames
    b.u32(1)              // dwStreams
    b.u32(maxLen)         // dwSuggestedBufferSize
    b.u32(width); b.u32(height)
    var r = 0; while (r < 4) { b.u32(0); r += 1 } // dwReserved
    // LIST strl
    b.fourcc("LIST"); val strlSizeAt = b.pos; b.u32(0); b.fourcc("strl")
    b.fourcc("strh"); b.u32(56)
    b.fourcc("vids"); b.fourcc(handler)
    b.u32(0)              // dwFlags
    b.u16(0); b.u16(0)    // wPriority, wLanguage
    b.u32(0)              // dwInitialFrames
    b.u32(1); b.u32(fps)  // dwScale / dwRate = frame rate
    b.u32(0)              // dwStart
    b.u32(frames.length)  // dwLength (in frames)
    b.u32(maxLen)         // dwSuggestedBufferSize
    b.u32(0xFFFFFFFFL)    // dwQuality = -1 (default)
    b.u32(0)              // dwSampleSize (0 = one sample per chunk)
    b.u16(0); b.u16(0); b.u16(width); b.u16(height) // rcFrame
    b.fourcc("strf"); b.u32(40)
    b.u32(40)             // biSize
    b.u32(width); b.u32(height)
    b.u16(1); b.u16(24)   // biPlanes, biBitCount
    b.fourcc(handler)     // biCompression
    b.u32(0); b.u32(0); b.u32(0); b.u32(0); b.u32(0)
    b.patchU32(strlSizeAt, b.pos - strlSizeAt - 4)
    b.patchU32(hdrlSizeAt, b.pos - hdrlSizeAt - 4)
    // LIST movi
    b.fourcc("LIST"); val moviSizeAt = b.pos; b.u32(0)
    val moviStart = b.pos // idx1 offsets are relative to the 'movi' fourcc
    b.fourcc("movi")
    val offsets = new Array[Long](frames.length)
    var i = 0
    while (i < frames.length) {
      offsets(i) = b.pos - moviStart
      b.fourcc("00dc"); b.u32(frames(i).length); b.bytes(frames(i))
      if ((frames(i).length & 1) == 1) b.u8(0) // word alignment
      i += 1
    }
    b.patchU32(moviSizeAt, b.pos - moviSizeAt - 4)
    // idx1
    b.fourcc("idx1"); b.u32(16L * frames.length)
    i = 0
    while (i < frames.length) {
      b.fourcc("00dc"); b.u32(0x10) // AVIIF_KEYFRAME
      b.u32(offsets(i)); b.u32(frames(i).length)
      i += 1
    }
    b.patchU32(riffSizeAt, b.pos - riffSizeAt - 4)
    b.result
  }

  /** Render an A/V RIFF/AVI byte stream: [[renderAvi]]'s layout plus
    * an interleaved PCM16-mono soundtrack as a second stream —
    * `LIST hdrl` carries TWO `strl` lists (`vids` then `auds` with a
    * 16-byte WAVEFORMAT `strf`), and `LIST movi` interleaves each
    * frame's `00dc` chunk with its `01wb` audio slice (samples split
    * evenly across frames, remainder on the earliest frames — the
    * deterministic interleave a demuxer must reassemble in capture
    * order). `recGroups = true` wraps each frame's 00dc+01wb pair in
    * a `LIST rec ` group (the CD-ROM interleave layout readers must
    * recurse into). Deterministic: same inputs → same bytes
    * ([[aviDemux]] ∘ renderAviAv = id, AviSpec-pinned). */
  def renderAviAv(
      frames: Seq[Array[Byte]], audioSamples: Array[Int],
      fps: Int = 10, handler: String = "MPNG", sampleRate: Int = 8000,
      recGroups: Boolean = false
  ): Array[Byte] = {
    require(fps > 0, s"fps must be positive, got $fps")
    require(sampleRate > 0, s"sampleRate must be positive, got $sampleRate")
    require(handler.length == 4, s"handler must be a fourcc, got '$handler'")
    val dims = frames.map(pngDims)
    val width = if (dims.isEmpty) 0 else dims.map(_._1).max
    val height = if (dims.isEmpty) 0 else dims.map(_._2).max
    val maxLen = if (frames.isEmpty) 0 else frames.map(_.length).max
    val nSamples = audioSamples.length
    // per-frame audio slice bounds: base + 1 extra for the first
    // (nSamples mod nf) frames; one chunk carrying everything when the
    // container has no video frames
    val nf = frames.length
    val sliceAt: Array[Int] =
      if (nf == 0) Array(0, nSamples)
      else {
        val base = nSamples / nf; val extra = nSamples % nf
        val at = new Array[Int](nf + 1)
        var i = 0
        while (i < nf) { at(i + 1) = at(i) + base + (if (i < extra) 1 else 0); i += 1 }
        at
      }
    val b = new LeBuf(512 + frames.map(f => 24 + f.length + (f.length & 1) + 32).sum +
      nSamples * 2 + 16 * (nf + 2))
    b.fourcc("RIFF"); val riffSizeAt = b.pos; b.u32(0); b.fourcc("AVI ")
    // LIST hdrl
    b.fourcc("LIST"); val hdrlSizeAt = b.pos; b.u32(0); b.fourcc("hdrl")
    b.fourcc("avih"); b.u32(56)
    b.u32(1000000L / fps)
    b.u32(0); b.u32(0)
    b.u32(0x10)           // dwFlags = AVIF_HASINDEX
    b.u32(frames.length)  // dwTotalFrames (video)
    b.u32(0)
    b.u32(2)              // dwStreams: vids + auds
    b.u32(maxLen)
    b.u32(width); b.u32(height)
    var r = 0; while (r < 4) { b.u32(0); r += 1 }
    // strl 0: vids (renderAvi's headers verbatim)
    b.fourcc("LIST"); val strlSizeAt = b.pos; b.u32(0); b.fourcc("strl")
    b.fourcc("strh"); b.u32(56)
    b.fourcc("vids"); b.fourcc(handler)
    b.u32(0); b.u16(0); b.u16(0); b.u32(0)
    b.u32(1); b.u32(fps)
    b.u32(0)
    b.u32(frames.length)
    b.u32(maxLen)
    b.u32(0xFFFFFFFFL)
    b.u32(0)
    b.u16(0); b.u16(0); b.u16(width); b.u16(height)
    b.fourcc("strf"); b.u32(40)
    b.u32(40); b.u32(width); b.u32(height)
    b.u16(1); b.u16(24); b.fourcc(handler)
    b.u32(0); b.u32(0); b.u32(0); b.u32(0); b.u32(0)
    b.patchU32(strlSizeAt, b.pos - strlSizeAt - 4)
    // strl 1: auds, PCM16 mono (WAVEFORMAT strf, handler 0)
    b.fourcc("LIST"); val strl2SizeAt = b.pos; b.u32(0); b.fourcc("strl")
    b.fourcc("strh"); b.u32(56)
    b.fourcc("auds"); b.u32(0) // fccHandler 0 = raw PCM
    b.u32(0); b.u16(0); b.u16(0); b.u32(0)
    b.u32(1); b.u32(sampleRate) // dwScale / dwRate = sample rate
    b.u32(0)
    b.u32(nSamples)       // dwLength in samples
    b.u32(nSamples * 2L)  // dwSuggestedBufferSize
    b.u32(0xFFFFFFFFL)
    b.u32(2)              // dwSampleSize = nBlockAlign
    b.u16(0); b.u16(0); b.u16(0); b.u16(0)
    b.fourcc("strf"); b.u32(16)
    b.u16(1)              // wFormatTag = PCM
    b.u16(1)              // nChannels
    b.u32(sampleRate)
    b.u32(sampleRate * 2L) // nAvgBytesPerSec
    b.u16(2)              // nBlockAlign
    b.u16(16)             // wBitsPerSample
    b.patchU32(strl2SizeAt, b.pos - strl2SizeAt - 4)
    b.patchU32(hdrlSizeAt, b.pos - hdrlSizeAt - 4)
    // LIST movi: interleaved 00dc / 01wb (optionally inside rec groups)
    b.fourcc("LIST"); val moviSizeAt = b.pos; b.u32(0)
    val moviStart = b.pos
    b.fourcc("movi")
    val idx = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    def audioChunk(slice: Int): Unit = {
      val (lo, hi) = (sliceAt(slice), sliceAt(slice + 1))
      if (hi > lo) {
        idx += (("01wb", b.pos - moviStart, (hi - lo) * 2L))
        b.fourcc("01wb"); b.u32((hi - lo) * 2L)
        var i = lo
        while (i < hi) { b.u16(audioSamples(i) & 0xFFFF); i += 1 }
      }
    }
    var i = 0
    while (i < nf) {
      val recSizeAt = if (recGroups) {
        b.fourcc("LIST"); val at = b.pos; b.u32(0); b.fourcc("rec "); at
      } else -1
      idx += (("00dc", b.pos - moviStart, frames(i).length.toLong))
      b.fourcc("00dc"); b.u32(frames(i).length); b.bytes(frames(i))
      if ((frames(i).length & 1) == 1) b.u8(0)
      audioChunk(i)
      if (recGroups) b.patchU32(recSizeAt, b.pos - recSizeAt - 4)
      i += 1
    }
    if (nf == 0) audioChunk(0)
    b.patchU32(moviSizeAt, b.pos - moviSizeAt - 4)
    // idx1 over every data chunk in capture order
    b.fourcc("idx1"); b.u32(16L * idx.length)
    idx.foreach { case (ck, off, len) =>
      b.fourcc(ck); b.u32(if (ck == "00dc") 0x10 else 0)
      b.u32(off); b.u32(len)
    }
    b.patchU32(riffSizeAt, b.pos - riffSizeAt - 4)
    b.result
  }

  /** Is this payload a RIFF/WAVE file? (magic at 0 and form at 8) */
  def isWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Is this payload a RIFF/AVI capture? (magic at 0 and form at 8) */
  def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  /** The interleaved PCM soundtrack of an A/V container: format fields
    * from the `auds` stream's WAVEFORMAT `strf`, payload the
    * concatenated `NNwb` chunk bytes in capture order. */
  final case class AviAudioStream(
      sample_rate: Int, channels: Int, bits: Int, block_align: Int,
      pcm: Array[Byte])

  /** One demuxed RIFF/AVI container: video frames in capture order
    * plus the soundtrack when an `auds` stream is present. */
  final case class AviContent(
      frames: Seq[Array[Byte]], audio: Option[AviAudioStream])

  /** Demux a RIFF/AVI byte stream — video frames AND the interleaved
    * audio stream — walking `LIST` chunks recursively (`hdrl`,
    * `strl`, `movi`, and `rec ` groupings inside movi). Streams are
    * identified by `strl` order (stream N's movi chunks are `NNdc`/
    * `NNdb` for video, `NNwb` for audio); other stream types are
    * skipped. STRICT: the RIFF size must cover the payload exactly,
    * every chunk must lie inside its parent, odd chunks must be
    * pad-aligned, the video frame count must equal BOTH declared
    * counts (`avih.dwTotalFrames`, the `vids` stream's
    * `strh.dwLength`), and the audio byte count must equal the `auds`
    * stream's declared `dwLength · nBlockAlign` — a truncated or
    * corrupted capture raises, it never silently yields less media. */
  def aviDemux(id: Long, bytes: Array[Byte]): AviContent = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"doc $id: AVI parse: $msg")
    if (!isAvi(bytes)) fail("not a RIFF/AVI payload")
    def u32(p: Int): Long =
      (bytes(p) & 0xFFL) | ((bytes(p + 1) & 0xFFL) << 8) |
        ((bytes(p + 2) & 0xFFL) << 16) | ((bytes(p + 3) & 0xFFL) << 24)
    def u16le(p: Int): Int = (bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8)
    def cc(p: Int): String =
      new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
    val riffSize = u32(4)
    if (riffSize + 8 != bytes.length)
      fail(s"RIFF declares ${riffSize + 8} bytes, payload has ${bytes.length}")
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val audioBytes = new java.io.ByteArrayOutputStream()
    val streamTypes = scala.collection.mutable.ArrayBuffer.empty[String]
    var declaredAvih = -1L
    var declaredVids = -1L
    var declaredAuds = -1L
    var vidsIdx = -1
    var audsIdx = -1
    var lastStrh = ""
    // (channels, sample_rate, block_align, bits) from the auds strf
    var audioFmt: Option[(Int, Int, Int, Int)] = None
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off < end) {
        if (off + 8 > end) fail(s"truncated chunk header at byte $off")
        val ckid = cc(off)
        val size = u32(off + 4)
        val dataStart = off + 8
        if (dataStart + size > end)
          fail(s"chunk '$ckid' at byte $off runs past its parent " +
            s"(declares $size, ${end - dataStart} available)")
        val dataEnd = dataStart + size.toInt
        ckid match {
          case "LIST" =>
            if (size < 4) fail(s"LIST at byte $off shorter than its type")
            walk(dataStart + 4, dataEnd)
          case "avih" =>
            if (size < 24) fail(s"avih declares $size bytes, need >= 24")
            declaredAvih = u32(dataStart + 16) // dwTotalFrames
          case "strh" =>
            if (size < 36) fail(s"strh declares $size bytes, need >= 36")
            val st = cc(dataStart)
            lastStrh = st
            val idx = streamTypes.length
            streamTypes += st
            if (st == "vids") {
              if (vidsIdx >= 0) fail("multiple vids streams")
              vidsIdx = idx
              declaredVids = u32(dataStart + 32) // dwLength (frames)
            } else if (st == "auds") {
              if (audsIdx >= 0) fail("multiple auds streams")
              audsIdx = idx
              declaredAuds = u32(dataStart + 32) // dwLength (samples)
            }
          case "strf" if lastStrh == "auds" =>
            if (size < 16) fail(s"auds strf declares $size bytes, need >= 16 " +
              "(WAVEFORMAT)")
            audioFmt = Some((u16le(dataStart + 2), u32(dataStart + 4).toInt,
              u16le(dataStart + 12), u16le(dataStart + 14)))
          case _
            if ckid.length == 4 && ckid(0).isDigit && ckid(1).isDigit =>
            // a movi data chunk: `NN` names the strl-order stream.
            // Files with a header use the stream table; a headerless
            // RIFF (no strh anywhere before movi) keeps the legacy
            // stream-00-is-video reading.
            val sn = (ckid(0) - '0') * 10 + (ckid(1) - '0')
            val suffix = ckid.substring(2)
            val isVideo =
              if (streamTypes.isEmpty) sn == 0 && (suffix == "dc" || suffix == "db")
              else sn == vidsIdx && (suffix == "dc" || suffix == "db")
            val isAudio = sn == audsIdx && suffix == "wb"
            if (isVideo)
              frames += java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
            else if (isAudio)
              audioBytes.write(bytes, dataStart, dataEnd - dataStart)
          case _ => () // other streams / idx1 / junk chunks: skip
        }
        off = dataEnd + (size & 1).toInt // word alignment
      }
      if (off != end) fail(s"chunk walk overran parent end $end at $off")
    }
    walk(12, bytes.length)
    if (declaredAvih >= 0 && declaredAvih != frames.length)
      fail(s"avih declares $declaredAvih frames, movi carries ${frames.length}")
    if (declaredVids >= 0 && declaredVids != frames.length)
      fail(s"strh declares $declaredVids frames, movi carries ${frames.length}")
    val audio =
      if (audsIdx < 0) None
      else {
        val (ch, rate, blockAlign, bits) = audioFmt.getOrElse(
          fail("auds stream has no strf (WAVEFORMAT) header"))
        if (blockAlign <= 0) fail(s"auds strf nBlockAlign $blockAlign")
        val got = audioBytes.size().toLong
        if (declaredAuds >= 0 && declaredAuds * blockAlign != got)
          fail(s"auds strh declares $declaredAuds samples " +
            s"(${declaredAuds * blockAlign} bytes at block $blockAlign), " +
            s"movi carries $got bytes")
        Some(AviAudioStream(rate, ch, bits, blockAlign, audioBytes.toByteArray))
      }
    AviContent(frames.toSeq, audio)
  }

  /** Demux a RIFF/AVI byte stream to its video frames — the video
    * projection of [[aviDemux]] (same strict walker; the soundtrack,
    * when present, is validated and dropped). */
  def aviFrames(id: Long, bytes: Array[Byte]): Seq[Array[Byte]] =
    aviDemux(id, bytes).frames

  /** The soundtrack of an A/V container re-wrapped as a standalone
    * WAV via the real JDK encoder — the bridge from [[aviDemux]] into
    * every existing audio pass ([[decodeAudio]],
    * [[audioEnergyWindows]], [[audioFingerprint]], audio dedup): one
    * real capture can now feed video near-dup AND audio near-dup.
    * Fails loud when the container has no audio or a non-PCM16-mono
    * layout (the [[decodeAudio]] gate contract). */
  def aviAudioWav(id: Long, bytes: Array[Byte]): Array[Byte] =
    aviAudioWavOf(id, aviDemux(id, bytes))

  /** [[aviAudioWav]] over an ALREADY-demuxed container — so a
    * consumer needing both streams ([[avContentChecksums]]) pays one
    * demux, not two. */
  private def aviAudioWavOf(id: Long, content: AviContent): Array[Byte] = {
    val a = content.audio.getOrElse(throw new IllegalArgumentException(
      s"doc $id: AVI has no audio stream"))
    require(a.bits == 16 && a.channels == 1,
      s"doc $id: expected PCM16 mono soundtrack, got ${a.bits}-bit " +
        s"${a.channels}-channel")
    pcmLeToWav(a.pcm, a.sample_rate)
  }

  /** Little-endian mono PCM16 → standalone WAV via the real JDK
    * encoder — the shared tail of both containers' audio bridges. */
  private def pcmLeToWav(pcm: Array[Byte], sampleRate: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** `(doc_id, payload)` → `(doc_id, payload)` with the payload
    * re-wrapped from an A/V container to its soundtrack WAV —
    * scan-local, the admission shape audio dedup consumes. */
  def extractAviAudio(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, b) => (id, aviAudioWav(id, b)) })
      .toDF("doc_id", "payload")
  }

  /** Container dispatch: RIFF/AVI payloads demux via [[aviFrames]],
    * ISO-BMFF (MP4) via [[mp4Frames]], anything else takes the legacy
    * length-prefixed path ([[unpackFrames]]). Every downstream video
    * pass ([[videoFrameHashes]], [[videoFrameSet]],
    * [[videoFrameDecode]], [[reencodeScaledVideo]]) reads through
    * this, so a corpus can mix all three containers. */
  def demuxFrames(id: Long, bytes: Array[Byte]): Seq[Array[Byte]] =
    if (isAvi(bytes)) aviFrames(id, bytes)
    else if (isMp4(bytes)) mp4Frames(id, bytes)
    else if (isWebm(bytes)) webmFrames(id, bytes)
    else unpackFrames(id, bytes)

  // ------------------------------------------------------------ ISO-BMFF (MP4) mux/demux

  /** Is this payload an ISO-BMFF container? (an `ftyp` box first) */
  def isMp4(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  /** Render a minimal ISO-BMFF (MP4) A/V container: `ftyp` + one
    * interleaved `mdat` + `moov` with two tracks — video samples
    * stored verbatim under a `png ` VisualSampleEntry (one sample per
    * chunk), audio as big-endian PCM16 mono under the QuickTime
    * `twos` AudioSampleEntry (2 bytes per sample, chunked per video
    * frame like [[renderAviAv]]'s interleave). The sample tables are
    * the real thing: `stts` (uniform deltas), `stsc`
    * (run-compressed samples-per-chunk), `stsz` (per-sample video
    * sizes; constant 2 for audio), and `stco` — or `co64` when
    * `useCo64` (the 64-bit offset form a >4 GiB capture needs; both
    * paths exercise the demuxer). Deterministic byte-for-byte. */
  def renderMp4(
      frames: Seq[Array[Byte]], audioSamples: Array[Int],
      fps: Int = 10, sampleRate: Int = 8000, useCo64: Boolean = false
  ): Array[Byte] = {
    require(fps > 0, s"fps must be positive, got $fps")
    require(sampleRate > 0, s"sampleRate must be positive, got $sampleRate")
    val nf = frames.length
    val nSamples = audioSamples.length
    // per-frame audio slice bounds (renderAviAv's interleave rule)
    val sliceAt: Array[Int] =
      if (nf == 0) Array(0, nSamples)
      else {
        val base = nSamples / nf; val extra = nSamples % nf
        val at = new Array[Int](nf + 1)
        var i = 0
        while (i < nf) { at(i + 1) = at(i) + base + (if (i < extra) 1 else 0); i += 1 }
        at
      }
    val b = new LeBuf(1024 + frames.map(_.length + 64).sum + nSamples * 2)
    def box(cc: String)(body: => Unit): Unit = {
      val at = b.pos; b.be32(0); b.fourcc(cc); body; b.patchBe32(at, b.pos - at)
    }
    // ftyp
    box("ftyp") { b.fourcc("isom"); b.be32(0x200); b.fourcc("isom") }
    // mdat: interleaved video sample / audio chunk, absolute offsets
    val videoOff = new Array[Long](nf)
    val audioChunks = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)] // (offset, nSamples)
    box("mdat") {
      def audioChunk(slice: Int): Unit = {
        val (lo, hi) = (sliceAt(slice), sliceAt(slice + 1))
        if (hi > lo) {
          audioChunks += ((b.pos.toLong, hi - lo))
          var i = lo
          while (i < hi) { b.be16(audioSamples(i) & 0xFFFF); i += 1 }
        }
      }
      var i = 0
      while (i < nf) {
        videoOff(i) = b.pos.toLong
        b.bytes(frames(i))
        audioChunk(i)
        i += 1
      }
      if (nf == 0) audioChunk(0)
    }
    val dims = frames.map(pngDims)
    val width = if (dims.isEmpty) 0 else dims.map(_._1).max
    val height = if (dims.isEmpty) 0 else dims.map(_._2).max
    def matrix(): Unit = {
      b.be32(0x10000); b.be32(0); b.be32(0)
      b.be32(0); b.be32(0x10000); b.be32(0)
      b.be32(0); b.be32(0); b.be32(0x40000000)
    }
    def tkhd(trackId: Int, dur: Long, volume: Int, w: Int, h: Int): Unit =
      box("tkhd") {
        b.be32(7) // version 0, flags: enabled | in movie | in preview
        b.be32(0); b.be32(0) // creation, modification
        b.be32(trackId); b.be32(0); b.be32(dur)
        b.be32(0); b.be32(0) // reserved
        b.be16(0); b.be16(0); b.be16(volume); b.be16(0)
        matrix()
        b.be32(w.toLong << 16); b.be32(h.toLong << 16)
      }
    def mdhd(timescale: Long, dur: Long): Unit =
      box("mdhd") {
        b.be32(0); b.be32(0); b.be32(0)
        b.be32(timescale); b.be32(dur)
        b.be16(0x55C4); b.be16(0) // language 'und'
      }
    def hdlr(handler: String): Unit =
      box("hdlr") {
        b.be32(0); b.be32(0); b.fourcc(handler)
        b.be32(0); b.be32(0); b.be32(0); b.u8(0) // empty name
      }
    def dinf(): Unit =
      box("dinf") { box("dref") { b.be32(0); b.be32(1)
        box("url ") { b.be32(1) } } } // flag 1: self-contained
    def stts(count: Long): Unit =
      box("stts") {
        b.be32(0)
        if (count == 0) b.be32(0)
        else { b.be32(1); b.be32(count); b.be32(1) }
      }
    def stsc(runs: Seq[(Long, Long)]): Unit = // (first_chunk, samples_per_chunk)
      box("stsc") {
        b.be32(0); b.be32(runs.length)
        runs.foreach { case (fc, spc) => b.be32(fc); b.be32(spc); b.be32(1) }
      }
    def stco(offs: Seq[Long]): Unit =
      if (useCo64) box("co64") { b.be32(0); b.be32(offs.length); offs.foreach(b.be64) }
      else box("stco") { b.be32(0); b.be32(offs.length); offs.foreach(b.be32) }
    // run-compress the audio samples-per-chunk sequence into stsc rows
    val audioRuns: Seq[(Long, Long)] = {
      val spcs = audioChunks.map(_._2)
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var i = 0
      while (i < spcs.length) {
        if (runs.isEmpty || runs.last._2 != spcs(i)) runs += (((i + 1).toLong, spcs(i).toLong))
        i += 1
      }
      runs.toSeq
    }
    box("moov") {
      box("mvhd") {
        b.be32(0); b.be32(0); b.be32(0)
        b.be32(1000); b.be32(if (fps > 0) nf * 1000L / fps else 0L)
        b.be32(0x10000); b.be16(0x100); b.be16(0)
        b.be32(0); b.be32(0)
        matrix()
        var i = 0; while (i < 6) { b.be32(0); i += 1 } // pre_defined
        b.be32(3) // next_track_ID
      }
      // video trak
      box("trak") {
        // tkhd duration is expressed in the MOVIE timescale (mvhd: 1000),
        // not the media timescale — nf frames at `fps` = nf*1000/fps ticks.
        tkhd(1, if (fps > 0) nf * 1000L / fps else 0L, volume = 0, width, height)
        box("mdia") {
          mdhd(fps.toLong, nf.toLong) // timescale fps, delta 1 per frame
          hdlr("vide")
          box("minf") {
            box("vmhd") { b.be32(1); b.be16(0); b.be16(0); b.be16(0); b.be16(0) }
            dinf()
            box("stbl") {
              box("stsd") {
                b.be32(0); b.be32(1)
                box("png ") { // VisualSampleEntry
                  b.be32(0); b.be16(0) // 6 reserved bytes
                  b.be16(1) // data_reference_index
                  b.be16(0); b.be16(0)
                  b.be32(0); b.be32(0); b.be32(0)
                  b.be16(width); b.be16(height)
                  b.be32(0x00480000); b.be32(0x00480000) // 72 dpi
                  b.be32(0)
                  b.be16(1) // frame_count
                  var i = 0; while (i < 32) { b.u8(0); i += 1 } // compressorname
                  b.be16(24); b.be16(0xFFFF)
                }
              }
              stts(nf.toLong)
              stsc(if (nf == 0) Seq.empty else Seq((1L, 1L)))
              box("stsz") {
                b.be32(0); b.be32(0) // per-sample sizes follow
                b.be32(nf); frames.foreach(f => b.be32(f.length.toLong))
              }
              stco(videoOff.toSeq)
            }
          }
        }
      }
      // audio trak
      box("trak") {
        // movie-timescale duration, same contract as the video tkhd above
        tkhd(2, if (sampleRate > 0) nSamples * 1000L / sampleRate else 0L,
          volume = 0x100, 0, 0)
        box("mdia") {
          mdhd(sampleRate.toLong, nSamples.toLong)
          hdlr("soun")
          box("minf") {
            box("smhd") { b.be32(0); b.be16(0); b.be16(0) }
            dinf()
            box("stbl") {
              box("stsd") {
                b.be32(0); b.be32(1)
                box("twos") { // AudioSampleEntry: PCM16 big-endian
                  b.be32(0); b.be16(0) // 6 reserved bytes
                  b.be16(1) // data_reference_index
                  b.be16(0); b.be16(0); b.be32(0) // version, revision, vendor
                  b.be16(1)  // channelcount
                  b.be16(16) // samplesize
                  b.be16(0); b.be16(0)
                  b.be32(sampleRate.toLong << 16) // 16.16 rate
                }
              }
              stts(nSamples.toLong)
              stsc(audioRuns)
              box("stsz") { b.be32(0); b.be32(2); b.be32(nSamples.toLong) }
              stco(audioChunks.map(_._1).toSeq)
            }
          }
        }
      }
    }
    b.result
  }

  /** One demuxed MP4 track: sample-table-reconstructed samples in
    * file order plus the audio format fields when the track is
    * sound. */
  final case class Mp4AudioFmt(channels: Int, bits: Int, sample_rate: Int)
  final case class Mp4Track(
      track_id: Long, handler: String, codec: String, timescale: Long,
      audio: Option[Mp4AudioFmt], samples: Seq[Array[Byte]])

  /** One demuxed ISO-BMFF container. */
  final case class Mp4Content(tracks: Seq[Mp4Track])

  /** Demux an ISO-BMFF (MP4) byte stream by walking its box tree and
    * reconstructing every track's samples from the sample tables
    * (`stsc` run expansion × `stco`/`co64` chunk offsets × `stsz`
    * sizes). STRICT, the [[aviDemux]] discipline: boxes must tile
    * their parent exactly (64-bit `largesize` honored, size-0
    * to-end boxes only at top level), `ftyp` must lead, exactly one
    * `moov`, `stts` totals must equal the `stsz` count, `stsc` runs
    * must start at chunk 1 and strictly increase, the expanded
    * chunk/sample map must consume EVERY declared sample and chunk,
    * and every reconstructed sample must lie wholly inside an `mdat`
    * payload — a truncated or corrupted capture raises with the doc
    * id, it never silently yields less media. */
  def mp4Demux(id: Long, bytes: Array[Byte]): Mp4Content = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"doc $id: MP4 parse: $msg")
    if (!isMp4(bytes)) fail("not an ISO-BMFF payload (no leading ftyp)")
    def be16(p: Int): Int = ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF)
    def be32(p: Int): Long =
      ((bytes(p) & 0xFFL) << 24) | ((bytes(p + 1) & 0xFFL) << 16) |
        ((bytes(p + 2) & 0xFFL) << 8) | (bytes(p + 3) & 0xFFL)
    def be64(p: Int): Long = (be32(p) << 32) | be32(p + 4)
    def cc(p: Int): String =
      new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // (type, payloadStart, payloadEnd) triples tiling [start, end)
    def boxesIn(start: Int, end: Int, topLevel: Boolean): Seq[(String, Int, Int)] = {
      val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
      var off = start
      while (off < end) {
        if (off + 8 > end) fail(s"truncated box header at byte $off")
        var size = be32(off); val t = cc(off + 4); var hdr = 8
        if (size == 1) {
          if (off + 16 > end) fail(s"truncated largesize header at byte $off")
          size = be64(off + 8); hdr = 16
        } else if (size == 0) {
          if (!topLevel) fail(s"size-0 (to-end) box '$t' below top level at byte $off")
          size = (end - off).toLong
        }
        if (size < hdr) fail(s"box '$t' at byte $off declares size $size < header $hdr")
        if (off + size > end)
          fail(s"box '$t' at byte $off runs past its parent " +
            s"(declares $size, ${end - off} available)")
        acc += ((t, off + hdr, off + size.toInt))
        off += size.toInt
      }
      acc.toSeq
    }
    val top = boxesIn(0, bytes.length, topLevel = true)
    if (top.head._1 != "ftyp") fail(s"first box must be ftyp, got '${top.head._1}'")
    val mdats = top.collect { case ("mdat", s, e) => (s, e) }
    val moovs = top.collect { case ("moov", s, e) => (s, e) }
    if (moovs.length != 1) fail(s"expected exactly one moov, got ${moovs.length}")
    val moovKids = boxesIn(moovs.head._1, moovs.head._2, topLevel = false)
    val tracks = moovKids.collect { case ("trak", ts, te) =>
      val trakKids = boxesIn(ts, te, topLevel = false)
      def one(kids: Seq[(String, Int, Int)], t: String, where: String): (Int, Int) =
        kids.collect { case (`t`, s, e) => (s, e) } match {
          case Seq(x) => x
          case other => fail(s"$where: expected exactly one '$t', got ${other.length}")
        }
      val (tkS, tkE) = one(trakKids, "tkhd", "trak")
      if (tkE - tkS < 4) fail("tkhd too short")
      val tkV = bytes(tkS) & 0xFF
      // version-dependent field offsets: reading past the box end
      // would either index past the payload (raw AIOOBE, no doc id)
      // or land in the NEXT box's bytes (garbage track id, parse
      // "succeeds") — both violate the fail-loud contract
      if (tkE - tkS < (if (tkV == 1) 24 else 16))
        fail(s"tkhd (version $tkV) too short for its track id")
      val trackId = if (tkV == 1) be32(tkS + 20) else be32(tkS + 12)
      val (mdS, mdE) = one(trakKids, "mdia", "trak")
      val mdiaKids = boxesIn(mdS, mdE, topLevel = false)
      val (mhS, mhE) = one(mdiaKids, "mdhd", "mdia")
      if (mhE - mhS < 4) fail("mdhd too short")
      val mhV = bytes(mhS) & 0xFF
      if (mhE - mhS < (if (mhV == 1) 24 else 16))
        fail(s"mdhd (version $mhV) too short for its timescale")
      val timescale = if (mhV == 1) be32(mhS + 20) else be32(mhS + 12)
      val (hdS, hdE) = one(mdiaKids, "hdlr", "mdia")
      if (hdE - hdS < 12) fail("hdlr too short")
      val handler = cc(hdS + 8)
      val (mnS, mnE) = one(mdiaKids, "minf", "mdia")
      val minfKids = boxesIn(mnS, mnE, topLevel = false)
      val (sbS, sbE) = one(minfKids, "stbl", "minf")
      val stbl = boxesIn(sbS, sbE, topLevel = false)
      // stsd: codec fourcc (+ audio format fields for sound handlers)
      val (sdS, sdE) = one(stbl, "stsd", "stbl")
      if (sdE - sdS < 16) fail("stsd too short")
      // exactly-one discipline: multiple sample descriptions would mean
      // per-chunk codec switches (stsc sample_description_index) that this
      // demuxer does not track — silently taking entry 1 would mislabel
      if (be32(sdS + 4) != 1)
        fail(s"stsd: expected exactly one sample entry, got ${be32(sdS + 4)}")
      val entryStart = sdS + 8
      if (entryStart + 8 > sdE) fail("stsd entry truncated")
      val codec = cc(entryStart + 4)
      val audioFmt =
        if (handler != "soun") None
        else {
          if (entryStart + 36 > sdE) fail("audio sample entry truncated")
          Some(Mp4AudioFmt(
            channels = be16(entryStart + 24),
            bits = be16(entryStart + 26),
            sample_rate = (be32(entryStart + 32) >> 16).toInt))
        }
      // stts: total declared samples
      val (ttS, ttE) = one(stbl, "stts", "stbl")
      if (ttE - ttS < 8) fail("stts too short for its entry count")
      val nStts = be32(ttS + 4)
      if (ttS + 8 + nStts * 8 > ttE) fail("stts table truncated")
      var sttsTotal = 0L
      var ti = 0
      while (ti < nStts) { sttsTotal += be32(ttS + 8 + ti * 8); ti += 1 }
      // stsz: sizes
      val (szS, szE) = one(stbl, "stsz", "stbl")
      if (szE - szS < 12) fail("stsz too short")
      val constSize = be32(szS + 4)
      val nSamples = be32(szS + 8)
      if (nSamples > (bytes.length.toLong + 7)) fail(s"stsz declares $nSamples samples")
      if (sttsTotal != nSamples)
        fail(s"stts declares $sttsTotal samples, stsz declares $nSamples")
      val sizes: Array[Long] =
        if (constSize != 0) Array.fill(nSamples.toInt)(constSize)
        else {
          if (szS + 12 + nSamples * 4 > szE) fail("stsz size table truncated")
          Array.tabulate(nSamples.toInt)(i => be32(szS + 12 + i * 4))
        }
      // chunk offsets: stco or co64
      val offs: Array[Long] =
        (stbl.collectFirst { case ("stco", s, e) => (s, e, false) } orElse
          stbl.collectFirst { case ("co64", s, e) => (s, e, true) }) match {
          case None => fail("stbl has neither stco nor co64")
          case Some((s, e, wide)) =>
            if (e - s < 8) fail("chunk offset box too short for its entry count")
            val n = be32(s + 4)
            val w = if (wide) 8 else 4
            if (s + 8 + n * w > e) fail("chunk offset table truncated")
            Array.tabulate(n.toInt)(i =>
              if (wide) be64(s + 8 + i * 8) else be32(s + 8 + i * 4))
        }
      // stsc runs -> samples-per-chunk for every chunk
      val (scS, scE) = one(stbl, "stsc", "stbl")
      if (scE - scS < 8) fail("stsc too short for its entry count")
      val nRuns = be32(scS + 4).toInt
      if (scS + 8 + nRuns * 12L > scE) fail("stsc table truncated")
      val runs = Array.tabulate(nRuns)(i =>
        (be32(scS + 8 + i * 12), be32(scS + 12 + i * 12)))
      if (offs.nonEmpty && (runs.isEmpty || runs.head._1 != 1L))
        fail("stsc runs must start at chunk 1")
      var ri = 1
      while (ri < nRuns) {
        if (runs(ri)._1 <= runs(ri - 1)._1)
          fail("stsc first_chunk must strictly increase")
        ri += 1
      }
      if (runs.exists(_._2 < 1)) fail("stsc samples_per_chunk must be >= 1")
      if (runs.nonEmpty && runs.last._1 > offs.length)
        fail(s"stsc names chunk ${runs.last._1}, only ${offs.length} chunks")
      // expand: walk chunks, slice samples; every sample and chunk
      // must be consumed exactly
      val samples = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def inMdat(lo: Long, hi: Long): Boolean =
        mdats.exists { case (s, e) => lo >= s && hi <= e }
      var si = 0
      var runIdx = 0
      var chunk = 0
      while (chunk < offs.length) {
        while (runIdx + 1 < nRuns && runs(runIdx + 1)._1 <= chunk + 1) runIdx += 1
        val spc = runs(runIdx)._2
        var off = offs(chunk)
        var j = 0L
        while (j < spc) {
          if (si >= nSamples)
            fail(s"stsc expansion names more samples than stsz's $nSamples")
          val sz = sizes(si)
          if (!inMdat(off, off + sz))
            fail(s"sample $si (bytes $off..${off + sz}) lies outside every mdat")
          samples += java.util.Arrays.copyOfRange(bytes, off.toInt, (off + sz).toInt)
          off += sz; si += 1; j += 1
        }
        chunk += 1
      }
      if (si != nSamples)
        fail(s"chunk walk consumed $si of $nSamples declared samples " +
          "(stsc under-covers stsz)")
      Mp4Track(trackId, handler, codec, timescale, audioFmt, samples.toSeq)
    }
    if (tracks.isEmpty) fail("moov has no trak")
    Mp4Content(tracks)
  }

  /** The video samples of an MP4 — the first `vide` track's samples
    * in sample order (PNG frames under this muxer). Fails loud when
    * the container has no video track. */
  def mp4Frames(id: Long, bytes: Array[Byte]): Seq[Array[Byte]] =
    mp4FramesOf(id, mp4Demux(id, bytes))

  private def mp4FramesOf(id: Long, content: Mp4Content): Seq[Array[Byte]] =
    content.tracks.find(_.handler == "vide").map(_.samples)
      .getOrElse(throw new IllegalArgumentException(
        s"doc $id: MP4 has no video track"))

  /** The soundtrack of an MP4 re-wrapped as a standalone WAV —
    * [[aviAudioWav]]'s contract for the ISO-BMFF family: the first
    * `soun` track's PCM samples (codec `twos` = big-endian PCM16,
    * `sowt` = little-endian) byte-swap to LE and wrap through the
    * real JDK encoder, so one MP4 capture feeds every existing audio
    * pass. Fails loud on a missing/ compressed/ non-mono-16
    * soundtrack. */
  def mp4AudioWav(id: Long, bytes: Array[Byte]): Array[Byte] =
    mp4AudioWavOf(id, mp4Demux(id, bytes))

  private def mp4AudioWavOf(id: Long, content: Mp4Content): Array[Byte] = {
    val t = content.tracks.find(_.handler == "soun")
      .getOrElse(throw new IllegalArgumentException(
        s"doc $id: MP4 has no audio track"))
    val fmt = t.audio.getOrElse(throw new IllegalArgumentException(
      s"doc $id: MP4 audio track carries no sample-entry format"))
    require(t.codec == "twos" || t.codec == "sowt",
      s"doc $id: expected PCM codec twos/sowt, got '${t.codec}'")
    require(fmt.bits == 16 && fmt.channels == 1,
      s"doc $id: expected PCM16 mono soundtrack, got ${fmt.bits}-bit " +
        s"${fmt.channels}-channel")
    val n = t.samples.map(_.length).sum
    val pcm = new Array[Byte](n)
    var p = 0
    t.samples.foreach { s =>
      require(s.length == 2, s"doc $id: PCM16 sample of ${s.length} bytes")
      if (t.codec == "twos") { pcm(p) = s(1); pcm(p + 1) = s(0) } // BE -> LE
      else { pcm(p) = s(0); pcm(p + 1) = s(1) }
      p += 2
    }
    pcmLeToWav(pcm, fmt.sample_rate)
  }

  // ------------------------------------------------------------ Matroska/WebM (EBML) mux/demux

  /** Is this payload an EBML stream (Matroska/WebM)? (the EBML header
    * element id `0x1A45DFA3` first) */
  def isWebm(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && (b(0) & 0xFF) == 0x1A &&
      (b(1) & 0xFF) == 0x45 && (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3

  // Matroska element ids (stored form, class marker kept) — the subset
  // a minimal two-track capture needs.
  private object Mkv {
    val Ebml = 0x1A45DFA3L; val DocType = 0x4282L
    val EbmlVersion = 0x4286L; val EbmlReadVersion = 0x42F7L
    val MaxIdLength = 0x42F2L; val MaxSizeLength = 0x42F3L
    val DocTypeVersion = 0x4287L; val DocTypeReadVersion = 0x4285L
    val Segment = 0x18538067L
    val Info = 0x1549A966L; val TimestampScale = 0x2AD7B1L
    val MuxingApp = 0x4D80L; val WritingApp = 0x5741L
    val Tracks = 0x1654AE6BL; val TrackEntry = 0xAEL
    val TrackNumber = 0xD7L; val TrackUid = 0x73C5L; val TrackType = 0x83L
    val CodecId = 0x86L
    val Video = 0xE0L; val PixelWidth = 0xB0L; val PixelHeight = 0xBAL
    val Audio = 0xE1L; val SamplingFrequency = 0xB5L
    val Channels = 0x9FL; val BitDepth = 0x6264L
    val Cluster = 0x1F43B675L; val Timestamp = 0xE7L
    val SimpleBlock = 0xA3L; val BlockGroup = 0xA0L
  }

  /** An element id's stored bytes — ids carry their class marker in
    * the value, so the width is just the value's byte length. */
  private def ebmlIdBytes(id: Long): Array[Byte] = {
    val w = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8)
    Array.tabulate(w)(i => ((id >> (8 * (w - 1 - i))) & 0xFF).toByte)
  }

  /** A size (or track-number) VINT at minimal width: the all-ones
    * pattern is reserved (unknown size), so a value needing exactly
    * `7w` one-bits widens. */
  private def ebmlVint(v: Long): Array[Byte] = {
    require(v >= 0, s"EBML VINT must be non-negative, got $v")
    var w = 1
    while (w < 8 && v >= (1L << (7 * w)) - 1) w += 1
    require(v < (1L << (7 * w)) - 1, s"EBML VINT $v does not fit 8 bytes")
    val total = (1L << (7 * w)) | v
    Array.tabulate(w)(i => ((total >> (8 * (w - 1 - i))) & 0xFF).toByte)
  }

  /** Minimal-width big-endian unsigned-integer element payload. */
  private def ebmlUint(v: Long): Array[Byte] = {
    require(v >= 0, s"EBML uint must be non-negative, got $v")
    var w = 1
    while (w < 8 && (v >>> (8 * w)) != 0) w += 1
    Array.tabulate(w)(i => ((v >> (8 * (w - 1 - i))) & 0xFF).toByte)
  }

  private def ebmlEl(id: Long, payload: Array[Byte]): Array[Byte] =
    ebmlIdBytes(id) ++ ebmlVint(payload.length.toLong) ++ payload

  private def ebmlStr(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Render a minimal Matroska/WebM A/V container: EBML header
    * (DocType `webm`) + one known-size Segment with Info
    * (TimestampScale 1 ms), Tracks (video track 1: frames stored
    * verbatim under the fixture-private CodecID `V_PNG` — Matroska
    * readers skip unknown codec ids; audio track 2: PCM16 mono under
    * the REAL Matroska PCM codec ids `A_PCM/INT/LIT`, or
    * `A_PCM/INT/BIG` when `bigEndianAudio` — both byte orders keep the
    * demuxer's conversion paths exercised, the MP4 `twos`/co64
    * convention), and one Cluster per video frame carrying the frame's
    * SimpleBlock plus its audio slice as a second SimpleBlock
    * ([[renderMp4]]'s interleave rule). Strict-form output: every
    * element has an explicit size (no unknown-size), no lacing.
    * Deterministic byte-for-byte. */
  def renderWebm(
      frames: Seq[Array[Byte]], audioSamples: Array[Int],
      fps: Int = 10, sampleRate: Int = 8000, bigEndianAudio: Boolean = false
  ): Array[Byte] = {
    require(fps > 0, s"fps must be positive, got $fps")
    require(sampleRate > 0, s"sampleRate must be positive, got $sampleRate")
    val nf = frames.length
    val nSamples = audioSamples.length
    val sliceAt: Array[Int] =
      if (nf == 0) Array(0, nSamples)
      else {
        val base = nSamples / nf; val extra = nSamples % nf
        val at = new Array[Int](nf + 1)
        var i = 0
        while (i < nf) { at(i + 1) = at(i) + base + (if (i < extra) 1 else 0); i += 1 }
        at
      }
    val header = ebmlEl(Mkv.Ebml,
      ebmlEl(Mkv.EbmlVersion, ebmlUint(1)) ++
        ebmlEl(Mkv.EbmlReadVersion, ebmlUint(1)) ++
        ebmlEl(Mkv.MaxIdLength, ebmlUint(4)) ++
        ebmlEl(Mkv.MaxSizeLength, ebmlUint(8)) ++
        ebmlEl(Mkv.DocType, ebmlStr("webm")) ++
        ebmlEl(Mkv.DocTypeVersion, ebmlUint(2)) ++
        ebmlEl(Mkv.DocTypeReadVersion, ebmlUint(2)))
    val info = ebmlEl(Mkv.Info,
      ebmlEl(Mkv.TimestampScale, ebmlUint(1000000L)) ++
        ebmlEl(Mkv.MuxingApp, ebmlStr("graft")) ++
        ebmlEl(Mkv.WritingApp, ebmlStr("graft")))
    val dims = frames.map(pngDims)
    val width = if (dims.isEmpty) 0 else dims.map(_._1).max
    val height = if (dims.isEmpty) 0 else dims.map(_._2).max
    val videoEntry = ebmlEl(Mkv.TrackEntry,
      ebmlEl(Mkv.TrackNumber, ebmlUint(1)) ++
        ebmlEl(Mkv.TrackUid, ebmlUint(1)) ++
        ebmlEl(Mkv.TrackType, ebmlUint(1)) ++
        ebmlEl(Mkv.CodecId, ebmlStr("V_PNG")) ++
        ebmlEl(Mkv.Video,
          ebmlEl(Mkv.PixelWidth, ebmlUint(width.toLong)) ++
            ebmlEl(Mkv.PixelHeight, ebmlUint(height.toLong))))
    val rateBits = java.lang.Double.doubleToLongBits(sampleRate.toDouble)
    val rate8 = Array.tabulate(8)(i => ((rateBits >> (8 * (7 - i))) & 0xFF).toByte)
    val audioEntry = ebmlEl(Mkv.TrackEntry,
      ebmlEl(Mkv.TrackNumber, ebmlUint(2)) ++
        ebmlEl(Mkv.TrackUid, ebmlUint(2)) ++
        ebmlEl(Mkv.TrackType, ebmlUint(2)) ++
        ebmlEl(Mkv.CodecId,
          ebmlStr(if (bigEndianAudio) "A_PCM/INT/BIG" else "A_PCM/INT/LIT")) ++
        ebmlEl(Mkv.Audio,
          ebmlEl(Mkv.SamplingFrequency, rate8) ++
            ebmlEl(Mkv.Channels, ebmlUint(1)) ++
            ebmlEl(Mkv.BitDepth, ebmlUint(16))))
    val tracks = ebmlEl(Mkv.Tracks, videoEntry ++ audioEntry)
    def simpleBlock(track: Long, payload: Array[Byte]): Array[Byte] =
      ebmlEl(Mkv.SimpleBlock,
        ebmlVint(track) ++ Array[Byte](0, 0, 0x80.toByte) ++ payload)
    def audioBlock(slice: Int): Array[Byte] = {
      val (lo, hi) = (sliceAt(slice), sliceAt(slice + 1))
      if (hi <= lo) Array.emptyByteArray
      else {
        val pcm = new Array[Byte](2 * (hi - lo))
        var i = lo
        while (i < hi) {
          val s = audioSamples(i) & 0xFFFF
          val p = 2 * (i - lo)
          if (bigEndianAudio) { pcm(p) = (s >> 8).toByte; pcm(p + 1) = s.toByte }
          else { pcm(p) = s.toByte; pcm(p + 1) = (s >> 8).toByte }
          i += 1
        }
        simpleBlock(2L, pcm)
      }
    }
    val clusters: Array[Byte] =
      if (nf == 0)
        ebmlEl(Mkv.Cluster, ebmlEl(Mkv.Timestamp, ebmlUint(0)) ++ audioBlock(0))
      else
        frames.indices.toArray.flatMap { i =>
          ebmlEl(Mkv.Cluster,
            ebmlEl(Mkv.Timestamp, ebmlUint(i * 1000L / fps)) ++
              simpleBlock(1L, frames(i)) ++ audioBlock(i))
        }
    header ++ ebmlEl(Mkv.Segment, info ++ tracks ++ clusters)
  }

  final case class WebmAudioFmt(channels: Int, bits: Int, sample_rate: Int)
  final case class WebmTrack(
      track_number: Long, track_type: Int, codec: String,
      audio: Option[WebmAudioFmt], blocks: Seq[Array[Byte]])

  /** One demuxed Matroska/WebM container. */
  final case class WebmContent(timestampScale: Long, tracks: Seq[WebmTrack])

  /** Demux a Matroska/WebM (EBML) byte stream by walking its element
    * tree and reconstructing every track's block payloads in stream
    * order. STRICT, the [[mp4Demux]] discipline: elements must tile
    * their parent exactly, VINTs must be well-formed (a zero lead byte
    * is an over-wide VINT), unknown-SIZE elements are rejected (strict
    * tiling needs explicit sizes), the EBML header must lead with a
    * `webm`/`matroska` DocType, exactly one Segment / Info / Tracks,
    * track numbers must be unique and declared before use, laced
    * SimpleBlocks and BlockGroups are unsupported-loud, and every
    * block must name a declared track — a truncated or corrupted
    * capture raises with the doc id, it never silently yields less
    * media. UNKNOWN element ids are skipped (EBML's forward-compat
    * contract) but must still tile. */
  def webmDemux(id: Long, bytes: Array[Byte]): WebmContent = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"doc $id: WebM parse: $msg")
    if (!isWebm(bytes)) fail("not an EBML payload (no leading EBML header id)")
    // (vint value, width); `keepMarker` reads ids, else data. The
    // all-ones reservation (RFC 8794's unknown-size sentinel) applies
    // ONLY to element SIZES — a block track number of 127 encoded
    // minimally as 0xFF is a legal Matroska stream and must parse.
    def vintAt(p: Int, end: Int, keepMarker: Boolean, what: String,
        rejectAllOnes: Boolean = false): (Long, Int) = {
      if (p >= end) fail(s"truncated $what VINT at byte $p")
      val b0 = bytes(p) & 0xFF
      if (b0 == 0) fail(s"invalid $what VINT at byte $p (lead byte 0: width > 8)")
      val w = java.lang.Integer.numberOfLeadingZeros(b0) - 23 // 1..8
      if (p + w > end) fail(s"truncated $what VINT at byte $p (width $w)")
      var v = if (keepMarker) b0.toLong else (b0 & ((1 << (8 - w)) - 1)).toLong
      var i = 1
      while (i < w) { v = (v << 8) | (bytes(p + i) & 0xFF); i += 1 }
      if (rejectAllOnes && v == (1L << (7 * w)) - 1)
        fail(s"unknown-size element at byte $p — strict tiling needs explicit sizes")
      (v, w)
    }
    // (id, payloadStart, payloadEnd) triples tiling [start, end)
    def elementsIn(start: Int, end: Int): Seq[(Long, Int, Int)] = {
      val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
      var off = start
      while (off < end) {
        val (eid, iw) = vintAt(off, end, keepMarker = true, "element id")
        val (sz, sw) = vintAt(off + iw, end, keepMarker = false, "element size",
          rejectAllOnes = true)
        val ps = off + iw + sw
        if (ps + sz > end)
          fail(s"element 0x${eid.toHexString} at byte $off runs past its " +
            s"parent (declares $sz, ${end - ps} available)")
        acc += ((eid, ps, ps + sz.toInt))
        off = ps + sz.toInt
      }
      acc.toSeq
    }
    def uintOf(s: Int, e: Int): Long = {
      if (e - s > 8) fail(s"uint element wider than 8 bytes at byte $s")
      var v = 0L; var i = s
      while (i < e) { v = (v << 8) | (bytes(i) & 0xFF); i += 1 }
      v
    }
    def strOf(s: Int, e: Int): String =
      new String(bytes, s, e - s, java.nio.charset.StandardCharsets.US_ASCII)
    def floatOf(s: Int, e: Int): Double = (e - s) match {
      case 4 => java.lang.Float.intBitsToFloat(uintOf(s, e).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uintOf(s, e))
      case w => fail(s"float element of $w bytes at byte $s (must be 4 or 8)")
    }
    def one(kids: Seq[(Long, Int, Int)], eid: Long, where: String): (Int, Int) =
      kids.collect { case (`eid`, s, e) => (s, e) } match {
        case Seq(x) => x
        case other => fail(s"$where: expected exactly one element " +
          s"0x${eid.toHexString}, got ${other.length}")
      }
    val top = elementsIn(0, bytes.length)
    if (top.head._1 != Mkv.Ebml) fail("first element must be the EBML header")
    val (hS, hE) = one(top, Mkv.Ebml, "top level")
    val headerKids = elementsIn(hS, hE)
    val docType = headerKids.collectFirst { case (Mkv.DocType, s, e) => strOf(s, e) }
      .getOrElse(fail("EBML header has no DocType"))
    if (docType != "webm" && docType != "matroska")
      fail(s"DocType '$docType' is not webm/matroska")
    val (segS, segE) = one(top, Mkv.Segment, "top level")
    val segKids = elementsIn(segS, segE)
    val (inS, inE) = one(segKids, Mkv.Info, "segment")
    val tsScale = elementsIn(inS, inE)
      .collectFirst { case (Mkv.TimestampScale, s, e) => uintOf(s, e) }
      .getOrElse(1000000L)
    val (trS, trE) = one(segKids, Mkv.Tracks, "segment")
    val entries = elementsIn(trS, trE).collect { case (Mkv.TrackEntry, s, e) =>
      val kids = elementsIn(s, e)
      def req(eid: Long, what: String): (Int, Int) = one(kids, eid, s"track entry ($what)")
      val (nS, nE) = req(Mkv.TrackNumber, "TrackNumber")
      val num = uintOf(nS, nE)
      if (num == 0) fail("track number 0 is reserved")
      val (tS, tE2) = req(Mkv.TrackType, "TrackType")
      val (cS, cE) = req(Mkv.CodecId, "CodecID")
      val audio = kids.collectFirst { case (Mkv.Audio, aS, aE) =>
        val aKids = elementsIn(aS, aE)
        val rate = aKids.collectFirst { case (Mkv.SamplingFrequency, s2, e2) =>
          floatOf(s2, e2) }.getOrElse(8000.0)
        if (rate <= 0 || rate != math.rint(rate))
          fail(s"non-integral sampling frequency $rate")
        WebmAudioFmt(
          channels = aKids.collectFirst { case (Mkv.Channels, s2, e2) =>
            uintOf(s2, e2).toInt }.getOrElse(1),
          bits = aKids.collectFirst { case (Mkv.BitDepth, s2, e2) =>
            uintOf(s2, e2).toInt }.getOrElse(16),
          sample_rate = rate.toInt)
      }
      (num, uintOf(tS, tE2).toInt, strOf(cS, cE), audio)
    }
    if (entries.isEmpty) fail("Tracks declares no track entries")
    if (entries.map(_._1).distinct.length != entries.length)
      fail(s"duplicate track numbers (${entries.map(_._1).mkString(", ")})")
    val byNum = entries.map(t => t._1 ->
      scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]).toMap
    segKids.foreach {
      case (Mkv.Cluster, cS, cE) =>
        elementsIn(cS, cE).foreach {
          case (Mkv.SimpleBlock, bS, bE) =>
            val (track, tw) = vintAt(bS, bE, keepMarker = false, "block track")
            if (bS + tw + 3 > bE) fail(s"truncated SimpleBlock at byte $bS")
            val flags = bytes(bS + tw + 2) & 0xFF
            if ((flags & 0x06) != 0)
              fail(s"laced SimpleBlock at byte $bS (lacing unsupported)")
            byNum.getOrElse(track,
              fail(s"SimpleBlock at byte $bS names undeclared track $track")) +=
              java.util.Arrays.copyOfRange(bytes, bS + tw + 3, bE)
          case (Mkv.BlockGroup, bS, _) =>
            fail(s"BlockGroup at byte $bS (only SimpleBlock is supported)")
          case _ => () // Timestamp / unknown ids: skipped, already tiled
        }
      case _ => () // Info / Tracks / unknown segment children
    }
    WebmContent(tsScale, entries.map { case (num, tpe, codec, audio) =>
      WebmTrack(num, tpe, codec, audio, byNum(num).toSeq)
    })
  }

  /** The video-track frame payloads of a WebM container (track type
    * 1), stream order. */
  def webmFrames(id: Long, bytes: Array[Byte]): Seq[Array[Byte]] =
    webmFramesOf(id, webmDemux(id, bytes))

  private def webmFramesOf(id: Long, content: WebmContent): Seq[Array[Byte]] =
    content.tracks.find(_.track_type == 1).map(_.blocks)
      .getOrElse(throw new IllegalArgumentException(
        s"doc $id: WebM has no video track"))

  /** The soundtrack of a WebM re-wrapped as a standalone WAV —
    * [[mp4AudioWav]]'s contract for the EBML family: the first audio
    * track's PCM blocks (codec `A_PCM/INT/LIT` little-endian or
    * `A_PCM/INT/BIG` byte-swapped) concatenate and wrap through the
    * real JDK encoder, so one WebM capture feeds every existing audio
    * pass. Fails loud on a missing / compressed / non-mono-16
    * soundtrack. */
  def webmAudioWav(id: Long, bytes: Array[Byte]): Array[Byte] =
    webmAudioWavOf(id, webmDemux(id, bytes))

  private def webmAudioWavOf(id: Long, content: WebmContent): Array[Byte] = {
    val t = content.tracks.find(_.track_type == 2)
      .getOrElse(throw new IllegalArgumentException(
        s"doc $id: WebM has no audio track"))
    val fmt = t.audio.getOrElse(throw new IllegalArgumentException(
      s"doc $id: WebM audio track carries no Audio element"))
    require(t.codec == "A_PCM/INT/LIT" || t.codec == "A_PCM/INT/BIG",
      s"doc $id: expected PCM codec A_PCM/INT/LIT or /BIG, got '${t.codec}'")
    require(fmt.bits == 16 && fmt.channels == 1,
      s"doc $id: expected PCM16 mono soundtrack, got ${fmt.bits}-bit " +
        s"${fmt.channels}-channel")
    val n = t.blocks.map(_.length).sum
    val pcm = new Array[Byte](n)
    var p = 0
    t.blocks.foreach { b =>
      if (b.length % 2 != 0)
        throw new IllegalArgumentException(
          s"doc $id: PCM16 block of ${b.length} bytes")
      var i = 0
      while (i < b.length) {
        if (t.codec == "A_PCM/INT/BIG") { pcm(p) = b(i + 1); pcm(p + 1) = b(i) }
        else { pcm(p) = b(i); pcm(p + 1) = b(i + 1) }
        p += 2; i += 2
      }
    }
    pcmLeToWav(pcm, fmt.sample_rate)
  }

  /** Soundtrack extraction with container dispatch: AVI via
    * [[aviAudioWav]], MP4 via [[mp4AudioWav]], Matroska/WebM via
    * [[webmAudioWav]] — what the `extract_audio` pipeline step calls,
    * so one chain admits audio from mixed A/V corpora. Anything else
    * fails loud with the id. */
  def containerAudioWav(id: Long, bytes: Array[Byte]): Array[Byte] =
    if (isAvi(bytes)) aviAudioWav(id, bytes)
    else if (isMp4(bytes)) mp4AudioWav(id, bytes)
    else if (isWebm(bytes)) webmAudioWav(id, bytes)
    else throw new IllegalArgumentException(
      s"doc $id: payload is not a RIFF/AVI, ISO-BMFF, or EBML/WebM container")

  /** Synthetic frame-container videos from an id column: doc `id` has
    * frames `f = 0 .. 1 + id % 3` (2–4 frames), frame `f` being the
    * formula PNG of image id `id + f` ([[syntheticImages]] dims) — a
    * sliding window over the image-id line, so CONSECUTIVE docs share
    * frames and genuine near-dup structure exists without any copy
    * generator. Scan-local. */
  def syntheticVideos(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      System.setProperty("java.awt.headless", "true")
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val frames = (0 to (1 + id % 3).toInt).map { f =>
          val fid = id + f
          syntheticPng(fid, (8 + fid % 9).toInt, (8 + fid % 7).toInt)
        }
        (id, packFrames(frames))
      }
    }.toDF("doc_id", "payload")
  }

  /** [[syntheticVideos]]' frame line packed as REAL RIFF/AVI bytes
    * ([[renderAvi]], fourcc `MPNG` — lossless PNG frames so decoded
    * pixels stay oracle-replayable): doc `id` carries frames
    * `f = 0 .. 1 + id % 3`, frame `f` the formula PNG of image id
    * `id + f`. Scan-local. */
  def syntheticAviVideos(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      System.setProperty("java.awt.headless", "true")
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val frames = (0 to (1 + id % 3).toInt).map { f =>
          val fid = id + f
          syntheticPng(fid, (8 + fid % 9).toInt, (8 + fid % 7).toInt)
        }
        (id, renderAvi(frames))
      }
    }.toDF("doc_id", "payload")
  }

  /** [[syntheticAviVideos]]' frame line muxed WITH a soundtrack
    * ([[renderAviAv]]): doc `id` carries the same PNG frames plus
    * `128 + id % 97` PCM16 samples of [[syntheticSample]]'s formula,
    * interleaved per frame; odd ids wrap each interleave pair in a
    * `rec ` group (both layouts must demux identically). Scan-local. */
  def syntheticAvVideos(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      System.setProperty("java.awt.headless", "true")
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val frames = (0 to (1 + id % 3).toInt).map { f =>
          val fid = id + f
          syntheticPng(fid, (8 + fid % 9).toInt, (8 + fid % 7).toInt)
        }
        val samples = Array.tabulate((128 + id % 97).toInt)(i => syntheticSample(id, i))
        (id, renderAviAv(frames, samples, recGroups = id % 2 == 1))
      }
    }.toDF("doc_id", "payload")
  }

  /** Deterministic ISO-BMFF (MP4) A/V containers from an id column —
    * [[syntheticAvVideos]]'s content (same frame line, same PCM
    * formula, so the SAME oracle replays the checksums) packaged
    * through [[renderMp4]]; odd ids take the `co64` 64-bit-offset
    * path so both chunk-offset forms stay exercised. */
  def syntheticMp4Videos(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      System.setProperty("java.awt.headless", "true")
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val frames = (0 to (1 + id % 3).toInt).map { f =>
          val fid = id + f
          syntheticPng(fid, (8 + fid % 9).toInt, (8 + fid % 7).toInt)
        }
        val samples = Array.tabulate((128 + id % 97).toInt)(i => syntheticSample(id, i))
        (id, renderMp4(frames, samples, useCo64 = id % 2 == 1))
      }
    }.toDF("doc_id", "payload")
  }

  /** Deterministic Matroska/WebM A/V containers from an id column —
    * [[syntheticAvVideos]]'s content (same frame line, same PCM
    * formula, so the SAME oracle replays the checksums) packaged
    * through [[renderWebm]]; odd ids take the `A_PCM/INT/BIG`
    * byte-swapped soundtrack so both PCM byte orders stay
    * exercised. */
  def syntheticWebmVideos(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      System.setProperty("java.awt.headless", "true")
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val frames = (0 to (1 + id % 3).toInt).map { f =>
          val fid = id + f
          syntheticPng(fid, (8 + fid % 9).toInt, (8 + fid % 7).toInt)
        }
        val samples = Array.tabulate((128 + id % 97).toInt)(i => syntheticSample(id, i))
        (id, renderWebm(frames, samples, bigEndianAudio = id % 2 == 1))
      }
    }.toDF("doc_id", "payload")
  }

  /** Per-container A/V content checksums — the gate shape proving
    * BOTH streams of one real capture demux and decode correctly:
    * `v_sum = Σ_f Σ_i (f+1)·(i+1)·pixel` over the really-decoded RGB
    * bytes of every video frame (frame order and pixel order both
    * weighted), `a_sum1`/`a_sum2` the [[DecodedAudio]] checksums over
    * the soundtrack routed through [[aviAudioWav]] and the REAL JDK
    * WAV decoder (the exact path audio dedup admits from). */
  final case class AvChecksums(
      doc_id: Long, n_frames: Int, v_sum: Long,
      n_samples: Long, a_sum1: Long, a_sum2: Long)

  def avContentChecksums(payloads: DataFrame): Dataset[AvChecksums] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])].mapPartitions {
      it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          // container dispatch: RIFF/AVI walks LIST chunks, ISO-BMFF
          // reconstructs the sample tables, EBML/WebM walks the
          // element tree — all land on the same (frames,
          // soundtrack-WAV) shape and the same checksums, and each
          // container demuxes ONCE for both streams
          val (frames, wav) =
            if (isAvi(bytes)) {
              val c = aviDemux(id, bytes)
              (c.frames, aviAudioWavOf(id, c))
            } else if (isWebm(bytes)) {
              val c = webmDemux(id, bytes)
              (webmFramesOf(id, c), webmAudioWavOf(id, c))
            } else {
              val c = mp4Demux(id, bytes)
              (mp4FramesOf(id, c), mp4AudioWavOf(id, c))
            }
          var vSum = 0L
          frames.zipWithIndex.foreach { case (fb, f) =>
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
            require(img != null, s"doc $id: frame $f failed to decode")
            val rgb = rgbBytes(img, img.getWidth, img.getHeight)
            var i = 0
            while (i < rgb.length) {
              vSum += (f + 1).toLong * (i + 1).toLong * (rgb(i) & 0xFF)
              i += 1
            }
          }
          val s = pcm16Samples(id, wav)
          var (a1, a2) = (0L, 0L)
          var i = 0
          while (i < s.length) {
            val p = (i + 1).toLong
            a1 += p * s(i); a2 += p * p * s(i)
            i += 1
          }
          AvChecksums(id, frames.length, vSum, s.length.toLong, a1, a2)
        }
    }
  }

  /** Demux → per-frame 2x NN upscale + PNG re-encode → remux in the
    * SAME container the input arrived in (AVI back to AVI, legacy
    * back to legacy) — the "transcoded copy" generator for the video
    * near-dup gate: every frame hashes identically to the original's
    * (the [[dHash]] floor-division composition), so the copy's
    * signature set equals the original's exactly. Emits
    * `doc_id + idOffset`. */
  def reencodeScaledVideo(payloads: DataFrame, factor: Int, idOffset: Long): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])].mapPartitions {
      it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val scaled = demuxFrames(id, bytes).map(scalePng(id, _, factor))
          (id + idOffset,
            if (isAvi(bytes)) renderAvi(scaled) else packFrames(scaled))
        }
    }.toDF("doc_id", "payload")
  }

  /** Per-frame perceptual hash of a video payload. */
  final case class VideoFrameHash(
      doc_id: Long, frame_idx: Int, dhash: Long, dhash_hex: String)

  /** Demux ([[demuxFrames]] — AVI or legacy container) + REAL
    * per-frame decode + [[dHash]], scan-local: one codec config per
    * partition, output fan-out bounded by frame count, no shuffle —
    * the video signature pass. Pair the DISTINCT `(doc_id, dhash_hex)`
    * rows with [[Dedup.winnowPairsFromFps]]-style shared-hash
    * blocking. */
  def videoFrameHashes(payloads: DataFrame): Dataset[VideoFrameHash] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])].mapPartitions {
      it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          demuxFrames(id, bytes).iterator.zipWithIndex.map { case (f, i) =>
            val (hash, hex) = dhashOf(id, f)
            VideoFrameHash(id, i, hash, hex)
          }
        }
    }
  }

  /** One really-decoded frame's content checksums — [[DecodedImage]]'s
    * shape per (video, frame). */
  final case class DecodedFrame(
      doc_id: Long, frame_idx: Int, width: Int, height: Int,
      n_bytes: Int, sum1: Long, sum2: Long)

  /** Demux + REAL per-frame decode to position-weighted pixel
    * checksums — the frame-extraction gate pass: one row per frame,
    * `sum1`/`sum2` over the decoded row-major RGB bytes exactly as
    * [[decodeImage]] computes them per image. Scan-local; fan-out
    * bounded by frame count. */
  def videoFrameDecode(payloads: DataFrame): Dataset[DecodedFrame] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])].mapPartitions {
      it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          demuxFrames(id, bytes).iterator.zipWithIndex.map { case (fr, i) =>
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fr))
            require(img != null, s"doc $id frame $i: not a decodable image")
            val (w, h) = (img.getWidth, img.getHeight)
            val buf = rgbBytes(img, w, h)
            var (s1, s2, j) = (0L, 0L, 0)
            while (j < buf.length) {
              val v = buf(j) & 0xFF; val p = (j + 1).toLong
              s1 += p * v; s2 += p * p * v; j += 1
            }
            DecodedFrame(id, i, w, h, buf.length, s1, s2)
          }
        }
    }
  }

  /** One row per DISTINCT frame hash of a video, with the video's
    * distinct-frame count on every row. */
  final case class VideoSig(doc_id: Long, fp: String, nf: Int)

  /** The video SET signature: distinct frame dHashes per video with
    * the set size denormalized onto every row — everything a relative
    * (≥ ½) overlap criterion needs, computable downstream from posting
    * rows alone with no sizes side-table. Fully scan-local: a video's
    * frames live in its own payload row, so demux + decode + hash +
    * in-memory dedupe happen inside one mapPartitions pass, ZERO
    * shuffle (vs [[videoFrameHashes]].distinct + a count, which pays
    * two exchanges for the same set). */
  def videoFrameSet(payloads: DataFrame, payloadCol: String = "payload"): Dataset[VideoSig] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col(payloadCol)).as[(Long, Array[Byte])].mapPartitions {
      it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          val fps = demuxFrames(id, bytes).map(f => dhashOf(id, f)._2).distinct
          fps.iterator.map(VideoSig(id, _, fps.size))
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
