package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Multimodal

/** The RIFF/AVI mux/demux: parse ∘ render = id for arbitrary frame
  * bytes (CrawlFuzzSpec convention), strict fail-loud on structural
  * corruption (truncation, RIFF-size lies, header/chunk frame-count
  * disagreement, mid-container damage), container equivalence with the
  * legacy length-prefixed path, per-frame decode against the pixel
  * formula, and container-preserving transcode. */
class AviSpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  private val frameGen: Gen[Array[Byte]] = Gen.oneOf(
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
    // frames that LOOK like RIFF structure must still round-trip
    Gen.const("RIFF".getBytes("US-ASCII")),
    Gen.const("LIST0000movi".getBytes("US-ASCII")),
    Gen.const(Array.emptyByteArray),
    Gen.listOfN(1, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)) // odd length

  test("property: aviFrames is a left inverse of renderAvi for arbitrary frame bytes") {
    val prop = Prop.forAll(Gen.listOf(frameGen)) { frames =>
      val avi = Multimodal.renderAvi(frames)
      Multimodal.isAvi(avi) &&
        Multimodal.aviFrames(7L, avi).map(_.toSeq) == frames.map(_.toSeq) &&
        Multimodal.demuxFrames(7L, avi).map(_.toSeq) == frames.map(_.toSeq)
    }
    check("avi round-trip", prop)
  }

  test("property: arbitrary corruption of a rendered AVI either parses to the original frames or raises — never silently drops frames") {
    val frames = Seq("frame one".getBytes("UTF-8"), "f2".getBytes("UTF-8"),
      Array.tabulate(33)(_.toByte))
    val avi = Multimodal.renderAvi(frames)
    val prop = Prop.forAll(
      Gen.choose(0, avi.length - 1), Gen.choose(1, 255)) { (pos, x) =>
      val dam = avi.clone(); dam(pos) = (dam(pos) ^ x).toByte
      try {
        // damage to dead bytes (quality fields, idx1...) may keep the
        // parse intact — but a successful parse must return the TRUE
        // frames or a prefix-exact altered copy never shorter than
        // declared (count checks make silent drops impossible)
        Multimodal.aviFrames(7L, dam).size == frames.size
      } catch { case _: IllegalArgumentException => true }
    }
    check("avi corruption", prop, n = 200)
  }

  test("structural fail-loud: truncation, size lies, count mismatches") {
    val frames = Seq("aa".getBytes("UTF-8"), "bbb".getBytes("UTF-8"))
    val avi = Multimodal.renderAvi(frames)
    // truncated payload: RIFF size no longer covers it
    val eTrunc = intercept[IllegalArgumentException] {
      Multimodal.aviFrames(1L, avi.dropRight(3))
    }
    assert(eTrunc.getMessage.contains("RIFF declares"), eTrunc.getMessage)
    // avih dwTotalFrames tampered: header/movi disagreement raises.
    // avih data starts at byte 32 (RIFF 12 + LIST hdr 12 + 'avih'+size 8);
    // dwTotalFrames is its 5th dword
    val badCount = avi.clone()
    badCount(32 + 16) = 9
    val eCount = intercept[IllegalArgumentException](Multimodal.aviFrames(1L, badCount))
    assert(eCount.getMessage.contains("avih declares"), eCount.getMessage)
    // a frame chunk's declared size running past its parent raises
    val idx = indexOfChunk(avi, "00dc")
    val badSize = avi.clone()
    badSize(idx + 4) = 0x7F // declared frame length far too large
    val eSize = intercept[IllegalArgumentException](Multimodal.aviFrames(1L, badSize))
    assert(eSize.getMessage.contains("runs past") ||
      eSize.getMessage.contains("truncated"), eSize.getMessage)
    // non-AVI bytes refuse
    val eMagic = intercept[IllegalArgumentException] {
      Multimodal.aviFrames(1L, "RIFFxxxxWAVE".getBytes("US-ASCII") ++ new Array[Byte](20))
    }
    assert(eMagic.getMessage.contains("not a RIFF/AVI"), eMagic.getMessage)
  }

  private def indexOfChunk(b: Array[Byte], cc: String): Int = {
    val pat = cc.getBytes("US-ASCII")
    (0 to b.length - 4).find(i => pat.indices.forall(j => b(i + j) == pat(j)))
      .getOrElse(fail(s"no '$cc' chunk found"))
  }

  test("'rec ' interleave groups inside movi demux like bare chunks (the real-world AVI interleave layout)") {
    // hand-assemble an AVI whose movi wraps each frame chunk in a
    // 'rec ' LIST — the interleaved layout muxers emit for AV sync;
    // the chunk walker must recurse into the grouping
    val frames = Seq("frame-one".getBytes("UTF-8"), "f2!".getBytes("UTF-8"))
    val plain = Multimodal.renderAvi(frames)
    // splice: rebuild movi with rec-wrapped chunks. Parse the plain
    // container's top-level chunks to find movi's bounds.
    def u32(b: Array[Byte], p: Int): Int =
      (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) | ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
    def cc(b: Array[Byte], p: Int) = new String(b, p, 4, "US-ASCII")
    var off = 12
    var moviStart = -1; var moviEnd = -1
    while (off < plain.length && moviStart < 0) {
      val size = u32(plain, off + 4)
      if (cc(plain, off) == "LIST" && cc(plain, off + 8) == "movi") {
        moviStart = off; moviEnd = off + 8 + size + (size & 1)
      } else off += 8 + size + (size & 1)
    }
    assert(moviStart >= 0, "no movi list found in the rendered AVI")
    def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if ((data.length & 1) == 1) Array(0.toByte) else Array.emptyByteArray)
    val recWrapped = frames.flatMap { f =>
      val inner = chunk("00dc", f)
      chunk("LIST", "rec ".getBytes("US-ASCII") ++ inner)
    }.toArray
    val newMovi = "LIST".getBytes("US-ASCII") ++ le32(4 + recWrapped.length) ++
      "movi".getBytes("US-ASCII") ++ recWrapped
    val spliced0 = plain.take(moviStart) ++ newMovi ++ plain.drop(moviEnd)
    // fix the RIFF size for the new payload length
    val spliced = spliced0.clone()
    System.arraycopy(le32(spliced0.length - 8), 0, spliced, 4, 4)
    assert(Multimodal.aviFrames(9L, spliced).map(_.toSeq) === frames.map(_.toSeq))
  }

  test("syntheticAviVideos demuxes to exactly the legacy container's frame bytes; sniffMime routes it as AVI") {
    val ids = Seq(2L, 3L, 7L, 20L)
    val legacy = Multimodal.syntheticVideos(ids.toDF("doc_id"), "doc_id")
      .as[(Long, Array[Byte])].collect().toMap
    val avi = Multimodal.syntheticAviVideos(ids.toDF("doc_id"), "doc_id")
      .as[(Long, Array[Byte])].collect().toMap
    ids.foreach { id =>
      val want = Multimodal.unpackFrames(id, legacy(id)).map(_.toSeq)
      assert(Multimodal.aviFrames(id, avi(id)).map(_.toSeq) === want)
    }
    val sniffed = Multimodal.syntheticAviVideos(ids.toDF("doc_id"), "doc_id")
      .select(Multimodal.sniffMime(col("payload"))).distinct().as[String].collect()
    assert(sniffed.toSeq === Seq("video/x-msvideo"))
  }

  test("videoFrameDecode over real AVI reproduces the per-frame pixel formula") {
    val ids = Seq(1L, 5L, 11L)
    val got = Multimodal.videoFrameDecode(
        Multimodal.syntheticAviVideos(ids.toDF("doc_id"), "doc_id"))
      .collect().map(f => (f.doc_id, f.frame_idx) -> f).toMap
    ids.foreach { id =>
      (0 to (1 + id % 3).toInt).foreach { fi =>
        val fid = id + fi
        val (w, h) = ((8 + fid % 9).toInt, (8 + fid % 7).toInt)
        val f = got((id, fi))
        assert(f.width === w && f.height === h && f.n_bytes === w * h * 3)
        var (s1, s2) = (0L, 0L)
        (0 until w * h * 3).foreach { i =>
          val v = Multimodal.syntheticPixel(fid, i).toLong
          s1 += (i + 1) * v; s2 += (i + 1).toLong * (i + 1) * v
        }
        assert(f.sum1 === s1 && f.sum2 === s2, s"doc $id frame $fi")
      }
    }
  }

  test("MJPG: real JDK-encoded JPEG frames demux byte-exact and decode per frame (lossy codec — spec-pinned, PNG path carries the oracle)") {
    def jpegFrame(id: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        val base = (y * w + x) * 3
        img.setRGB(x, y,
          (Multimodal.syntheticPixel(id, base) << 16) |
            (Multimodal.syntheticPixel(id, base + 1) << 8) |
            Multimodal.syntheticPixel(id, base + 2))
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val frames = Seq(jpegFrame(1L, 32, 24), jpegFrame(2L, 32, 24), jpegFrame(3L, 32, 24))
    assert(frames.forall(f => (f(0) & 0xFF) == 0xFF && (f(1) & 0xFF) == 0xD8),
      "JDK encoder must emit real JPEG (SOI marker)")
    val avi = Multimodal.renderAvi(frames, handler = "MJPG")
    assert(Multimodal.isAvi(avi))
    // the demux is codec-agnostic: exact JPEG bytes back, in order
    assert(Multimodal.aviFrames(5L, avi).map(_.toSeq) === frames.map(_.toSeq))
    // per-frame decode through the same javax.imageio path: right
    // dims/buffer sizes, and DETERMINISTIC checksums (decode twice)
    val df = Seq((5L, avi)).toDF("doc_id", "payload")
    def decode() = Multimodal.videoFrameDecode(df).collect()
      .sortBy(_.frame_idx).map(f => (f.frame_idx, f.width, f.height, f.n_bytes, f.sum1, f.sum2)).toSeq
    val d1 = decode()
    assert(d1.map(t => (t._1, t._2, t._3, t._4)) ===
      Seq((0, 32, 24, 32 * 24 * 3), (1, 32, 24, 32 * 24 * 3), (2, 32, 24, 32 * 24 * 3)))
    assert(d1 === decode())
    // the signature pass runs over MJPG payloads too (distinct frames
    // hash distinctly here; lossy content, so no cross-engine oracle)
    val sigs = Multimodal.videoFrameSet(df).collect()
    assert(sigs.length === 3 && sigs.forall(_.nf === 3))
  }

  test("mixed-container corpus: videoFrameSet and videoFrameHashes agree across AVI and legacy payloads; transcode preserves the container") {
    val aviDf = Multimodal.syntheticAviVideos(Seq(2L, 3L).toDF("doc_id"), "doc_id")
    val legDf = Multimodal.syntheticVideos(Seq(4L, 5L).toDF("doc_id"), "doc_id")
    val mixed = aviDf.unionByName(legDf)
    val viaSet = Multimodal.videoFrameSet(mixed).toDF()
      .select("doc_id", "fp").as[(Long, String)].collect().toSet
    val viaHashes = Multimodal.videoFrameHashes(mixed).toDF()
      .select("doc_id", "dhash_hex").distinct().as[(Long, String)].collect().toSet
    assert(viaSet === viaHashes)
    assert(viaSet.map(_._1) === Set(2L, 3L, 4L, 5L))
    // transcode: AVI in -> AVI out, legacy in -> legacy out; frame
    // hashes unchanged (floor-division composition)
    val t = Multimodal.reencodeScaledVideo(mixed, factor = 2, idOffset = 100L)
      .as[(Long, Array[Byte])].collect().toMap
    assert(Multimodal.isAvi(t(102L)) && Multimodal.isAvi(t(103L)))
    assert(!Multimodal.isAvi(t(104L)) && !Multimodal.isAvi(t(105L)))
    val tSet = Multimodal.videoFrameSet(
        Multimodal.reencodeScaledVideo(mixed, factor = 2, idOffset = 100L)).toDF()
      .select("doc_id", "fp").as[(Long, String)].collect()
      .map { case (id, fp) => (id - 100L, fp) }.toSet
    assert(tSet === viaSet)
  }

  private val samplesGen: Gen[Array[Int]] =
    Gen.listOf(Gen.choose(-32768, 32767)).map(_.toArray)

  test("property: aviDemux is a left inverse of renderAviAv — frames AND soundtrack, bare and rec-grouped interleave") {
    val prop = Prop.forAll(Gen.listOf(frameGen), samplesGen, Gen.oneOf(false, true)) {
      (frames, samples, rec) =>
        val avi = Multimodal.renderAviAv(frames, samples, recGroups = rec)
        val c = Multimodal.aviDemux(9L, avi)
        val gotSamples = Array.tabulate(c.audio.get.pcm.length / 2) { i =>
          ((c.audio.get.pcm(i * 2) & 0xFF) | (c.audio.get.pcm(i * 2 + 1) << 8)).toShort.toInt
        }
        Multimodal.isAvi(avi) &&
          c.frames.map(_.toSeq) == frames.map(_.toSeq) &&
          c.audio.get.sample_rate == 8000 && c.audio.get.channels == 1 &&
          c.audio.get.bits == 16 && c.audio.get.block_align == 2 &&
          gotSamples.toSeq == samples.toSeq &&
          // the video projection still works and skips the soundtrack
          Multimodal.aviFrames(9L, avi).map(_.toSeq) == frames.map(_.toSeq)
    }
    check("a/v round-trip", prop)
  }

  test("a/v strictness: audio byte-count lies fail loud; video-only AVIs have no audio; WAV bridge decodes the soundtrack") {
    val frames = Seq(Multimodal.syntheticPng(3L, 8, 8))
    val samples = Array.tabulate(100)(i => Multimodal.syntheticSample(3L, i))
    val avi = Multimodal.renderAviAv(frames, samples)
    // corrupt the auds strh dwLength (samples): find the auds fourcc
    // and patch its strh dwLength field (+32 into the strh data)
    val idx = avi.indexOfSlice("auds".getBytes("US-ASCII"))
    assert(idx > 0)
    val bad = avi.clone()
    bad(idx + 32) = (bad(idx + 32) + 1).toByte
    val e = intercept[IllegalArgumentException] { Multimodal.aviDemux(3L, bad) }
    assert(e.getMessage.contains("auds strh declares"), e.getMessage)
    // video-only container: no audio stream surfaced, bridge fails loud
    val plain = Multimodal.renderAvi(frames)
    assert(Multimodal.aviDemux(3L, plain).audio.isEmpty)
    val none = intercept[IllegalArgumentException] { Multimodal.aviAudioWav(3L, plain) }
    assert(none.getMessage.contains("no audio stream"))
    // the WAV bridge: real JDK decode of the re-wrapped soundtrack
    // reproduces the formula samples — audio dedup can admit from an
    // A/V capture
    val wavDf = Multimodal.extractAviAudio(
      Seq((3L, avi)).toDF("doc_id", "payload"))
    val dec = Multimodal.decodeAudio(wavDf).collect().head
    assert(dec.n_samples === 100L && dec.sample_rate === 8000)
    var (s1, s2) = (0L, 0L)
    samples.zipWithIndex.foreach { case (v, i) =>
      s1 += (i + 1).toLong * v; s2 += (i + 1).toLong * (i + 1) * v
    }
    assert(dec.sum1 === s1 && dec.sum2 === s2)
    // fingerprints from the container match fingerprints from the
    // same PCM as a first-class WAV: one capture feeds both dedup paths
    val direct = Multimodal.audioFingerprint(
      Seq((3L, Multimodal.syntheticWav(3L, 100))).toDF("doc_id", "payload"))
      .collect().head
    val bridged = Multimodal.audioFingerprint(wavDf).collect().head
    assert(bridged.afp === direct.afp && bridged.afp_hex === direct.afp_hex)
  }

  test("pipeline extract_audio -> dedup_audio: audio dedup admits from real A/V containers (and passthrough WAVs)") {
    import java.nio.file.Files
    val (src, out) = (Files.createTempDirectory("graft-av-src").toString,
      Files.createTempDirectory("graft-av-out").toString)
    def frames(seed: Long) = Seq(Multimodal.syntheticPng(seed, 8, 8))
    val samples = Array.tabulate(120)(i => Multimodal.syntheticSample(7L, i))
    val attenuated = samples.map(_ / 2) // near-dup copy (fingerprint-close)
    val distinct = Array.tabulate(120)(i => Multimodal.syntheticSampleVaried(99L, i))
    Seq(
      // docs 1+2: different VIDEO, near-identical soundtrack -> audio dedup pairs them
      (1L, Multimodal.renderAviAv(frames(1L), samples)),
      (2L, Multimodal.renderAviAv(frames(2L), attenuated, recGroups = true)),
      // doc 3: distinct soundtrack inside a container
      (3L, Multimodal.renderAviAv(frames(3L), distinct)),
      // doc 4: a first-class WAV rides through the passthrough
      // (varied-formula content so its fingerprint is far from 1-3)
      (4L, Multimodal.aviAudioWav(4L, Multimodal.renderAviAv(frames(4L),
        Array.tabulate(120)(i => Multimodal.syntheticSampleVaried(55L, i))))),
      // doc 5: an MP4 capture whose soundtrack near-dups doc 3's AVI —
      // the mixed-corpus case: one chain admits BOTH container families
      (5L, Multimodal.renderMp4(frames(5L), distinct.map(_ / 2))))
      .toDF("doc_id", "payload").write.parquet(s"$src/captures.parquet")
    val y = Files.createTempFile("graft-pipe-av", ".yaml")
    Files.writeString(y,
      """pipeline: av_audio_dedup
        |id: doc_id
        |text: payload
        |steps:
        |  - name: soundtracks
        |    op: extract_audio
        |    input: captures
        |    params: { passthroughWav: "true" }
        |  - name: deduped
        |    op: dedup_audio
        |    params: { maxHamming: "6" }
        |""".stripMargin)
    Cli.run(Seq("pipeline", y.toString, src, out), spark)
    val kept = spark.read.parquet(s"$out/deduped")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the attenuated-copy container (doc 2) deduped against doc 1 and
    // the MP4's attenuated soundtrack (doc 5) against doc 3's AVI —
    // cross-container audio dedup; the distinct AVI and the WAV survive
    assert(kept === Set(1L, 3L, 4L), s"got $kept")
    // a container WITHOUT audio fails loud with the doc id
    Seq((9L, Multimodal.renderAvi(frames(9L))))
      .toDF("doc_id", "payload").write.parquet(s"$src/noaudio.parquet")
    val y2 = Files.createTempFile("graft-pipe-av2", ".yaml")
    Files.writeString(y2,
      """pipeline: av_bad
        |id: doc_id
        |text: payload
        |steps:
        |  - name: soundtracks
        |    op: extract_audio
        |    input: noaudio
        |""".stripMargin)
    val e = intercept[Exception] {
      Cli.run(Seq("pipeline", y2.toString, src, Files.createTempDirectory("graft-av-out2").toString), spark)
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("doc 9") && chain.contains("no audio stream"), chain)
  }
}
