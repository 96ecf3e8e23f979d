package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Multimodal

/** The Matroska/WebM (EBML) mux/demux: demux ∘ render = id for
  * arbitrary block bytes on both PCM byte orders
  * (`A_PCM/INT/LIT`/`A_PCM/INT/BIG`), strict fail-loud on structural
  * corruption (truncated elements, malformed VINTs, unknown-size
  * elements, lacing, undeclared tracks, duplicate track numbers), the
  * soundtrack bridge into the JDK WAV path, and three-way container
  * dispatch (`demuxFrames`/`containerAudioWav` route WebM beside AVI
  * and MP4). */
class WebmSpec extends SparkSpec {

  private def check(name: String, prop: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  private val frameGen: Gen[Array[Byte]] = Gen.oneOf(
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
    // frames that LOOK like EBML structure must still round-trip
    Gen.const(Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte, 0xA3.toByte, 0x81.toByte)),
    Gen.const(Array.emptyByteArray),
    Gen.listOfN(1, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  private val samplesGen: Gen[Array[Int]] =
    Gen.listOf(Gen.choose(-32768, 32767)).map(_.toArray)

  private def wavOf(samples: Array[Int], rate: Int): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      pcm(2 * i) = samples(i).toByte; pcm(2 * i + 1) = (samples(i) >> 8).toByte
    }
    val f = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), f, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("property: webmDemux is a left inverse of renderWebm — frames, soundtrack, and track metadata — on both PCM byte orders") {
    val prop = Prop.forAll(
      Gen.listOf(frameGen), samplesGen, Gen.oneOf(true, false)) { (frames, samples, be) =>
      val webm = Multimodal.renderWebm(frames, samples, bigEndianAudio = be)
      val content = Multimodal.webmDemux(7L, webm)
      val vide = content.tracks.find(_.track_type == 1).get
      val soun = content.tracks.find(_.track_type == 2).get
      Multimodal.isWebm(webm) &&
        content.timestampScale == 1000000L &&
        vide.codec == "V_PNG" &&
        soun.codec == (if (be) "A_PCM/INT/BIG" else "A_PCM/INT/LIT") &&
        soun.audio.contains(Multimodal.WebmAudioFmt(1, 16, 8000)) &&
        vide.blocks.map(_.toSeq) == frames.map(_.toSeq) &&
        Multimodal.webmFrames(7L, webm).map(_.toSeq) == frames.map(_.toSeq) &&
        Multimodal.demuxFrames(7L, webm).map(_.toSeq) == frames.map(_.toSeq) &&
        Multimodal.webmAudioWav(7L, webm).toSeq == wavOf(samples, 8000).toSeq &&
        Multimodal.containerAudioWav(7L, webm).toSeq == wavOf(samples, 8000).toSeq
    }
    check("webm round-trip", prop)
  }

  test("property: arbitrary corruption of a rendered WebM either parses to the declared block counts or raises — never silently drops media") {
    val frames = Seq("frame one".getBytes("UTF-8"), "f2".getBytes("UTF-8"),
      Array.tabulate(33)(_.toByte))
    val samples = Array.tabulate(37)(i => i * 991 - 17000)
    val webm = Multimodal.renderWebm(frames, samples)
    val prop = Prop.forAll(
      Gen.choose(0, webm.length - 1), Gen.choose(1, 255)) { (pos, x) =>
      val dam = webm.clone(); dam(pos) = (dam(pos) ^ x).toByte
      try {
        // EBML's skip-unknown contract makes the MP4 invariant
        // ("declared counts or raise") unreachable here: a flipped
        // ELEMENT ID legally drops that one element, and a flipped
        // SIZE can swallow exactly one sibling (moving its bytes
        // between tracks, +header slack). What can NEVER happen on a
        // successful parse: media appearing from nowhere. Total block
        // count and total block byte volume are bounded by the
        // original content plus one element header of slack.
        val c = Multimodal.webmDemux(7L, dam)
        val totalBytes = c.tracks.map(_.blocks.map(_.length).sum).sum
        val totalCount = c.tracks.map(_.blocks.size).sum
        totalCount <= frames.size + 3 /* audio blocks */ &&
          totalBytes <= frames.map(_.length).sum + samples.length * 2 + 16
      } catch { case _: IllegalArgumentException => true }
    }
    check("webm corruption", prop, n = 200)
  }

  test("structural fail-loud: truncation, unknown-size, lacing, undeclared track, duplicate tracks, BlockGroup, non-EBML bytes") {
    val frames = Seq("aa".getBytes("UTF-8"), "bbb".getBytes("UTF-8"))
    val samples = Array.tabulate(9)(i => i * 331 - 1200)
    val webm = Multimodal.renderWebm(frames, samples)
    // truncated payload: the trailing cluster no longer fits its size
    val eTrunc = intercept[IllegalArgumentException] {
      Multimodal.webmDemux(1L, webm.dropRight(3))
    }
    assert(eTrunc.getMessage.contains("runs past") ||
      eTrunc.getMessage.contains("truncated"), eTrunc.getMessage)
    def indexOf(pat: Array[Byte], skip: Int = 0): Int =
      (0 to webm.length - pat.length).iterator
        .filter(i => pat.indices.forall(j => webm(i + j) == pat(j)))
        .drop(skip).nextOption().getOrElse(fail("pattern not found"))
    // Segment id is 0x18538067; its size VINT follows — overwrite the
    // size with the 1-byte all-ones (unknown-size) pattern: strict
    // tiling refuses
    val segIdx = indexOf(Array(0x18, 0x53, 0x80.toByte, 0x67))
    val unk = webm.clone()
    // the renderer emits a multi-byte size here; force width-1 unknown
    // (0xFF) and let the now-mis-tiled tree raise either way
    unk(segIdx + 4) = 0xFF.toByte
    val eUnk = intercept[IllegalArgumentException](Multimodal.webmDemux(1L, unk))
    assert(eUnk.getMessage.contains("unknown-size") ||
      eUnk.getMessage.contains("runs past"), eUnk.getMessage)
    // a laced SimpleBlock raises: find the first video SimpleBlock
    // (id 0xA3) and set a lacing bit in its flags byte. The payload
    // is [0x81 track][2B reltime][flags][frame "aa"], so the block
    // content is 6 bytes: locate "aa" and back up one byte.
    val aa = indexOf("aa".getBytes("US-ASCII"))
    val laced = webm.clone()
    laced(aa - 1) = (laced(aa - 1) | 0x02).toByte
    val eLace = intercept[IllegalArgumentException](Multimodal.webmDemux(1L, laced))
    assert(eLace.getMessage.contains("lacing unsupported"), eLace.getMessage)
    // a block naming an undeclared track raises: track VINT 0x81 -> 0x83
    val undeclared = webm.clone()
    undeclared(aa - 4) = 0x83.toByte
    val eTrack = intercept[IllegalArgumentException](Multimodal.webmDemux(1L, undeclared))
    assert(eTrack.getMessage.contains("undeclared track"), eTrack.getMessage)
    // track 127 encoded minimally as 0xFF is a LEGAL VINT — RFC 8794's
    // all-ones (unknown-size) reservation applies to element SIZES
    // only, so this must parse as a track number and fail as
    // undeclared, never as "unknown-size"
    val t127 = webm.clone()
    t127(aa - 4) = 0xFF.toByte
    val e127 = intercept[IllegalArgumentException](Multimodal.webmDemux(1L, t127))
    assert(e127.getMessage.contains("undeclared track 127"), e127.getMessage)
    // non-EBML bytes refuse
    val eMagic = intercept[IllegalArgumentException] {
      Multimodal.webmDemux(1L, "RIFFxxxxAVI ".getBytes("US-ASCII") ++ new Array[Byte](20))
    }
    assert(eMagic.getMessage.contains("not an EBML"), eMagic.getMessage)
    // an audio codec that is not raw PCM refuses the WAV bridge by
    // codec name: A_PCM/INT/LIT -> A_VORBIS-length rewrite is fiddly;
    // flip one codec byte instead (A_PCM -> A_QCM)
    val pcmIdx = indexOf("A_PCM/INT/LIT".getBytes("US-ASCII"))
    val vorb = webm.clone()
    vorb(pcmIdx + 2) = 'Q'.toByte
    val eCodec = intercept[IllegalArgumentException](Multimodal.webmAudioWav(1L, vorb))
    assert(eCodec.getMessage.contains("A_PCM/INT/LIT"), eCodec.getMessage)
    // duplicate track numbers raise: append a copy of the video
    // TrackEntry inside Tracks — simpler via render-level check:
    // two tracks share number 1 when the audio TrackNumber byte is
    // rewritten from 2 to 1 (TrackNumber element: 0xD7 0x81 0x02)
    val tnIdx = indexOf(Array(0xD7.toByte, 0x81.toByte, 0x02.toByte))
    val dup = webm.clone()
    dup(tnIdx + 2) = 0x01.toByte
    val eDup = intercept[IllegalArgumentException](Multimodal.webmDemux(1L, dup))
    assert(eDup.getMessage.contains("duplicate track numbers") ||
      eDup.getMessage.contains("undeclared track"), eDup.getMessage)
  }

  test("the A/V checksum pass dispatches WebM beside AVI and MP4: same content, same checksums") {
    import spark.implicits._
    val ids = Seq(3L, 4L, 7L).toDF("doc_id")
    def sums(df: org.apache.spark.sql.DataFrame): Map[Long, (Int, Long, Long, Long, Long)] =
      Multimodal.avContentChecksums(df).collect()
        .map(c => c.doc_id -> ((c.n_frames, c.v_sum, c.n_samples, c.a_sum1, c.a_sum2)))
        .toMap
    val viaAvi  = sums(Multimodal.syntheticAvVideos(ids, "doc_id"))
    val viaMp4  = sums(Multimodal.syntheticMp4Videos(ids, "doc_id"))
    val viaWebm = sums(Multimodal.syntheticWebmVideos(ids, "doc_id"))
    assert(viaAvi === viaWebm && viaMp4 === viaWebm,
      "the same A/V content must checksum identically through all three containers")
    // and a MIXED corpus dedups in one chain: the audio path is
    // container-transparent, so a WebM doc and an AVI doc with the
    // same id produce byte-identical WAV bridges
    val wavAvi = Multimodal.extractAviAudio(
      Multimodal.syntheticAvVideos(ids, "doc_id")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val webmPayloads = Multimodal.syntheticWebmVideos(ids, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    webmPayloads.foreach { case (id, b) =>
      assert(Multimodal.containerAudioWav(id, b).toSeq === wavAvi(id),
        s"doc $id: WebM soundtrack bridge must equal the AVI bridge")
    }
  }
}
