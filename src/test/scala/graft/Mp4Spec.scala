package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Multimodal

/** The ISO-BMFF (MP4) mux/demux: demux ∘ render = id for arbitrary
  * sample bytes on both chunk-offset forms (`stco`/`co64`), strict
  * fail-loud on structural corruption (truncated boxes, sample-table
  * disagreement, samples escaping `mdat`, duplicate `moov`), the
  * soundtrack bridge into the JDK WAV path, and container dispatch
  * (`demuxFrames`/`containerAudioWav` route MP4 beside AVI). */
class Mp4Spec extends SparkSpec {

  private def check(name: String, prop: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  private val frameGen: Gen[Array[Byte]] = Gen.oneOf(
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
    // frames that LOOK like box structure must still round-trip
    Gen.const("ftypmoovmdat".getBytes("US-ASCII")),
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

  test("property: mp4Demux is a left inverse of renderMp4 — frames, soundtrack, and track metadata — on both stco and co64") {
    val prop = Prop.forAll(
      Gen.listOf(frameGen), samplesGen, Gen.oneOf(true, false)) { (frames, samples, wide) =>
      val mp4 = Multimodal.renderMp4(frames, samples, useCo64 = wide)
      val content = Multimodal.mp4Demux(7L, mp4)
      val vide = content.tracks.find(_.handler == "vide").get
      val soun = content.tracks.find(_.handler == "soun").get
      Multimodal.isMp4(mp4) &&
        vide.codec == "png " && soun.codec == "twos" &&
        soun.audio.contains(Multimodal.Mp4AudioFmt(1, 16, 8000)) &&
        vide.samples.map(_.toSeq) == frames.map(_.toSeq) &&
        Multimodal.mp4Frames(7L, mp4).map(_.toSeq) == frames.map(_.toSeq) &&
        Multimodal.demuxFrames(7L, mp4).map(_.toSeq) == frames.map(_.toSeq) &&
        Multimodal.mp4AudioWav(7L, mp4).toSeq == wavOf(samples, 8000).toSeq &&
        Multimodal.containerAudioWav(7L, mp4).toSeq == wavOf(samples, 8000).toSeq
    }
    check("mp4 round-trip", prop)
  }

  test("property: arbitrary corruption of a rendered MP4 either parses to the declared sample counts or raises — never silently drops media") {
    val frames = Seq("frame one".getBytes("UTF-8"), "f2".getBytes("UTF-8"),
      Array.tabulate(33)(_.toByte))
    val samples = Array.tabulate(37)(i => i * 991 - 17000)
    val mp4 = Multimodal.renderMp4(frames, samples)
    val prop = Prop.forAll(
      Gen.choose(0, mp4.length - 1), Gen.choose(1, 255)) { (pos, x) =>
      val dam = mp4.clone(); dam(pos) = (dam(pos) ^ x).toByte
      try {
        // damage to dead bytes (matrix, compressorname, rates) may
        // keep the parse intact, and damage INSIDE mdat changes
        // content but never counts — a successful parse must carry
        // the declared sample counts (table cross-checks make silent
        // drops impossible)
        val c = Multimodal.mp4Demux(7L, dam)
        c.tracks.find(_.handler == "vide").forall(_.samples.size == frames.size) &&
          c.tracks.find(_.handler == "soun").forall(_.samples.size == samples.length)
      } catch { case _: IllegalArgumentException => true }
    }
    check("mp4 corruption", prop, n = 200)
  }

  private def indexOfBox(b: Array[Byte], cc: String, skip: Int = 0): Int = {
    val pat = cc.getBytes("US-ASCII")
    (0 to b.length - 4).iterator
      .filter(i => pat.indices.forall(j => b(i + j) == pat(j)))
      .drop(skip)
      .nextOption()
      .getOrElse(fail(s"no '$cc' box found"))
  }

  test("structural fail-loud: truncation, table disagreement, mdat escape, duplicate moov, non-MP4 bytes") {
    val frames = Seq("aa".getBytes("UTF-8"), "bbb".getBytes("UTF-8"))
    val samples = Array.tabulate(9)(i => i * 331 - 1200)
    val mp4 = Multimodal.renderMp4(frames, samples)
    // truncated payload: the trailing moov no longer fits its size
    val eTrunc = intercept[IllegalArgumentException] {
      Multimodal.mp4Demux(1L, mp4.dropRight(3))
    }
    assert(eTrunc.getMessage.contains("runs past") ||
      eTrunc.getMessage.contains("truncated"), eTrunc.getMessage)
    // audio stsz count tampered: stts/stsz cross-check raises
    // (the audio stsz is the SECOND one; count dword at +12)
    val szIdx = indexOfBox(mp4, "stsz", skip = 1)
    val badCount = mp4.clone()
    badCount(szIdx + 15) = (badCount(szIdx + 15) ^ 0x01).toByte
    val eCount = intercept[IllegalArgumentException](Multimodal.mp4Demux(1L, badCount))
    assert(eCount.getMessage.contains("stts declares") ||
      eCount.getMessage.contains("stsc"), eCount.getMessage)
    // a chunk offset pointing far outside every mdat raises
    val coIdx = indexOfBox(mp4, "stco")
    val badOff = mp4.clone()
    badOff(coIdx + 12) = 0x7F.toByte
    val eOff = intercept[IllegalArgumentException](Multimodal.mp4Demux(1L, badOff))
    assert(eOff.getMessage.contains("outside every mdat"), eOff.getMessage)
    // a second top-level moov raises
    val mvIdx = indexOfBox(mp4, "moov")
    def be32(b: Array[Byte], p: Int): Int =
      ((b(p) & 0xFF) << 24) | ((b(p + 1) & 0xFF) << 16) |
        ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)
    val moovBox = mp4.slice(mvIdx - 4, mvIdx - 4 + be32(mp4, mvIdx - 4))
    val eDup = intercept[IllegalArgumentException] {
      Multimodal.mp4Demux(1L, mp4 ++ moovBox)
    }
    assert(eDup.getMessage.contains("exactly one moov"), eDup.getMessage)
    // non-MP4 bytes refuse
    val eMagic = intercept[IllegalArgumentException] {
      Multimodal.mp4Demux(1L, "RIFFxxxxAVI ".getBytes("US-ASCII") ++ new Array[Byte](20))
    }
    assert(eMagic.getMessage.contains("not an ISO-BMFF"), eMagic.getMessage)
    // an audio-codec container that is not raw PCM refuses the WAV
    // bridge by codec name: flip 'twos' to 'mp4a'
    val tw = indexOfBox(mp4, "twos")
    val aac = mp4.clone()
    "mp4a".getBytes("US-ASCII").zipWithIndex.foreach { case (c, i) => aac(tw + i) = c }
    val eCodec = intercept[IllegalArgumentException](Multimodal.mp4AudioWav(1L, aac))
    assert(eCodec.getMessage.contains("twos/sowt"), eCodec.getMessage)
  }

  test("the A/V checksum pass dispatches MP4 beside AVI: same content, same checksums") {
    import spark.implicits._
    val ids = Seq(3L, 4L, 7L).toDF("doc_id")
    def sums(df: org.apache.spark.sql.DataFrame): Map[Long, (Int, Long, Long, Long, Long)] =
      Multimodal.avContentChecksums(df).collect()
        .map(c => c.doc_id -> ((c.n_frames, c.v_sum, c.n_samples, c.a_sum1, c.a_sum2)))
        .toMap
    val viaAvi = sums(Multimodal.syntheticAvVideos(ids, "doc_id"))
    val viaMp4 = sums(Multimodal.syntheticMp4Videos(ids, "doc_id"))
    assert(viaAvi === viaMp4,
      "the same A/V content must checksum identically through both containers")
  }
}
