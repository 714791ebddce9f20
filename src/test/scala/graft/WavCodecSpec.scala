package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.WavCodec

/** The pure-JVM PCM WAV codec behind q31c. The decoder must be REAL —
  * agree with an independent reader of the same container bytes — so
  * the load-bearing tests cross-validate every decoded feature against
  * `javax.sound.sampled.AudioSystem`'s own WAV reader (JDK java.desktop
  * module; no audio device needed for parsing).
  */
class WavCodecSpec extends AnyFunSuite {

  private def decodeViaJavaSound(
      bytes: Array[Byte]): (Int, Int, Long, Long, Long, Int) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getEncoding ==
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
    assert(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
    val channels = fmt.getChannels
    val nFrames = in.getFrameLength
    val data = in.readAllBytes()
    assert(data.length == nFrames * channels * 2)
    var sl = 0L; var sr = 0L; var peak = 0
    for (f <- 0L until nFrames; c <- 0 until channels) {
      val base = (f * channels + c).toInt * 2
      val v = (data(base) & 0xFF) | (data(base + 1).toInt << 8)
      val a = math.abs(v)
      if (c == 0) sl += a else if (c == 1) sr += a
      peak = math.max(peak, a)
    }
    (channels, fmt.getSampleRate.toInt, nFrames, sl, sr, peak)
  }

  private def features(row: org.apache.spark.sql.catalyst.InternalRow) =
    (row.getInt(0), row.getInt(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getInt(5))

  test("decode agrees with javax.sound.sampled on every feature, several shapes") {
    for ((seed, rate, nf) <- Seq((1L, 8000, 64), (7L, 16000, 96),
        (42L, 24000, 160), (123L, 44100, 1), (9999L, 48000, 333))) {
      val bytes = WavCodec.encode(seed, rate, nf)
      val row = WavCodec.decode(bytes)
      assert(row != null, s"decode refused own encode ($seed,$rate,$nf)")
      assert(features(row) === decodeViaJavaSound(bytes), s"($seed,$rate,$nf)")
    }
  }

  test("decode skips a foreign chunk between fmt and data (and matches JavaSound)") {
    // splice an odd-sized LIST chunk (forcing the word-alignment pad
    // byte) where real files carry metadata — a chunk walker must skip
    // it; a fixed-44-byte-offset reader breaks here
    val orig = WavCodec.encode(11L, 16000, 80)
    val junk = Array[Byte]('x', 'y', 'z') // odd size -> 1 pad byte
    val b = java.nio.ByteBuffer
      .allocate(orig.length + 8 + junk.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(orig, 0, 36) // RIFF hdr + fmt chunk
    b.put("LIST".getBytes("US-ASCII")).putInt(junk.length)
      .put(junk).put(0.toByte)
    b.put(orig, 36, orig.length - 36) // data chunk
    val spliced = b.array()
    // fix the RIFF size field (bytes 4-7): total - 8
    val riffSize = spliced.length - 8
    for (i <- 0 until 4)
      spliced(4 + i) = ((riffSize >> (8 * i)) & 0xFF).toByte
    val row = WavCodec.decode(spliced)
    assert(row != null, "chunk walker failed on a LIST chunk")
    assert(features(row) === decodeViaJavaSound(spliced))
    // and the splice changed nothing audible
    assert(features(row) === features(WavCodec.decode(orig)))
  }

  test("malformed inputs decode to NULL, never throw") {
    val good = WavCodec.encode(1L, 8000, 64)
    val truncated = java.util.Arrays.copyOf(good, good.length - 10)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    val badWave = good.clone(); badWave(8) = 'Z'.toByte
    val nonPcm = good.clone(); nonPcm(20) = 3.toByte // IEEE float tag
    val bad8bit = good.clone(); bad8bit(34) = 8.toByte // bits/sample
    val badAlign = good.clone(); badAlign(32) = 3.toByte // blockAlign
    val hugeData = good.clone() // data size beyond the payload
    hugeData(40) = 0xFF.toByte; hugeData(41) = 0xFF.toByte
    for (b <- Seq(null, Array.empty[Byte], Array[Byte](1, 2, 3),
        truncated, badMagic, badWave, nonPcm, bad8bit, badAlign, hugeData))
      assert(WavCodec.decode(b) == null)
  }

  test("interpreted eval and whole-stage codegen agree (and stay codegen'd)") {
    // parquet-backed input — a local Seq would be constant-folded by
    // ConvertToLocalRelation and never reach codegen
    val spark = TestSpark.spark
    val df = Tables.load(spark, TestSpark.sf0001, "documents")
      .orderBy("doc_id").limit(3)
      .selectExpr("doc_id", "wav_decode(wav_encode(doc_id, 16000, 64)) AS au")
      .selectExpr("doc_id", "au.channels", "au.sample_rate", "au.n_frames",
        "au.sum_abs_l", "au.sum_abs_r", "au.peak_abs")
    val viaPlan = df.collect().map(_.toSeq).toSeq
    val expected = viaPlan.map(_.head.asInstanceOf[Long]).map { s =>
      val r = WavCodec.decode(WavCodec.encode(s, 16000, 64))
      Seq(s, r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))
    }
    assert(viaPlan === expected)
    // under AQE the executed-plan string marks codegen'd operators with
    // a `*(stageId)` prefix — the decode Project must carry the star
    val plan = df.queryExecution.executedPlan.toString
    val decodeLine = plan.linesIterator.find(_.contains("wav_decode"))
      .getOrElse(fail(s"no wav_decode operator in plan:\n$plan"))
    assert(decodeLine.contains("*("),
      s"wav_decode fell out of whole-stage codegen:\n$plan")
  }
}
