package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{AviCodec, BmpCodec}

/** The pure-JVM DIB-in-AVI video codec behind q31d. No JDK module reads
  * AVI, so the cross-witness runs through the PIXEL GRID instead of the
  * container: frame f's channel formula (seed·31 + f·13 + j·7) mod 256
  * equals BmpCodec's (seed'·31 + j·7) mod 256 for
  * seed' = (seed·31 + f·13)·223 mod 256 (223 = 31⁻¹ mod 256), so every
  * frame the AVI chunk walk extracts must match what javax.imageio's
  * independent BMP reader sees in the BMP rendering of the same grid —
  * two containers, two parsers, one set of sums.
  */
class AviCodecSpec extends AnyFunSuite {

  private def sumsViaImageIO(bmp: Array[Byte]): (Long, Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img != null, "javax.imageio has no BMP reader in this JVM?")
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      sr += (rgb >> 16) & 0xFF
      sg += (rgb >> 8) & 0xFF
      sb += rgb & 0xFF
    }
    (sr, sg, sb)
  }

  private def frameRows(bytes: Array[Byte], stride: Int) =
    AviCodec.frames(bytes, stride).toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  private def putI32(a: Array[Byte], off: Int, v: Int): Unit =
    for (i <- 0 until 4) a(off + i) = ((v >> (8 * i)) & 0xFF).toByte

  /** Truncate to `len` bytes and re-fix the RIFF and movi LIST size
    * fields so the header stays well-formed (the cut lands inside the
    * movi payload, like an interrupted upload). */
  private def truncateInMovi(orig: Array[Byte], len: Int): Array[Byte] = {
    val cut = java.util.Arrays.copyOf(orig, len)
    putI32(cut, 4, cut.length - 8)
    val moviTag = new String(orig, "ISO-8859-1").indexOf("movi")
    assert(moviTag > 0 && moviTag < len)
    putI32(cut, moviTag - 4, cut.length - moviTag)
    cut
  }

  test("every frame agrees with javax.imageio on the equivalent BMP grid") {
    // widths cover all four row-padding cases (w*3 mod 4)
    for ((seed, w, h, nf) <- Seq((1L, 8, 6, 4), (7L, 9, 5, 3),
        (42L, 10, 3, 7), (123L, 11, 7, 1), (9999L, 13, 4, 5))) {
      val avi = AviCodec.encode(seed, w, h, nf)
      val rows = frameRows(avi, 1)
      assert(rows.map(_._1) === (0 until nf), s"frame indices ($seed)")
      for ((idx, sr, sg, sb) <- rows) {
        val witnessSeed = ((seed * 31 + idx * 13) % 256 * 223) % 256
        val bmp = BmpCodec.encode(witnessSeed, w, h)
        assert((sr, sg, sb) === sumsViaImageIO(bmp),
          s"frame $idx of ($seed,${w}x$h×$nf) disagrees with ImageIO")
      }
    }
  }

  test("meta parses header facts without touching frame bytes") {
    val avi = AviCodec.encode(5L, 12, 9, 6)
    val m = AviCodec.meta(avi)
    assert(m != null)
    assert((m.getInt(0), m.getInt(1), m.getInt(2)) === ((12, 9, 6)))
    assert(m.getInt(3) === 40000) // 25 fps
    // header-only: truncate INSIDE the movi payload — meta must still
    // parse (a full-file reader would refuse)
    val cut = truncateInMovi(avi, avi.length - 20)
    assert(AviCodec.meta(cut) != null)
  }

  test("chunk walk skips foreign chunks in movi (audio frames, junk)") {
    val orig = AviCodec.encode(11L, 8, 6, 4)
    val before = frameRows(orig, 1)
    // splice an odd-sized JUNK chunk (forcing the word-alignment pad
    // byte) and a fake `01wb` audio frame in front of the 00db frames —
    // an index-arithmetic reader breaks here, a chunk walker must skip
    val junk = Array[Byte]('j', 'n', 'k') // odd size -> 1 pad byte
    val wb = Array[Byte](1, 2, 3, 4)
    val extra = 8 + junk.length + 1 + 8 + wb.length
    val moviPayload = {
      // locate "movi": the LIST form right after the hdrl LIST
      val s = new String(orig, "ISO-8859-1")
      s.indexOf("movi")
    }
    assert(moviPayload > 0)
    val insertAt = moviPayload + 4 // before the first 00db chunk
    val b = java.nio.ByteBuffer.allocate(orig.length + extra)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(orig, 0, insertAt)
    b.put("JUNK".getBytes("US-ASCII")).putInt(junk.length)
      .put(junk).put(0.toByte)
    b.put("01wb".getBytes("US-ASCII")).putInt(wb.length).put(wb)
    b.put(orig, insertAt, orig.length - insertAt)
    val spliced = b.array()
    // fix RIFF size (offset 4) and the movi LIST size (4 bytes before
    // the "movi" form tag)
    val riffSize = spliced.length - 8
    for (i <- 0 until 4)
      spliced(4 + i) = ((riffSize >> (8 * i)) & 0xFF).toByte
    val moviSizeOff = moviPayload - 4
    val oldMovi = (spliced(moviSizeOff) & 0xFF) |
      ((spliced(moviSizeOff + 1) & 0xFF) << 8) |
      ((spliced(moviSizeOff + 2) & 0xFF) << 16) |
      ((spliced(moviSizeOff + 3) & 0xFF) << 24)
    val newMovi = oldMovi + extra
    for (i <- 0 until 4)
      spliced(moviSizeOff + i) = ((newMovi >> (8 * i)) & 0xFF).toByte
    assert(frameRows(spliced, 1) === before,
      "foreign movi chunks changed the decoded frames")
    assert(AviCodec.meta(spliced) != null)
  }

  test("stride sampling picks every k-th frame with true indices") {
    val avi = AviCodec.encode(3L, 8, 6, 10)
    val all = frameRows(avi, 1)
    assert(frameRows(avi, 2) === all.filter(_._1 % 2 == 0))
    assert(frameRows(avi, 3) === all.filter(_._1 % 3 == 0))
    assert(frameRows(avi, 100) === all.take(1))
  }

  test("malformed inputs yield NULL meta / zero frames, never throw") {
    val good = AviCodec.encode(1L, 8, 6, 4)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    val badForm = good.clone(); badForm(8) = 'Z'.toByte
    val notDib = good.clone() // strh handler fourcc: 'DIB ' -> 'XVID'
    val strh = new String(good, "ISO-8859-1").indexOf("vids")
    assert(strh > 0)
    System.arraycopy("XVID".getBytes("US-ASCII"), 0, notDib, strh + 4, 4)
    val bpp32 = good.clone() // strf biBitCount: 24 -> 32
    val strf = new String(good, "ISO-8859-1").indexOf("strf")
    assert(strf > 0)
    bpp32(strf + 8 + 14) = 32.toByte
    val compressed = good.clone() // strf biCompression: 0 -> 1
    compressed(strf + 8 + 16) = 1.toByte
    val truncated = java.util.Arrays.copyOf(good, 40) // inside hdrl
    for (b <- Seq(null, Array.empty[Byte], Array[Byte](1, 2, 3),
        badMagic, badForm, notDib, bpp32, compressed, truncated)) {
      assert(AviCodec.meta(b) == null)
      assert(AviCodec.frames(b, 1).isEmpty)
    }
    // truncated mid-frame: meta still parses, frames stop cleanly
    val cutFrame = truncateInMovi(good, good.length - 10)
    assert(AviCodec.meta(cutFrame) != null)
    assert(AviCodec.frames(cutFrame, 1).size < 4)
  }

  test("SQL surface: meta stays codegen'd, generator matches direct calls") {
    val spark = TestSpark.spark
    Tables.load(spark, TestSpark.sf0001, "documents")
      .createOrReplaceTempView("avi_docs")
    // materialize the encodes to parquet first: the production shape is
    // decode-over-STORED-bytes (avi_encode itself is CodegenFallback by
    // design — a real pipeline never runs it in the hot path), and only
    // the stored-bytes shape lets the decode Project stay codegen'd
    val tmp = java.nio.file.Files.createTempDirectory("avi-codegen").toString
    spark.sql("""SELECT doc_id, avi_encode(doc_id, 8, 6, 4) AS av
                 FROM avi_docs ORDER BY doc_id LIMIT 3""")
      .write.mode("overwrite").parquet(tmp)
    val metaDf = spark.read.parquet(tmp)
      .selectExpr("doc_id", "avi_meta(av) AS m").orderBy("doc_id")
    val metaRows = metaDf.collect().map(r =>
      (r.getLong(0), r.getStruct(1).getInt(0), r.getStruct(1).getInt(1),
        r.getStruct(1).getInt(2)))
    assert(metaRows.forall { case (_, w, h, n) => (w, h, n) == ((8, 6, 4)) })
    val plan = metaDf.queryExecution.executedPlan.toString
    val metaLine = plan.linesIterator.find(_.contains("avi_meta"))
      .getOrElse(fail(s"no avi_meta operator in plan:\n$plan"))
    assert(metaLine.contains("*("),
      s"avi_meta fell out of whole-stage codegen:\n$plan")

    val genRows = spark.sql(
      """SELECT doc_id, frame_idx, sum_r, sum_g, sum_b
         FROM (SELECT doc_id, avi_encode(doc_id, 8, 6, 4) AS av
               FROM avi_docs ORDER BY doc_id LIMIT 3)
         LATERAL VIEW avi_frames(av, 2) g AS frame_idx, sum_r, sum_g, sum_b
         ORDER BY doc_id, frame_idx""").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val expected = genRows.map(_._1).distinct.flatMap { seed =>
      frameRows(AviCodec.encode(seed, 8, 6, 4), 2)
        .map(f => (seed, f._1, f._2, f._3, f._4))
    }
    assert(genRows.toSeq === expected.toSeq.sorted)
  }
}
