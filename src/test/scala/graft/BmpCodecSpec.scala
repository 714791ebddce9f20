package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.BmpCodec

/** The pure-JVM BMP codec behind q31b. The decoder must be REAL — i.e.
  * agree with an independent reader of the same container bytes — so
  * the load-bearing test here cross-validates every decoded feature
  * against `javax.imageio.ImageIO`'s own BMP reader (shipped with the
  * JDK's java.desktop module; no display needed for decode).
  */
class BmpCodecSpec extends AnyFunSuite {

  private def decodeViaImageIO(bytes: Array[Byte]): (Int, Int, Long, Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "javax.imageio has no BMP reader in this JVM?")
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      sr += (rgb >> 16) & 0xFF
      sg += (rgb >> 8) & 0xFF
      sb += rgb & 0xFF
    }
    (img.getWidth, img.getHeight, sr, sg, sb)
  }

  test("decode agrees with javax.imageio on every feature, several shapes") {
    // widths chosen to hit all four row-padding cases (w*3 mod 4)
    for ((seed, w, h) <- Seq((1L, 8, 6), (7L, 9, 5), (42L, 10, 3),
        (123L, 11, 7), (9999L, 20, 15), (5L, 1, 1))) {
      val bytes = BmpCodec.encode(seed, w, h)
      val row = BmpCodec.decode(bytes)
      assert(row != null, s"decode refused own encode ($seed,$w,$h)")
      val ours = (row.getInt(0), row.getInt(1),
        row.getLong(2), row.getLong(3), row.getLong(4))
      assert(ours === decodeViaImageIO(bytes), s"($seed,$w,$h)")
    }
  }

  test("decode handles a TOP-DOWN (negative height) BMP") {
    // hand-flip a bottom-up file into top-down form: negate biHeight and
    // reverse the row blocks — channel sums are row-order invariant, so
    // both orderings must decode identically (and match ImageIO)
    val w = 9; val h = 4
    val up = BmpCodec.encode(3L, w, h)
    val rowBytes = (w * 3 + 3) & ~3
    val down = up.clone()
    // biHeight at offset 22, little-endian
    val negH = -h
    down(22) = (negH & 0xFF).toByte
    down(23) = ((negH >> 8) & 0xFF).toByte
    down(24) = ((negH >> 16) & 0xFF).toByte
    down(25) = ((negH >> 24) & 0xFF).toByte
    for (r <- 0 until h)
      System.arraycopy(up, 54 + (h - 1 - r) * rowBytes, down,
        54 + r * rowBytes, rowBytes)
    val a = BmpCodec.decode(up)
    val b = BmpCodec.decode(down)
    assert(a != null && b != null)
    assert((0 until 5).forall(i => a.get(i, null) == b.get(i, null)))
    assert((b.getInt(0), b.getInt(1), b.getLong(2), b.getLong(3),
      b.getLong(4)) === decodeViaImageIO(down))
  }

  test("resize agrees with javax.imageio nearest-neighbor on the pixels") {
    // External witness for the RESAMPLER: read the SOURCE through
    // ImageIO, apply the same ⌊x'·w/w'⌋,⌊y'·h/h'⌋ index map to its
    // pixels, and require our resized BYTES — read back through ImageIO,
    // not our own decoder — to show exactly those pixels. Proves both
    // the sampling arithmetic and that the output container parses for
    // an independent reader.
    for ((seed, w, h, w2, h2) <- Seq((1L, 8, 6, 8, 6), (7L, 20, 15, 8, 6),
        (42L, 9, 5, 4, 4), (123L, 11, 7, 3, 2), (9L, 2, 2, 5, 5))) {
      val src = BmpCodec.encode(seed, w, h)
      val out = BmpCodec.resize(src, w2, h2)
      assert(out != null, s"resize refused ($seed,$w,$h)->($w2,$h2)")
      val si = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(src))
      val oi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
      assert(oi.getWidth === w2 && oi.getHeight === h2)
      for (y2 <- 0 until h2; x2 <- 0 until w2) {
        val sx = (x2.toLong * w / w2).toInt
        val sy = (y2.toLong * h / h2).toInt
        assert((oi.getRGB(x2, y2) & 0xFFFFFF) ===
          (si.getRGB(sx, sy) & 0xFFFFFF),
          s"($seed,$w,$h)->($w2,$h2) pixel ($x2,$y2)")
      }
    }
  }

  test("resize parses a TOP-DOWN source through its real storage order") {
    // Orientation is load-bearing for resize (unlike decode's sums):
    // the hand-flipped top-down file holds the SAME logical image, so
    // resizing either storage order must give byte-identical output.
    val w = 9; val h = 4
    val up = BmpCodec.encode(3L, w, h)
    val rowBytes = (w * 3 + 3) & ~3
    val down = up.clone()
    val negH = -h
    down(22) = (negH & 0xFF).toByte
    down(23) = ((negH >> 8) & 0xFF).toByte
    down(24) = ((negH >> 16) & 0xFF).toByte
    down(25) = ((negH >> 24) & 0xFF).toByte
    for (r <- 0 until h)
      System.arraycopy(up, 54 + (h - 1 - r) * rowBytes, down,
        54 + r * rowBytes, rowBytes)
    assert(BmpCodec.resize(up, 4, 2).toSeq === BmpCodec.resize(down, 4, 2).toSeq)
  }

  test("resize rejects malformed input and bad geometry with NULL") {
    val good = BmpCodec.encode(1L, 8, 6)
    assert(BmpCodec.resize(null, 4, 4) == null)
    assert(BmpCodec.resize(Array[Byte](1, 2, 3), 4, 4) == null)
    assert(BmpCodec.resize(good, 0, 4) == null)
    assert(BmpCodec.resize(good, 4, -1) == null)
    assert(BmpCodec.resize(good.take(40), 4, 4) == null)
  }

  test("malformed inputs decode to NULL, never throw") {
    val good = BmpCodec.encode(1L, 8, 6)
    val truncated = java.util.Arrays.copyOf(good, good.length - 10)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    val bad32bpp = good.clone(); bad32bpp(28) = 32.toByte // bit depth
    val badComp = good.clone(); badComp(30) = 1.toByte // BI_RLE8
    val hugeDims = good.clone() // width beyond the payload
    hugeDims(18) = 0xFF.toByte; hugeDims(19) = 0xFF.toByte
    for (b <- Seq(null, Array.empty[Byte], Array[Byte](1, 2, 3),
        truncated, badMagic, bad32bpp, badComp, hugeDims))
      assert(BmpCodec.decode(b) == null)
  }

  test("interpreted eval and whole-stage codegen agree (and stay codegen'd)") {
    // parquet-backed input — a local Seq would be constant-folded by
    // ConvertToLocalRelation and never reach codegen
    val spark = TestSpark.spark
    val df = Tables.load(spark, TestSpark.sf0001, "documents")
      .orderBy("doc_id").limit(3)
      .selectExpr("doc_id", "bmp_decode(bmp_encode(doc_id, 8, 6)) AS img")
      .selectExpr("doc_id", "img.width", "img.height", "img.sum_r",
        "img.sum_g", "img.sum_b")
    val viaPlan = df.collect().map(_.toSeq).toSeq
    val expected = viaPlan.map(_.head.asInstanceOf[Long]).map { s =>
      val r = BmpCodec.decode(BmpCodec.encode(s, 8, 6))
      Seq(s, r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
    }
    assert(viaPlan === expected)
    // under AQE the executed-plan string marks codegen'd operators with
    // a `*(stageId)` prefix instead of a WholeStageCodegen node line —
    // the decode Project must carry the star
    val plan = df.queryExecution.executedPlan.toString
    val decodeLine = plan.linesIterator.find(_.contains("bmp_decode"))
      .getOrElse(fail(s"no bmp_decode operator in plan:\n$plan"))
    assert(decodeLine.contains("*("),
      s"bmp_decode fell out of whole-stage codegen:\n$plan")
  }
}
