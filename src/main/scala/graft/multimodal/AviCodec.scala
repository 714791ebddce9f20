package graft.multimodal

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** REAL pure-JVM video-container codec — the VIDEO leg of the
  * multimodal triad (BmpCodec = image, WavCodec = audio): uncompressed
  * DIB-in-AVI, the public RIFF('AVI ') container with a `hdrl` header
  * list (avih main header + one `strl` video stream: strh 'vids'/'DIB '
  * + strf BITMAPINFOHEADER) and a `movi` list of `00db`
  * device-independent-bitmap frame chunks — each frame payload laid out
  * exactly like BMP pixel data (bottom-up BGR rows, 4-byte padding).
  *
  * Two expressions, split the way a 100 TB pipeline wants them:
  *   - `avi_meta(bytes)` — a codegen'd SCALAR that parses only the
  *     header list (no frame bytes touched) → width/height/frame
  *     count/frame duration. Cheap: filter on metadata FIRST.
  *   - `avi_frames(bytes, stride)` — a native catalyst GENERATOR (the
  *     UDTF tier, like ngrams_gen): one video row fans out to one row
  *     per SAMPLED frame (every stride-th `00db` chunk), each reduced
  *     to per-channel sums. Frame fan-out is the expensive step, so it
  *     runs AFTER the metadata filter — the explode-after-filter shape
  *     MultimodalOps documents.
  *
  * The chunk walk honors RIFF discipline for real: LIST containers are
  * descended by form type, foreign chunks (JUNK padding, idx1 indexes,
  * `01wb` audio-stream frames) are SKIPPED with the word-alignment pad
  * byte, and anything malformed or outside the 24-bit/BI_RGB profile
  * yields NULL (meta) / zero rows (frames) — never an exception.
  * AviCodecSpec cross-witnesses the payload: frame 0's encode formula
  * coincides with BmpCodec's, so the sums `avi_frames` extracts through
  * the AVI container must equal what javax.imageio reads from the BMP
  * rendering of the same seed — two independent containers, one pixel
  * grid.
  *
  * `avi_encode(seed, w, h, n_frames)` is the deterministic ingest
  * stand-in: channel j of pixel p in frame f is
  * `(seed·31 + f·13 + (3p+j)·7) mod 256` — arithmetic the DuckDB
  * oracle recomputes (q31d), so container parse bugs (list descent,
  * chunk alignment, row padding, BGR order, stride arithmetic) break
  * the driver's hash gate.
  */
object AviCodec {

  val metaType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("usec_per_frame", IntegerType, nullable = false)))

  val frameSchema: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  private def chan(seed: Long, f: Long, j: Long): Int =
    ((seed * 31 + f * 13 + j * 7) % 256).toInt

  private val FPS = 25
  private val USEC = 1000000 / FPS

  /** Minimal-but-well-formed uncompressed AVI: RIFF('AVI ') {
    * LIST(hdrl){avih, LIST(strl){strh, strf}}, LIST(movi){00db × n} }. */
  def encode(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0,
      s"avi_encode: non-positive args ${w}x$h×$nFrames")
    val rowBytes = (w * 3 + 3) & ~3
    val frameBytes = rowBytes * h
    val framePad = frameBytes & 1
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + nFrames * (8 + frameBytes + framePad)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val b = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = b.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); b.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); b.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); b.putInt(56)
    b.putInt(USEC) // dwMicroSecPerFrame
      .putInt(frameBytes * FPS) // dwMaxBytesPerSec
      .putInt(0).putInt(0) // padding granularity, flags
      .putInt(nFrames) // dwTotalFrames
      .putInt(0).putInt(1) // initial frames, streams
      .putInt(frameBytes) // suggested buffer
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    fourcc("LIST"); b.putInt(strlSize); fourcc("strl")
    fourcc("strh"); b.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    b.putInt(0).putShort(0).putShort(0) // flags, priority, language
      .putInt(0) // initial frames
      .putInt(1).putInt(FPS) // scale, rate
      .putInt(0).putInt(nFrames) // start, length (frames)
      .putInt(frameBytes) // suggested buffer
      .putInt(-1).putInt(0) // quality, sample size
      .putShort(0).putShort(0) // rcFrame
      .putShort(w.toShort).putShort(h.toShort)
    fourcc("strf"); b.putInt(40) // BITMAPINFOHEADER
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(frameBytes).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    fourcc("LIST"); b.putInt(moviSize); fourcc("movi")
    var f = 0
    while (f < nFrames) {
      fourcc("00db"); b.putInt(frameBytes)
      var y = h - 1 // bottom-up rows, like BMP
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val p = y.toLong * w + x
          b.put(chan(seed, f, 3 * p + 2).toByte) // B
            .put(chan(seed, f, 3 * p + 1).toByte) // G
            .put(chan(seed, f, 3 * p).toByte) // R
          x += 1
        }
        var pad = rowBytes - w * 3
        while (pad > 0) { b.put(0.toByte); pad -= 1 }
        y -= 1
      }
      if (framePad == 1) b.put(0.toByte)
      f += 1
    }
    b.array()
  }

  private def u16(a: Array[Byte], off: Int): Int =
    (a(off) & 0xFF) | ((a(off + 1) & 0xFF) << 8)
  private def i32(a: Array[Byte], off: Int): Int =
    (a(off) & 0xFF) | ((a(off + 1) & 0xFF) << 8) |
      ((a(off + 2) & 0xFF) << 16) | ((a(off + 3) & 0xFF) << 24)
  private def tag(a: Array[Byte], off: Int): String =
    new String(a, off, 4, "US-ASCII")

  /** Parsed header facts + the movi payload location. */
  private final case class Parsed(
      w: Int, h: Int, nFrames: Int, usec: Int,
      moviOff: Int, moviEnd: Int)

  /** Walk the container: returns null on anything malformed or outside
    * the uncompressed-DIB profile. LIST containers are descended
    * recursively by form type; foreign chunks (JUNK, idx1, `01wb`
    * audio, INFO metadata, …) are skipped with word alignment. */
  private def parse(bytes: Array[Byte]): Parsed = {
    if (bytes == null || bytes.length < 12) return null
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ") return null
    val end = math.min(bytes.length.toLong, 8L + i32(bytes, 4)).toInt
    var w = -1; var h = -1; var nFrames = -1; var usec = -1
    var vids = false; var bpp24 = false
    var moviOff = -1; var moviEnd = -1
    var bad = false
    def scan(from: Int, to: Int): Unit = {
      var off = from
      while (!bad && off + 8 <= to) {
        val id = tag(bytes, off)
        val size = i32(bytes, off + 4)
        val payload = off + 8
        if (size < 0 || payload + size > to) { bad = true; return }
        if (id == "LIST" && size >= 4) tag(bytes, payload) match {
          case "hdrl" | "strl" => scan(payload + 4, payload + size)
          case "movi" => moviOff = payload + 4; moviEnd = payload + size
          case _ => () // skip foreign LIST (INFO, rec , …)
        }
        else id match {
          case "avih" =>
            if (size < 56) { bad = true; return }
            usec = i32(bytes, payload)
            nFrames = i32(bytes, payload + 16)
            w = i32(bytes, payload + 32)
            h = i32(bytes, payload + 36)
          case "strh" =>
            if (size < 8) { bad = true; return }
            if (tag(bytes, payload) == "vids") {
              if (tag(bytes, payload + 4) != "DIB ") { bad = true; return }
              vids = true
            }
          case "strf" =>
            if (vids && !bpp24) {
              if (size < 40 ||
                u16(bytes, payload + 14) != 24 || // 24 bpp only
                i32(bytes, payload + 16) != 0 || // BI_RGB only
                i32(bytes, payload + 4) != w ||
                i32(bytes, payload + 8) != h) { bad = true; return }
              bpp24 = true
            }
          case _ => () // skip foreign chunk (JUNK, idx1, …)
        }
        off = payload + size + (size & 1)
      }
    }
    scan(12, end)
    if (bad) return null
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return null
    if (nFrames <= 0 || usec <= 0 || !vids || !bpp24) return null
    if (moviOff < 0) return null
    Parsed(w, h, nFrames, usec, moviOff, moviEnd)
  }

  def meta(bytes: Array[Byte]): InternalRow = {
    val p = parse(bytes)
    if (p == null) null
    else new GenericInternalRow(
      Array[Any](p.w, p.h, p.nFrames, p.usec))
  }

  /** Iterate sampled frames: every stride-th `00db` chunk in movi order,
    * reduced to channel sums. Malformed input → empty. */
  def frames(bytes: Array[Byte], stride: Int): Iterator[InternalRow] = {
    val p = parse(bytes)
    if (p == null || stride < 1) return Iterator.empty
    val rowBytes = (p.w * 3 + 3) & ~3
    new Iterator[InternalRow] {
      private var off = p.moviOff
      private var idx = 0
      private var nextRow: InternalRow = advance()

      private def advance(): InternalRow = {
        while (off + 8 <= p.moviEnd) {
          val id = tag(bytes, off)
          val size = i32(bytes, off + 4)
          val payload = off + 8
          if (size < 0 || payload + size > p.moviEnd) return null
          off = payload + size + (size & 1)
          if (id == "00db") {
            val thisIdx = idx
            idx += 1
            if (thisIdx % stride == 0) {
              if (size < rowBytes * p.h) return null // truncated frame
              var sr = 0L; var sg = 0L; var sb = 0L
              var row = 0
              while (row < p.h) {
                var o = payload + row * rowBytes
                var x = 0
                while (x < p.w) {
                  sb += bytes(o) & 0xFF
                  sg += bytes(o + 1) & 0xFF
                  sr += bytes(o + 2) & 0xFF
                  o += 3
                  x += 1
                }
                row += 1
              }
              return new GenericInternalRow(Array[Any](thisIdx, sr, sg, sb))
            }
          }
          // else: foreign movi chunk (01wb audio, rec lists) — skip
        }
        null
      }

      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow; nextRow = advance(); r
      }
    }
  }

  val encodeDescriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("avi_encode"),
    new ExpressionInfo(classOf[AviEncode].getName, "avi_encode"),
    (children: Seq[Expression]) => {
      require(children.size == 4,
        s"avi_encode requires exactly 4 arguments (seed, w, h, n_frames); " +
          s"got ${children.size}")
      AviEncode(children(0), children(1), children(2), children(3))
    })

  val metaDescriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("avi_meta"),
    new ExpressionInfo(classOf[AviMeta].getName, "avi_meta"),
    graft.functions.FunctionArity.expect("avi_meta", 1)(c => AviMeta(c(0))))

  val framesDescriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("avi_frames"),
    new ExpressionInfo(classOf[AviFrames].getName, "avi_frames"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"avi_frames requires exactly 2 arguments (bytes, stride); " +
          s"got ${children.size}")
      AviFrames(children(0), children(1))
    })
}

/** `avi_encode(seed BIGINT, w INT, h INT, n_frames INT)` → BINARY (see
  * AviCodec). Four children have no *aryExpression convenience base;
  * CodegenFallback is acceptable HERE because encode is the synthetic
  * ingest stand-in (a real pipeline reads stored bytes) — the hot
  * 100 TB path is decode, and avi_meta stays codegen'd. */
case class AviEncode(seed: Expression, w: Expression, h: Expression,
    nf: Expression) extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, w, h, nf)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = seed.dataType == LongType && w.dataType == IntegerType &&
      h.dataType == IntegerType && nf.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "avi_encode requires (bigint, int, int, int), got " +
        children.map(_.dataType.catalogString).mkString(", "))
  }

  override def eval(input: InternalRow): Any = {
    val s = seed.eval(input); val wv = w.eval(input)
    val hv = h.eval(input); val fv = nf.eval(input)
    if (s == null || wv == null || hv == null || fv == null) null
    else AviCodec.encode(s.asInstanceOf[Long], wv.asInstanceOf[Int],
      hv.asInstanceOf[Int], fv.asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AviEncode =
    copy(seed = newChildren(0), w = newChildren(1), h = newChildren(2),
      nf = newChildren(3))

  override def prettyName: String = "avi_encode"
}

/** `avi_meta(bytes BINARY)` → STRUCT<width,height,n_frames,
  * usec_per_frame>; NULL on malformed input. Header-only parse — no
  * frame bytes are touched, so metadata filters stay cheap. */
case class AviMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AviCodec.metaType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"avi_meta requires binary, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(bytes: Any): Any =
    AviCodec.meta(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = AviCodec.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = $cls.meta($b);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): AviMeta =
    copy(child = newChild)

  override def prettyName: String = "avi_meta"
}

/** `avi_frames(bytes BINARY, stride INT)` — generator: one row per
  * sampled frame (every stride-th 00db chunk) with per-channel pixel
  * sums; zero rows on malformed input. Generators sit outside
  * whole-stage codegen (CodegenFallback) — the standard cost of the
  * row-fan-out tier; the point is that the fan-out runs AFTER the
  * avi_meta filter. */
case class AviFrames(bytes: Expression, stride: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(bytes, stride)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (bytes.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure("avi_frames: bytes must be BINARY")
    else if (stride.dataType != IntegerType || !stride.foldable)
      TypeCheckResult.TypeCheckFailure(
        "avi_frames: stride must be a foldable INT literal")
    else {
      val k = stride.eval(null)
      if (k == null || k.asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure("avi_frames: stride must be >= 1")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  override def elementSchema: StructType = AviCodec.frameSchema

  private lazy val k: Int = stride.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val b = bytes.eval(input)
    if (b == null) Iterator.empty
    else AviCodec.frames(b.asInstanceOf[Array[Byte]], k)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AviFrames =
    copy(bytes = newChildren(0), stride = newChildren(1))
}
