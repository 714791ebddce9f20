package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `span_hashes(toks array<string>, k int)` — the content addresses of
  * every stride-1 k-token window of `toks`, in window order (element i
  * = the hash of tokens [i, i+k)), as 16-byte binaries. Empty array
  * when fewer than k tokens.
  *
  * Exists for the q112 exact-substring dedup window pass (round 20,
  * optimization guide §1.2 "per-task work" / §2.3 "shuffle fewer
  * bytes"): the expression it replaces built the space-joined span
  * STRING and md5'd it per window — O(tokens × k) bytes hashed plus a
  * ~k·avg_token allocation per window, the dominant compute of the
  * whole query. This computes one 64-bit hash per TOKEN (xxhash64 —
  * Spark's own non-crypto hash) and combines windows by a ROLLING
  * 128-bit polynomial — O(tokens) total work, no span string ever
  * materialized — and emits 16-byte binary addresses, halving the
  * shuffled key bytes vs the 32-char md5 hex strings.
  *
  * Collision design, same strength class as the md5 it replaces: two
  * INDEPENDENT 64-bit polynomial accumulators (distinct odd bases,
  * distinct xxhash64 seeds) concatenated to 128 bits. q112's
  * correctness under a REALIZED collision is handled by its exact-span
  * verify + failed-residue fallback exactly as before; the one case
  * that needs hash width (a doc whose two DISTINCT spans share an
  * address — unreachable at 128 bits, the round-15 analysis) keeps the
  * same 128-bit guarantee. SubstrDedupSpec pins this expression
  * result-identical to the md5-per-window form on the real corpus.
  */
case class SpanHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) =>
      if (right.dataType != IntegerType || !right.foldable)
        TypeCheckResult.TypeCheckFailure("span_hashes: k must be a foldable int")
      else right.eval() match {
        case k: java.lang.Integer if k > 0 => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure("span_hashes: k must be > 0")
      }
    case _ =>
      TypeCheckResult.TypeCheckFailure("span_hashes: toks must be array<string>")
  }

  override protected def nullSafeEval(t: Any, k: Any): Any =
    SpanHashes.compute(t.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SpanHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"${ev.value} = $cls.compute($t, $k);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanHashes =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "span_hashes"
}

object SpanHashes {
  // distinct odd bases so the two 64-bit polynomials are independent
  private val B1 = 0x100000001b3L // FNV-1a prime
  private val B2 = 0x9e3779b97f4a7c15L | 1L // golden-ratio odd
  private val Seed1 = 42L
  private val Seed2 = 0x9747b28cL

  /** O(n) rolling pass: one xxhash64 per token per polynomial, one
    * multiply-add per window step. A null token element (impossible
    * from split(), defensive anyway) hashes as the seed itself. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val th1 = new Array[Long](n)
    val th2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        th1(i) = XxHash64Function.hash(t, StringType, Seed1)
        th2(i) = XxHash64Function.hash(t, StringType, Seed2)
      } else {
        th1(i) = Seed1; th2(i) = Seed2
      }
      i += 1
    }
    // Bp = B^(k-1): the weight of the departing token
    var bp1 = 1L; var bp2 = 1L
    i = 1
    while (i < k) { bp1 *= B1; bp2 *= B2; i += 1 }
    var h1 = 0L; var h2 = 0L
    i = 0
    while (i < k) {
      h1 = h1 * B1 + th1(i)
      h2 = h2 * B2 + th2(i)
      i += 1
    }
    val m = n - k + 1
    val out = new Array[Any](m)
    var w = 0
    while (w < m) {
      val b = new Array[Byte](16)
      var v = h1
      var j = 7
      while (j >= 0) { b(j) = v.toByte; v >>>= 8; j -= 1 }
      v = h2
      j = 15
      while (j >= 8) { b(j) = v.toByte; v >>>= 8; j -= 1 }
      out(w) = b
      if (w + 1 < m) {
        h1 = (h1 - th1(w) * bp1) * B1 + th1(w + k)
        h2 = (h2 - th2(w) * bp2) * B2 + th2(w + k)
      }
      w += 1
    }
    new GenericArrayData(out)
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("span_hashes"),
    new ExpressionInfo(classOf[SpanHashes].getName, "span_hashes"),
    FunctionArity.expect("span_hashes", 2)(c => SpanHashes(c(0), c(1))))
}
