package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_min_md5(text, width)` — winnowing-style document
  * fingerprint: the lexicographic MIN of md5(substring(text, i, width))
  * over every window start i ∈ [1, max(len−width+1, 1)].
  *
  * Semantically identical to the HOF formulation
  * `array_min(transform(sequence(1, greatest(length(t)-w+1, 1)),
  * i -> md5(CAST(substring(t, i, w) AS BINARY))))` (and to the DuckDB
  * oracle built the same way) — but evaluated in one tight loop with a
  * reused MessageDigest instead of one interpreted lambda + allocation
  * per window. Characters, not bytes: substring/length are SQL
  * character semantics (UTF8String), exactly like the HOF form.
  */
case class RollingMinMd5(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("rolling_min_md5: text must be string")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("rolling_min_md5: width must be a foldable int")
    else right.eval() match {
      // eval(), not a Literal pattern: analysis runs BEFORE ConstantFolding,
      // so a foldable-but-composite width like 8+8 is not a Literal yet
      // (round-2 ADVICE; TopKByScore accepts any foldable int the same way).
      case w: java.lang.Integer if w > 0 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("rolling_min_md5: width must be > 0")
    }
  }

  override protected def nullSafeEval(t: Any, w: Any): Any =
    RollingMinMd5.compute(t.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RollingMinMd5.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (t, w) =>
      s"${ev.value} = $cls.compute($t, $w);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingMinMd5 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "rolling_min_md5"
}

object RollingMinMd5 {
  private val hexDigits = "0123456789abcdef".toCharArray

  /** One pass over the windows; the digest object is reused. */
  def compute(text: UTF8String, width: Int): UTF8String = {
    val n = math.max(text.numChars() - width + 1, 1)
    val md = MessageDigest.getInstance("MD5")
    var best: String = null
    var i = 1
    while (i <= n) {
      // substringSQL is 1-based and truncates at the end — SQL semantics
      val sub = text.substringSQL(i, width)
      md.reset()
      val digest = md.digest(sub.getBytes)
      val hex = new Array[Char](32)
      var j = 0
      while (j < 16) {
        hex(j * 2) = hexDigits((digest(j) >> 4) & 0xF)
        hex(j * 2 + 1) = hexDigits(digest(j) & 0xF)
        j += 1
      }
      val s = new String(hex)
      if (best == null || s.compareTo(best) < 0) best = s
      i += 1
    }
    UTF8String.fromString(best)
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("rolling_min_md5"),
    new ExpressionInfo(classOf[RollingMinMd5].getName, "rolling_min_md5"),
    FunctionArity.expect("rolling_min_md5", 2)(c => RollingMinMd5(c(0), c(1))))
}
