package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `rgb565(r, g, b)` — pack three 0–255 channel values into one 16-bit
  * RGB565 pixel: `(r & 0xF8) << 8 | (g & 0xFC) << 3 | b >> 3`.
  *
  * Custom-Expression exemplar (SURVEY.md §7.3): the packing semantics
  * come from the reference firmware's pen creation —
  * `graphics->create_pen(i % 255, i % 127, i % 63)` feeding a
  * PicoGraphics_PenRGB565 surface (reference
  * `src/DoublePsramBuffer480x480.cpp:125`, buffer type at `:98-101`) —
  * the reference's one "projection expression": 3 channels → packed
  * fixed-width scalar (SURVEY.md §1.A "Pixel").
  *
  * Both evaluation paths are implemented: `nullSafeEval` (interpreted)
  * and `doGenCode` (whole-stage codegen) — the unit test asserts they
  * agree, and that the expression stays inside a WholeStageCodegen span.
  */
case class Rgb565(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = IntegerType

  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType == IntegerType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rgb565 requires three int arguments, got " +
        children.map(_.dataType.catalogString).mkString(", "))
  }

  override protected def nullSafeEval(r: Any, g: Any, b: Any): Any =
    Rgb565.pack(r.asInstanceOf[Int], g.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, g, b) =>
      s"${ev.value} = ((($r & 0xF8) << 8) | (($g & 0xFC) << 3) | (($b & 0xFF) >>> 3));")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Rgb565 =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "rgb565"
}

object Rgb565 {
  def pack(r: Int, g: Int, b: Int): Int =
    ((r & 0xF8) << 8) | ((g & 0xFC) << 3) | ((b & 0xFF) >>> 3)

  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("rgb565"),
    new ExpressionInfo(classOf[Rgb565].getName, "rgb565"),
    FunctionArity.expect("rgb565", 3)(c => Rgb565(c(0), c(1), c(2))))
}
