package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared scaffold for the fixed-point array kernels (`dotq`, `l2q`):
  * two float arrays, each element quantized to int64 micro units via
  * `QuantizedDot.q`, folded per-element into an exact int64 accumulator.
  * Subclasses supply ONLY the per-element step — interpreted
  * (`step(qa, qb)`) and generated (`stepCode(qa, qb, acc, ctx)`) — so
  * the two kernels that document one quantization contract cannot
  * silently diverge in typing, null handling, or loop semantics.
  *
  * Shared contract: `array<float> × array<float> → bigint`; null array
  * → null (BinaryExpression null-intolerance); length mismatch folds
  * the common prefix; `foldable` when both children are (Catalyst
  * ConstantFolding evaluates all-literal calls at plan time — asserted
  * in PlanShapeSpec).
  */
abstract class QuantizedArrayFold extends BinaryExpression {

  /** Interpreted per-element step: combine two quantized values into
    * the accumulator delta. */
  protected def step(qa: Long, qb: Long): Long

  /** Generated per-element step: Java statements that add this
    * element's contribution to `acc`; `qa`/`qb` are long locals holding
    * the quantized element values. */
  protected def stepCode(qa: String, qb: String, acc: String,
      ctx: CodegenContext): String

  override def dataType: DataType = LongType

  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += step(QuantizedDot.q(x.getFloat(i)), QuantizedDot.q(y.getFloat(i)))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = QuantizedDot.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $qa = $cls.q($a.getFloat($i));
         |  long $qb = $cls.q($b.getFloat($i));
         |  ${stepCode(qa, qb, acc, ctx)}
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }
}
