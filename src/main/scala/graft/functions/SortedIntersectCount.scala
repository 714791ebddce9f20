package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `sorted_icount(a, b)` — |a ∩ b| for two SORTED string arrays, as one
  * merge scan.
  *
  * Why not `size(array_intersect(a, b))`: ArrayIntersect builds a hash
  * set of one side and MATERIALIZES the intersection array per call —
  * per-pair allocation that is pure overhead when only the cardinality
  * is needed. The set-similarity verify stages (q45's PPJoin candidate
  * check) call this once per candidate pair, so it is the innermost
  * loop of the whole join: the merge scan does zero allocation (the
  * `getUTF8String` handles are pointers into the array bytes, the
  * comparison is a byte compare) and exits as soon as either side is
  * exhausted. Measured on q45 at sf0.1: ~2× on the verify stage.
  *
  * CONTRACT — both inputs ascending by Spark's binary string order
  * (`sort_array` output) with no null elements; the caller sorts once
  * per SET (per doc), not per pair, so the sort cost is linear while
  * the saving is per-candidate. Duplicate elements count once per
  * matched run on both sides (exact-|∩| for the distinct sets the
  * dedup queries use — `collect_set` + `sort_array`). Unsorted input
  * gives an UNDERCOUNT, not an error — FunctionsSpec pins the sorted
  * law against array_intersect on random inputs.
  *
  * Nulls: null array → null (BinaryExpression default); a null ELEMENT
  * reached by the merge also yields null (see the eval comment) rather
  * than an NPE.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def foldable: Boolean = children.forall(_.foldable)

  // The null-element poison path can fire even when neither ARRAY is
  // null, so nullability must also follow the element-level
  // containsNull flags — without this the engine treats the output as
  // non-nullable and silently drops the null (codegen writes isNull
  // into a constant-false slot).
  override def nullable: Boolean =
    super.nullable || children.exists(_.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    })

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_icount requires two array<string> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  // A null ELEMENT reached by the merge poisons the result to null
  // (SQL three-valued logic: whether it matches is unknowable), instead
  // of the NPE the raw merge would throw — the type check accepts
  // containsNull=true arrays because most array-producing expressions
  // are typed that way even when every element is present. Nulls past
  // the merge frontier (after one side is exhausted) are never touched
  // and cannot change the count, so the result stays defined there —
  // under Spark's array_sort convention (nulls last) this makes the
  // count exact over the non-null prefix in every case.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var (i, j) = (0, 0)
    var acc = 0L
    while (i < nx && j < ny) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else { acc += 1L; i += 1; j += 1 }
    }
    acc
  }

  // Whether a null ELEMENT is even possible per the input types. When
  // it is not, the poison branch is omitted from the generated loop —
  // not just as a micro-optimization of the innermost q45 loop, but
  // because writing `${ev.isNull} = true` would not COMPILE there:
  // with every null source ruled out `nullable` is false, so
  // nullSafeCodeGen renders the body with an isNull variable it never
  // declares (the FalseLiteral copy happens after the template is
  // built), Janino rejects the undeclared name, and the whole
  // projection silently falls back to interpreted mode — the exact
  // opposite of why this kernel exists.
  private def elementsNullable: Boolean = children.exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val poison =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0;
         |long $acc = 0L;
         |while ($i < $nx && $j < $ny) {
         |  $poison
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c < 0) { $i++; }
         |  else if ($c > 0) { $j++; }
         |  else { $acc++; $i++; $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_icount"
}

object SortedIntersectCount {
  /** (name, info, builder) triple for SparkSessionExtensions.injectFunction. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("sorted_icount"),
    new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_icount"),
    FunctionArity.expect("sorted_icount", 2)(c => SortedIntersectCount(c(0), c(1))))
}
