package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text, n)` — the DISTINCT n-gram word shingles of
  * `lower(text)` as `array<string>`; NULL when the text has fewer than
  * n tokens.
  *
  * Equivalent composite (what q23 ran before, and what the DuckDB
  * oracle still mirrors independently):
  *   split(lower(text), ' ')  →  transform(sequence(…), slice+concat_ws)
  *   →  explode  →  DISTINCT on (doc_id, shingle)
  * The crucial difference is WHERE dedup happens: the composite's
  * global `.distinct()` SHUFFLES every shingle occurrence, but
  * MinHash / set-size / Jaccard-intersection all need dedup only PER
  * DOCUMENT — a per-row hash set inside the scan stage. With this
  * expression the shingle table is map-only (explode of an
  * already-distinct array); at 100 TB that deletes the largest shuffle
  * of the near-dup pipeline. Same preference-order rationale as
  * `dotq`/`simhash64`. Equivalence to the composite is spec-asserted
  * over the fixture corpus.
  *
  * Token/shingle semantics match Spark's `split(lower(text), ' ')`
  * exactly (regex split, empties kept); output order is first-
  * occurrence order (downstream consumers are order-independent:
  * min-aggregates, group-bys, equi-joins).
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // NULL is also produced for non-null texts with < n tokens.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("word_shingles: text must be string")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("word_shingles: n must be a foldable int")
    else right.eval() match {
      case n: java.lang.Integer if n > 0 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("word_shingles: n must be > 0")
    }
  }

  override protected def nullSafeEval(t: Any, n: Any): Any =
    WordShingles.compute(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WordShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (t, n) => s"""
      ${ev.value} = $cls.compute($t, $n);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "word_shingles"
}

object WordShingles {

  /** Per-row distinct n-gram shingling; one StringBuilder reused. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toLowerCase.toString.split(" ", -1)
    if (toks.length < n) return null
    // LinkedHashSet: dedup with deterministic (first-occurrence) order.
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(sb.toString): Unit
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      out(j) = UTF8String.fromString(it.next())
      j += 1
    }
    new GenericArrayData(out)
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("word_shingles"),
    new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
    FunctionArity.expect("word_shingles", 2)(c => WordShingles(c(0), c(1))))
}
