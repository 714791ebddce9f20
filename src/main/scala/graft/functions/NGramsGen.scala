package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `ngrams_gen(text, n)` — a native Catalyst GENERATOR (UDTF tier):
  * one input row fans out to one output row per word n-gram of
  * `lower(text)`, with its 1-based position. This is the §7.3
  * extension tier the explode-an-array composite can't represent
  * directly: a Generator emits rows without materializing the whole
  * per-row result as an array value first (A22's 1→4 mirrored-circle
  * fan-out, `/root/reference/src/SinglePsramBuffer480x480.cpp:143-148`,
  * is the reference's row-generator moment).
  *
  * Relationship to `word_shingles`: that expression returns the
  * DISTINCT shingle set (what MinHash needs); this generator emits ALL
  * n-grams IN ORDER with positions (what positional/windowed text
  * analysis needs — and what `rolling_min_md5` consumes downstream in
  * q29's winnowing). Tokenization matches `split(text, ' ')` exactly
  * (single-space split, empties kept) so oracles can mirror it.
  *
  * `n` must be a foldable positive integer — a per-row n would make
  * the output schema data-dependent.
  *
  * Generators sit outside whole-stage codegen (CodegenFallback), which
  * is the standard cost of the row-fan-out shape; the hot scan-stage
  * paths (q23/q32) use the codegen'd array expressions instead.
  */
case class NGramsGen(text: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, n)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("ngrams_gen: text must be STRING")
    else if (n.dataType != IntegerType || !n.foldable)
      TypeCheckResult.TypeCheckFailure(
        "ngrams_gen: n must be a foldable INT literal")
    else {
      val k = n.eval(null)
      if (k == null || k.asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure("ngrams_gen: n must be >= 1")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  private lazy val k: Int = n.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) return Iterator.empty
    // toLowerCase: UTF8String's own lowercasing, matching Spark's
    // lower() — locale-independent (a JVM default Turkish locale would
    // make String.toLowerCase map 'I' to dotless ı and diverge from
    // both lower() and the DuckDB oracle).
    val words = t.asInstanceOf[UTF8String].toLowerCase.toString
      .split(" ", -1)
    if (words.length < k) return Iterator.empty
    (0 to words.length - k).iterator.map { i =>
      InternalRow(i + 1,
        UTF8String.fromString(words.slice(i, i + k).mkString(" ")))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NGramsGen =
    copy(text = newChildren(0), n = newChildren(1))
}

object NGramsGen {
  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("ngrams_gen"),
    new ExpressionInfo(classOf[NGramsGen].getName, "ngrams_gen"),
    (children: Seq[Expression]) => {
      // proper arity error instead of IndexOutOfBoundsException
      require(children.size == 2,
        s"ngrams_gen requires exactly 2 arguments (text, n); " +
          s"got ${children.size}")
      NGramsGen(children(0), children(1))
    })
}
