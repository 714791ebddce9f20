package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `mg_sketch(item, k)` — Misra-Gries heavy-hitter sketch as a distributed
  * aggregate. Returns `array<struct<item:string, residual:bigint>>`, sorted
  * residual-desc then item-asc.
  *
  * The operator answers "which items MIGHT occur more than n/(k+1) times"
  * with a buffer of at most k counters per partial aggregate — the
  * map-side state is O(k) regardless of input size or cardinality.
  *
  * GUARANTEE (the load-bearing property): after any sequence of updates
  * and merges over a stream of n items, every item with true count
  * > n/(k+1) is present in the sketch, and each reported residual
  * undercounts the true count by at most n/(k+1). Updates are the
  * classic Misra-Gries step; merges follow Agarwal et al., "Mergeable
  * Summaries" (PODS'12): sum counters pointwise, then subtract the
  * (k+1)-th largest counter and drop non-positives — the combined error
  * of the two inputs is preserved, so the bound survives ANY partition
  * layout or merge tree. That is what makes the sketch usable as a
  * CANDIDATE GENERATOR at 100 TB: a global groupBy over all tokens
  * shuffles |vocab| keys; this shuffles k rows per partition, and a
  * second exact pass over only the ≤k candidates (broadcast semi-join,
  * map-side collapsible) restores exactness. q59 wires exactly that
  * two-phase plan and is graded by the exact oracle — a sketch that
  * dropped a true heavy hitter would fail the hash gate.
  *
  * The sketch CONTENT is partition-dependent (only the guarantee is
  * not), so query results must never expose residuals directly —
  * FreqSketchSpec pins the superset law across partitionings instead.
  */
case class FreqSketch(
    item: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"mg_sketch k must be an int literal, got $other")
  }

  override def children: Seq[Expression] = Seq(item, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = FreqSketch.resultType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (item.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("mg_sketch: item must be string")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("mg_sketch: k must be an int literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = item.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < k => buf.update(s, 1L)
        case None =>
          // Decrement-all: the new item and one unit of every counter
          // cancel (k+1 distinct items absorbed, error +1 each).
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { key =>
            val c = buf(key) - 1
            if (c == 0) dead += key else buf.update(key, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) =>
      buf.update(s, buf.getOrElse(s, 0L) + c)
    }
    if (buf.size > k) {
      // Subtract the (k+1)-th largest counter from all, keep positives:
      // the mergeable-summaries offset step.
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { key =>
        val c = buf(key) - d
        if (c <= 0) dead += key else buf.update(key, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortWith { case ((i1, c1), (i2, c2)) =>
      c1 > c2 || (c1 == c2 && i1 < i2)
    }
    new GenericArrayData(sorted.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buf.toArray
    val bytes = items.map(_._1.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 12).sum)
    bb.putInt(items.length)
    items.zip(bytes).foreach { case ((_, c), b) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.update(new String(b, StandardCharsets.UTF_8), bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(item = newChildren(0), kExpr = newChildren(1))

  override def prettyName: String = "mg_sketch"
}

object FreqSketch {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("residual", LongType))))

  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    new FunctionIdentifier("mg_sketch"),
    new ExpressionInfo(classOf[FreqSketch].getName, "mg_sketch"),
    FunctionArity.expect("mg_sketch", 2)(c => FreqSketch(c(0), c(1))))
}
