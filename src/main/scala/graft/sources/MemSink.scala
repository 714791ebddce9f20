package graft.sources

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DSv2 SINK exemplar (`format("graftmem")`): the write half of
  * the custom-source story (RangeSource is the read half), implementing
  * the full TWO-PHASE COMMIT protocol every distributed Spark sink
  * lives by:
  *
  *   1. each task's `DataWriter` buffers its partition's rows and, on
  *      task success, emits them as a `WriterCommitMessage`;
  *   2. ONLY the driver-side `BatchWrite.commit(messages)` makes data
  *      visible — atomically, whole-job-or-nothing;
  *   3. a failed task or job routes to `abort()`, leaving the table
  *      EXACTLY as it was (MemSinkSpec fails a mid-write task and
  *      asserts untouched state).
  *
  * At 100 TB this contract is what makes retries and speculative
  * execution safe: task attempts are provisional until the single
  * driver commit. The store is an in-JVM registry (this is a protocol
  * exemplar, not a storage engine — a real sink would stage files or a
  * transaction instead of buffering rows); values are EXTERNALIZED
  * (UTF8String → String etc.) when buffered because InternalRows are
  * reused by the runtime and must not be retained.
  *
  * Reference basis: the A12 double-buffer swap
  * (`/root/reference/src/DoublePsramBuffer480x480.cpp:196-199`) — work
  * accumulates invisibly in the back buffer and one atomic flip
  * publishes it; `commit()` is that flip.
  */
class MemSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graftmem"
  // a sink cannot infer its schema; accept the incoming DataFrame's
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MemSink.registry.get(MemSink.tableName(options))
      .map(_.schema).getOrElse(new StructType())

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MemSinkTable(
      MemSink.tableName(new CaseInsensitiveStringMap(properties)), schema)
}

object MemSink {
  final case class Stored(schema: StructType, rows: Seq[Seq[Any]])

  /** Committed state per table name. In-JVM: local[*] test/exemplar
    * scope by design. */
  val registry: TrieMap[String, Stored] = TrieMap.empty

  def tableName(options: CaseInsensitiveStringMap): String = {
    val n = options.get("table")
    require(n != null && n.nonEmpty, "graftmem requires option 'table'")
    n
  }

  def clear(name: String): Unit = registry.remove(name)
}

final class MemSinkTable(name: String, schema0: StructType)
    extends Table with SupportsWrite with SupportsRead {
  override def name(): String = s"graftmem:$name"
  override def schema(): StructType =
    if (schema0.nonEmpty) schema0
    else MemSink.registry.get(name).map(_.schema).getOrElse(schema0)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.BATCH_READ,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new MemBatchWrite(name, info.schema())
      }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new MemScan(name, schema())
    }
}

/** Driver-side coordinator: `commit` is the only place rows become
  * visible; `abort` drops every provisional buffer. */
final class MemBatchWrite(name: String, schema: StructType)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new MemWriterFactory(schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.iterator
      .map(_.asInstanceOf[MemCommitMessage])
      .toSeq.sortBy(_.partitionId)
      .flatMap(_.rows)
    MemSink.registry.put(name, MemSink.Stored(schema, rows))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // provisional buffers live only in the (now discarded) messages —
    // nothing to undo, which is the point of the protocol
  }
}

final case class MemCommitMessage(partitionId: Int, rows: Seq[Seq[Any]])
    extends WriterCommitMessage

final class MemWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new MemDataWriter(partitionId, schema)
}

final class MemDataWriter(partitionId: Int, schema: StructType)
    extends DataWriter[InternalRow] {
  import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
  import org.apache.spark.sql.types.{ArrayType, DataType, MapType}

  private val buf = Vector.newBuilder[Seq[Any]]

  /** Recursively externalize a buffered value: InternalRows are reused
    * by the runtime, and complex values are Unsafe* VIEWS into the
    * reused buffer. copy() alone is not enough in general —
    * GenericArrayData.copy() clones its element array SHALLOWLY, so a
    * UTF8String element that is a view into a reused buffer would still
    * alias after the copy (round-7 ADVICE item 3). Type-driven
    * recursion converts every string to an owned java String and every
    * container to a Generic* holding externalized children, regardless
    * of which ArrayData implementation arrived. */
  private def externalize(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s: UTF8String, _) => s.toString
    case (b: Array[Byte], _) => b.clone()
    case (a: ArrayData, ArrayType(et, _)) =>
      new GenericArrayData(a.toObjectArray(et).map(externalize(_, et)))
    case (m: MapData, MapType(kt, vt, _)) =>
      new ArrayBasedMapData(
        new GenericArrayData(
          m.keyArray.toObjectArray(kt).map(externalize(_, kt))),
        new GenericArrayData(
          m.valueArray.toObjectArray(vt).map(externalize(_, vt))))
    case (r: InternalRow, st: StructType) =>
      InternalRow.fromSeq(st.fields.toSeq.zipWithIndex.map {
        case (f, i) => externalize(r.get(i, f.dataType), f.dataType)
      })
    case (other, _) => other
  }

  override def write(row: InternalRow): Unit =
    buf += schema.fields.indices.map { i =>
      externalize(row.get(i, schema(i).dataType), schema(i).dataType)
    }

  override def commit(): WriterCommitMessage =
    MemCommitMessage(partitionId, buf.result())
  override def abort(): Unit = {}
  override def close(): Unit = {}
}

// ---------------------------------------------------------------- read-back
final class MemScan(name: String, schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(MemPartition(name))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new MemReader(p.asInstanceOf[MemPartition].table)
    }
}

final case class MemPartition(table: String) extends InputPartition

final class MemReader(table: String) extends PartitionReader[InternalRow] {
  import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
  import org.apache.spark.sql.types.{ArrayType, DataType, MapType}

  private val stored = MemSink.registry.get(table)
    .getOrElse(MemSink.Stored(new StructType(), Nil))
  private val it = stored.rows.iterator
  private var cur: Seq[Any] = _
  override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }

  /** Mirror of MemDataWriter.externalize: strings come back as
    * UTF8String at every nesting level. */
  private def internalize(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s: String, _) => UTF8String.fromString(s)
    case (a: ArrayData, ArrayType(et, _)) =>
      new GenericArrayData(a.toObjectArray(et).map(internalize(_, et)))
    case (m: MapData, MapType(kt, vt, _)) =>
      new ArrayBasedMapData(
        new GenericArrayData(
          m.keyArray.toObjectArray(kt).map(internalize(_, kt))),
        new GenericArrayData(
          m.valueArray.toObjectArray(vt).map(internalize(_, vt))))
    case (r: InternalRow, st: StructType) =>
      InternalRow.fromSeq(st.fields.toSeq.zipWithIndex.map {
        case (f, i) => internalize(r.get(i, f.dataType), f.dataType)
      })
    case (other, _) => other
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(stored.schema.fields.toSeq.zip(cur).map {
      case (f, v) => internalize(v, f.dataType)
    })
  override def close(): Unit = {}
}
