package graft.sources

import java.io.File
import java.util

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Avro container-file source/sink (`format("graftavro")`) — the last
  * mainstream interchange format in q57's codec-parity family
  * (CSV/JSON/ORC/XML), built directly on the avro-core library because
  * the spark-avro connector module is not on this classpath. Honest
  * naming: `graftavro`, not `avro` — this is graft's own DSv2
  * implementation, not the upstream connector.
  *
  * Reference basis: the A28–A30 byte-stream scan family
  * (`/root/reference/src/fileio.cpp:8-44`) — open, sequential decode,
  * seekable container — which is exactly Avro's object-container model.
  *
  * Scale design:
  *   - SPLITS: one input partition per container file; a production
  *     deployment splits WITHIN files at Avro sync markers (the format
  *     is block-compressed and seekable by design — same mechanism,
  *     more cut points), so parallelism scales with data, not file
  *     count. File-level splits are the honest local[32] subset.
  *   - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): the pruned
  *     columns are dropped by handing Avro a projected READER schema —
  *     schema resolution skips the unused fields during decode, so
  *     pruning happens inside the Avro decoder, not as a Spark-side
  *     projection (AvroSourceSpec asserts the scan's readSchema).
  *   - WRITES: full DSv2 two-phase commit (the MemSink protocol against
  *     a real filesystem): each task writes `part-*.avro.tmp` and only
  *     the driver-side `commit(messages)` renames the one winning
  *     attempt per partition into place + drops `_SUCCESS` — retries
  *     and speculative attempts stay invisible. On HDFS/S3 the rename
  *     step is the cloud committer's job; locally rename is atomic.
  *
  * Types: the exact-round-trip subset the codec-parity story needs
  * (long/int/double/float/boolean/string/binary, nullable via
  * union[null, T]). Complex types stay in parquet/ORC land.
  */
class AvroSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graftavro"
  // write path: accept the incoming DataFrame's schema; read path:
  // explicit user schema (production text/interchange scans pin their
  // schema — inference below is a convenience fallback)
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroSource.firstFile(AvroSource.path(options)) match {
      case Some(f) =>
        val r = new DataFileReader[GenericRecord](
          f, new GenericDatumReader[GenericRecord]())
        try AvroSource.toStructType(r.getSchema) finally r.close()
      case None => new StructType()
    }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroTable(
      AvroSource.path(new CaseInsensitiveStringMap(properties)), schema)
}

object AvroSource {
  def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graftavro requires a path")
    p
  }

  def listFiles(dir: String): Seq[File] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isFile && f.getName.endsWith(".avro"))
      .sortBy(_.getName).toSeq

  def firstFile(dir: String): Option[File] = listFiles(dir).headOption

  /** Spark → Avro: record of the supported primitive subset; nullable
    * fields become union[null, T] (the standard Avro idiom). */
  def toAvroSchema(st: StructType): Schema = {
    val fields = SchemaBuilder.record("row").namespace("graft").fields()
    st.fields.foldLeft(fields) { (fs, f) =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"graftavro does not support ${other.catalogString} (field ${f.name})")
      }
      val sch = if (f.nullable)
        Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
      val fb = fs.name(f.name).`type`(sch)
      if (f.nullable) fb.withDefault(null) else fb.noDefault()
    }.endRecord()
  }

  /** Avro → Spark, for schema inference on a bare read. */
  def toStructType(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"not a record: $schema")
    StructType(schema.getFields.toArray(Array.empty[Schema.Field]).map { f =>
      val (s, nullable) = f.schema().getType match {
        case Schema.Type.UNION =>
          val branches = f.schema().getTypes
            .toArray(Array.empty[Schema]).filter(_.getType != Schema.Type.NULL)
          require(branches.length == 1, s"unsupported union ${f.schema()}")
          (branches.head, branches.length < f.schema().getTypes.size())
        case _ => (f.schema(), false)
      }
      val dt = s.getType match {
        case Schema.Type.LONG => LongType
        case Schema.Type.INT => IntegerType
        case Schema.Type.DOUBLE => DoubleType
        case Schema.Type.FLOAT => FloatType
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.STRING => StringType
        case Schema.Type.BYTES => BinaryType
        case other => throw new IllegalArgumentException(
          s"graftavro does not support avro type $other (field ${f.name()})")
      }
      StructField(f.name(), dt, nullable)
    })
  }
}

final class AvroTable(dir: String, schema0: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graftavro:$dir"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(dir, schema0)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var truncateFirst = false
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new AvroBatchWrite(dir, info.schema(), truncateFirst)
      }
    }
}

// ------------------------------------------------------------------- read
final class AvroScanBuilder(dir: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new AvroScan(dir, required)
}

final class AvroScan(dir: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftAvro $dir cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    AvroSource.listFiles(dir)
      .map(f => AvroFilePartition(f.getAbsolutePath))
      .toArray[InputPartition]
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(AvroSource.toAvroSchema(required).toString, required)
}

final case class AvroFilePartition(file: String) extends InputPartition

final class AvroReaderFactory(readerSchemaJson: String, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new AvroFileReader(
      p.asInstanceOf[AvroFilePartition].file, readerSchemaJson, required)
}

/** One container file, decoded under the PROJECTED reader schema: Avro
  * schema resolution (writer schema from the file header, reader schema
  * = the pruned columns) skips unused fields inside the decoder. */
final class AvroFileReader(
    file: String, readerSchemaJson: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private val readerSchema = new Schema.Parser().parse(readerSchemaJson)
  private val reader = new DataFileReader[GenericRecord](
    new File(file), new GenericDatumReader[GenericRecord](null, readerSchema))
  private var rec: GenericRecord = _
  // Per-row work is the scan hot path: resolve each required field's
  // Avro POSITION and conversion once here, so get() does array-indexed
  // rec.get(pos) + a pre-picked converter per field instead of a
  // name→field hash lookup and a type match per field per row
  // (round-10 review finding).
  private val fieldPos: Array[Int] =
    required.fields.map(f => readerSchema.getField(f.name).pos())
  private val convert: Array[AnyRef => AnyRef] =
    required.fields.map[AnyRef => AnyRef] { f =>
      f.dataType match {
        case StringType => v => UTF8String.fromString(v.toString)
        case BinaryType => {
          case bb: java.nio.ByteBuffer =>
            val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
          case v => v
        }
        case _ => identity // long/int/double/float/boolean box directly
      }
    }

  override def next(): Boolean = {
    val h = reader.hasNext
    if (h) rec = reader.next(rec) // object reuse — converted immediately
    h
  }

  override def get(): InternalRow = {
    val out = new Array[Any](fieldPos.length)
    var i = 0
    while (i < fieldPos.length) {
      val v = rec.get(fieldPos(i))
      out(i) = if (v == null) null else convert(i)(v.asInstanceOf[AnyRef])
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  override def close(): Unit = reader.close()
}

// ------------------------------------------------------------------ write
/** Driver-side coordinator of the two-phase commit: tasks stage
  * `*.avro.tmp` files; only `commit` renames winners into place (one per
  * partition — speculative/retried attempts are deleted) and publishes
  * `_SUCCESS`. `abort` removes every staged file. */
final class AvroBatchWrite(dir: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val d = new File(dir)
    d.mkdirs()
    if (truncate) {
      (AvroSource.listFiles(dir) :+ new File(d, "_SUCCESS"))
        .foreach(f => if (f.exists()) f.delete())
    }
    new AvroWriterFactory(dir, AvroSource.toAvroSchema(schema).toString, schema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val byPartition = messages.iterator
      .map(_.asInstanceOf[AvroCommitMessage])
      .toSeq.groupBy(_.partitionId)
    byPartition.toSeq.sortBy(_._1).foreach { case (_, attempts) =>
      val winner +: losers = attempts.sortBy(_.tmpFile): @unchecked
      val tmp = new File(winner.tmpFile)
      if (!tmp.renameTo(new File(winner.tmpFile.stripSuffix(".tmp"))))
        throw new java.io.IOException(s"rename failed: ${winner.tmpFile}")
      losers.foreach(l => new File(l.tmpFile).delete())
    }
    new File(dir, "_SUCCESS").createNewFile(): Unit
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case AvroCommitMessage(_, tmp) => new File(tmp).delete()
      case _ => ()
    }
}

final case class AvroCommitMessage(partitionId: Int, tmpFile: String)
    extends WriterCommitMessage

final class AvroWriterFactory(dir: String, schemaJson: String, st: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(dir, schemaJson, st, partitionId, taskId)
}

final class AvroDataWriter(
    dir: String, schemaJson: String, st: StructType,
    partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val schema = new Schema.Parser().parse(schemaJson)
  // taskId in the staged name keeps concurrent attempts of the SAME
  // partition from clobbering each other; the driver commit picks one
  private val tmp = new File(dir, f"part-$partitionId%05d-$taskId.avro.tmp")
  private val writer = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, tmp)
  }

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < st.fields.length) {
      val f = st.fields(i)
      val v: AnyRef =
        if (row.isNullAt(i)) null
        else f.dataType match {
          case LongType => java.lang.Long.valueOf(row.getLong(i))
          case IntegerType => java.lang.Integer.valueOf(row.getInt(i))
          case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
          case FloatType => java.lang.Float.valueOf(row.getFloat(i))
          case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
          case StringType => row.getUTF8String(i).toString
          case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
          case other => throw new IllegalArgumentException(
            s"graftavro does not support ${other.catalogString}")
        }
      // positional put: toAvroSchema folds st.fields in order, so Avro
      // field positions equal StructType indices — no name hash lookup
      // per field per row
      rec.put(i, v)
      i += 1
    }
    writer.append(rec)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    AvroCommitMessage(partitionId, tmp.getAbsolutePath)
  }
  override def abort(): Unit = {
    try writer.close() catch { case _: Throwable => () }
    tmp.delete(): Unit
  }
  override def close(): Unit = {}
}
