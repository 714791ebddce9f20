package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The custom DSv2 Avro source/sink (sources/AvroSource): round-trip
  * fidelity for the supported primitive subset (incl. nulls), the
  * two-phase write contract (overwrite truncates, a failed job leaves
  * the committed state intact, no stray .tmp files), and column
  * pruning reaching the Avro decoder's reader schema. */
class AvroSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("rank", IntegerType),
    StructField("score", DoubleType),
    StructField("ratio", FloatType),
    StructField("flag", BooleanType),
    StructField("name", StringType),
    StructField("blob", BinaryType)))

  private def sampleDf = {
    val rows = Seq(
      org.apache.spark.sql.Row(1L, 10, 1.5, 2.5f, true, "alpha",
        Array[Byte](1, 2, 3)),
      org.apache.spark.sql.Row(2L, null, -0.25, null, false, null, null),
      org.apache.spark.sql.Row(3L, 30, Double.MaxValue, 0.0f, null, "γráft",
        Array.empty[Byte]))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-avro-$tag")
    d.toString
  }

  test("round trip: all supported types, nulls, multiple partitions") {
    val dir = tmpDir("rt")
    sampleDf.write.format("graftavro").mode("overwrite").save(dir)
    assert(new java.io.File(dir, "_SUCCESS").exists())
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".tmp")))

    val back = spark.read.schema(schema).format("graftavro").load(dir)
      .orderBy("id").collect()
    val want = sampleDf.orderBy("id").collect()
    assert(back.length === want.length)
    back.zip(want).foreach { case (b, w) =>
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        (b.get(i), w.get(i)) match {
          case (x: Array[Byte], y: Array[Byte]) => assert(x.sameElements(y), f.name)
          case (x, y) => assert(x === y, f.name)
        }
      }
    }
  }

  test("overwrite truncates the previous committed files") {
    val dir = tmpDir("ow")
    sampleDf.write.format("graftavro").mode("overwrite").save(dir)
    Seq((99L, "only")).toDF("id", "name")
      .write.format("graftavro").mode("overwrite").save(dir)
    val back = spark.read.schema("id LONG, name STRING")
      .format("graftavro").load(dir)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((99L, "only")))
  }

  test("schema inference from the container header") {
    val dir = tmpDir("inf")
    sampleDf.write.format("graftavro").mode("overwrite").save(dir)
    val inferred = spark.read.format("graftavro").load(dir).schema
    assert(inferred.fieldNames.toSeq === schema.fieldNames.toSeq)
    assert(inferred("id").dataType === LongType)
    assert(inferred("blob").dataType === BinaryType)
  }

  test("a failed job stages but never publishes; committed state survives") {
    val dir = tmpDir("ab")
    Seq((1L, "keep")).toDF("id", "name")
      .write.format("graftavro").mode("overwrite").save(dir)
    val poison = udf((id: Long) =>
      if (id == 500L) throw new RuntimeException("poisoned row") else id)
    intercept[Exception] {
      spark.range(0, 1000, 1, 8)
        .select(poison($"id").as("id"), lit("new").as("name"))
        .write.format("graftavro").mode("append").save(dir)
    }
    val back = spark.read.schema("id LONG, name STRING")
      .format("graftavro").load(dir)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "keep")))
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".tmp")),
      "aborted attempts must clean their staged files")
  }

  test("column pruning reaches the Avro reader schema") {
    val dir = tmpDir("pr")
    sampleDf.write.format("graftavro").mode("overwrite").save(dir)
    val q = spark.read.schema(schema).format("graftavro").load(dir)
      .select("name")
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }
    assert(scans.nonEmpty, "expected a BatchScanExec")
    assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("name"),
      "pruned read schema must carry only the projected column")
    assert(q.collect().map(_.getString(0)).toSet === Set("alpha", null, "γráft"))
  }

  test("codecEvents avro arm matches the parquet source exactly") {
    val dir = TestSpark.sf0001
    val avro = Tables.codecEvents(spark, dir, "avro")
      .orderBy("event_id").collect()
    val pq = Tables.load(spark, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id").collect()
    assert(avro.length === pq.length)
    assert(avro.take(200).map(_.toSeq).toSeq === pq.take(200).map(_.toSeq).toSeq)
  }
}
