package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Malformed-input handling on the CSV ingest path — at 100 TB some
  * rows ARE broken, and the mode decides whether the pipeline
  * quarantines, drops, or stops: PERMISSIVE keeps the row with nulls +
  * the raw line in a corrupt-record column (quarantine-and-continue,
  * the q82 philosophy at the source layer), DROPMALFORMED silently
  * drops, FAILFAST kills the read. All three pinned. */
class CsvRobustnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-badcsv")
    Files.writeString(Paths.get(d.toString, "part.csv"),
      """1,alpha,10.5
        |2,beta,not-a-number
        |3,gamma,30.25
        |broken line without commas
        |5,epsilon,50.0
        |""".stripMargin)
    d.toString
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("_corrupt_record", StringType)))

  test("PERMISSIVE quarantines malformed rows in _corrupt_record") {
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache() // corrupt-column queries need the materialized read
    try {
      assert(df.count() === 5) // every line survives
      val bad = df.filter(col("_corrupt_record").isNotNull)
        .select("_corrupt_record").collect().map(_.getString(0)).sorted
      assert(bad.length === 2)
      assert(bad.exists(_.contains("not-a-number")))
      assert(bad.exists(_.contains("broken line")))
      // clean rows parse fully
      assert(df.filter(col("_corrupt_record").isNull).count() === 3)
      assert(df.agg(sum("id")).collect().head.getLong(0) === 1 + 3 + 5 + 2)
      // id=2 parses (only score failed → whole row quarantined but
      // typed fields that precede... no: PERMISSIVE sets parsed fields
      // where possible; id=2 is readable) — pin actual behavior:
      val row2 = df.filter(col("id") === 2).collect()
      assert(row2.length === 1 && row2.head.isNullAt(2),
        "bad double must read as null in PERMISSIVE")
    } finally df.unpersist()
  }

  test("DROPMALFORMED row set DEPENDS ON PROJECTION (the documented footgun)") {
    // Malformedness is judged over the columns the query actually
    // parses. Reading every column: the "not-a-number" double fails
    // conversion → row 2 is malformed → dropped. Reading only `id`:
    // column pruning means `score` is never parsed → row 2 SURVIVES.
    // Same file, same mode, different row sets — which is why the
    // engine's ingest queries (q57, Tables.codecEvents) use PERMISSIVE
    // with explicit schemas, never DROPMALFORMED: a mode whose
    // semantics change under projection pushdown cannot feed a
    // deterministic gate.
    val read = spark.read
      .schema(StructType(schema.fields.dropRight(1)))
      .option("mode", "DROPMALFORMED")
      .csv(dir)
    val allCols = read.collect().map(_.getLong(0)).sorted
    assert(allCols.toSeq === Seq(1L, 3L, 5L))
    val idOnly = read.select("id").collect().map(_.getLong(0)).sorted
    assert(idOnly.toSeq === Seq(1L, 2L, 3L, 5L))
  }

  test("FAILFAST raises on the first malformed row") {
    val err = intercept[Exception] {
      spark.read
        .schema(StructType(schema.fields.dropRight(1)))
        .option("mode", "FAILFAST")
        .csv(dir).collect()
    }
    assert(err.getMessage.toLowerCase.contains("malformed") ||
      err.getCause != null)
  }
}
