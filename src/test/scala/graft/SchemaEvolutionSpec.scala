package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Schema evolution — the ingest reality a 100 TB corpus lives with:
  * files written months apart carry different column sets. Two
  * mechanisms, both pinned: parquet `mergeSchema` (storage-side union
  * of file footers; missing columns read as null) and
  * `unionByName(allowMissingColumns)` (relational-side union by NAME,
  * not position — positional union silently mispairs evolved schemas).
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("parquet mergeSchema unions evolving file footers") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "old")).toDF("id", "tag")
      .write.mode("append").parquet(dir)
    Seq((2L, "new", 10L)).toDF("id", "tag", "score")
      .write.mode("append").parquet(dir)

    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.sorted.toSeq === Seq("id", "score", "tag"))
    val rows = df.orderBy("id")
      .collect().map(r => (r.getLong(0),
        r.getString(df.columns.indexOf("tag")),
        if (r.isNullAt(df.columns.indexOf("score"))) None
        else Some(r.getLong(df.columns.indexOf("score")))))
    assert(rows.toSeq === Seq((1L, "old", None), (2L, "new", Some(10L))))

    // predicates on a column absent from old files still push down and
    // treat those files' rows as null (filtered out), not as errors
    assert(df.filter($"score" === 10L).count() === 1)
  }

  test("unionByName aligns evolved schemas by name, not position") {
    import spark.implicits._
    val v1 = Seq((1L, "a")).toDF("id", "tag")
    // evolved writer reordered columns AND added one — positional union
    // would pair tag with score
    val v2 = Seq(("b", 2L, 99L)).toDF("tag", "id", "score")
    val u = v1.unionByName(v2, allowMissingColumns = true)
    val got = u.orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("tag"),
        Option(r.getAs[java.lang.Long]("score")).map(_.toLong)))
    assert(got.toSeq === Seq((1L, "a", None), (2L, "b", Some(99L))))
  }
}
