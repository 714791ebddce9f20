package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom DSv2 sink (sources/MemSink): the two-phase commit
  * contract must hold — data becomes visible only through the driver
  * commit, and a failed job leaves the table exactly as it was. */
class MemSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("write → driver commit → read-back round trip") {
    MemSink.clear("t_round")
    val df = spark.range(0, 1000, 1, 8)
      .select($"id", concat(lit("row-"), $"id").as("tag"))
    df.write.format("graftmem").option("table", "t_round")
      .mode("append").save()

    val back = spark.read.format("graftmem").option("table", "t_round").load()
    assert(back.schema.fieldNames.toSeq === Seq("id", "tag"))
    assert(back.count() === 1000)
    assert(back.agg(sum($"id")).as[Long].head() === (0L until 1000L).sum)
    assert(back.filter($"tag" === "row-77").count() === 1)
  }

  test("a failed task aborts the job and leaves the table untouched") {
    MemSink.clear("t_abort")
    // seed a committed state to prove abort doesn't clobber it
    Seq((1L, "keep")).toDF("id", "tag")
      .write.format("graftmem").option("table", "t_abort")
      .mode("append").save()

    val poison = udf((id: Long) =>
      if (id == 500L) throw new RuntimeException("poisoned row") else id)
    val failing = spark.range(0, 1000, 1, 8)
      .select(poison($"id").as("id"), lit("new").as("tag"))
    intercept[Exception] {
      failing.write.format("graftmem").option("table", "t_abort")
        .mode("append").save()
    }

    // commit never ran: the pre-existing rows are still the table
    val back = spark.read.format("graftmem").option("table", "t_abort").load()
    assert(back.collect().map(_.toSeq).toSeq === Seq(Seq(1L, "keep")))
  }

  private def MemSink = graft.sources.MemSink
}
