package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** INSERT OVERWRITE with DYNAMIC partition overwrite — the idempotent
  * daily-rerun primitive of a partitioned warehouse. A pipeline that
  * recomputes day D must replace EXACTLY partition D: static overwrite
  * mode truncates the whole table first (re-running one day deletes
  * all history); dynamic mode replaces only the partitions present in
  * the incoming data. At 100 TB this is the difference between an
  * idempotent backfill and a table wipe, so the semantics are pinned
  * here on a hive-style year-partitioned orders copy.
  */
class InsertOverwriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("dynamic INSERT OVERWRITE replaces only the incoming partitions") {
    import spark.implicits._
    val tbl = "iow_orders_part"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")
      .select($"o_orderkey", $"o_totalprice",
        year($"o_orderdate".cast("date")).as("o_year"))
    orders.write.partitionBy("o_year").format("parquet").saveAsTable(tbl)

    val years = spark.table(tbl).select($"o_year").distinct()
      .as[Int].collect().sorted
    assert(years.length > 2)
    val target = years.head
    val beforeOther = spark.table(tbl).filter($"o_year" =!= target)
      .agg(count(lit(1)), sum($"o_orderkey")).head
    val beforeTargetN = spark.table(tbl)
      .filter($"o_year" === target).count()

    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // the "recomputed day": same target-year rows, price doubled,
      // half the rows — a visibly different partition payload
      orders.filter($"o_year" === target && $"o_orderkey" % 2 === 0)
        .withColumn("o_totalprice", $"o_totalprice" * 2)
        .write.mode("overwrite").insertInto(tbl)

      // target partition fully replaced ...
      val afterTarget = spark.table(tbl).filter($"o_year" === target)
      assert(afterTarget.count() < beforeTargetN)
      assert(afterTarget.filter($"o_orderkey" % 2 =!= 0).count() === 0)
      // ... every other partition byte-untouched
      val afterOther = spark.table(tbl).filter($"o_year" =!= target)
        .agg(count(lit(1)), sum($"o_orderkey")).head
      assert(afterOther === beforeOther)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }
}
