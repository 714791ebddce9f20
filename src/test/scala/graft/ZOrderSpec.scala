package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout (Tables.zordered, q95): multi-dimensional clustering
  * must deliver what it promises — row-group skipping on EVERY
  * clustered column, not just a lead sort column. The load-bearing
  * tests measure the parquet scan's numOutputRows (rows surviving
  * footer-stat row-group pruning) on the Morton-clustered copy vs a
  * conventional date-sorted copy of the same 1,500 orders:
  * a custkey-only band must prune on the Z layout while the date-sort
  * reads everything, and both layouts must return identical results.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val zorder: DataFrame =
    Tables.zordered(spark, TestSpark.sf0001)

  /** The 1-D comparison layout: same data, same file count, clustered
    * on o_orderdate alone — what a "sort by time" pipeline produces. */
  private lazy val dateSorted: DataFrame = {
    val d = Files.createTempDirectory("graft-datesort").toString
    Tables.load(spark, TestSpark.sf0001, "orders")
      .repartitionByRange(16, col("o_orderdate"))
      .sortWithinPartitions("o_orderdate")
      .write.mode("overwrite").parquet(d)
    spark.read.parquet(d)
  }

  private lazy val total: Long =
    Tables.load(spark, TestSpark.sf0001, "orders").count()

  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
    case q: QueryStageExec        => q +: nodes(q.plan)
    case o                        => o +: o.children.flatMap(nodes)
  }

  /** Rows the parquet scan MATERIALIZED (post row-group pruning, pre
    * Filter) — the IO-proportional number the layout exists to shrink. */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    nodes(df.queryExecution.executedPlan).collectFirst {
      case f: FileSourceScanExec => f.metrics("numOutputRows").value
    }.getOrElse(fail("no FileSourceScanExec in plan"))
  }

  private def custkeyBand(df: DataFrame): DataFrame =
    df.filter(col("o_custkey").between(8, 29))

  test("the z-ordered copy round-trips all rows and values") {
    assert(zorder.count() === total)
    // decimal sum: row order differs between the layouts, so a double
    // sum would drift in the last ulps
    val fp = Seq(sum(col("o_totalprice").cast("decimal(18,4)")),
      sum(col("o_custkey")))
    val a = zorder.agg(fp.head, fp.tail: _*).head
    val b = Tables.load(spark, TestSpark.sf0001, "orders")
      .agg(fp.head, fp.tail: _*).head
    assert(a === b)
  }

  test("a custkey-only band prunes row groups on Z; the date-sort cannot") {
    val zRows = scanRows(custkeyBand(zorder))
    val dRows = scanRows(custkeyBand(dateSorted))
    // identical answers first
    assert(custkeyBand(zorder).count() === custkeyBand(dateSorted).count())
    // the date-sorted layout has no custkey locality: every file's
    // min/max spans the band, nothing is skipped
    assert(dRows >= (total * 0.95).toLong,
      s"date-sorted copy unexpectedly pruned: $dRows of $total")
    // the Z layout confines the band to the files whose Z-cells
    // intersect it (~top-2 custkey bits fixed → ~1/4 of cells)
    assert(zRows <= (total * 0.6).toLong,
      s"z-ordered copy failed to prune: $zRows of $total")
    assert(zRows < dRows)
    System.err.println(
      s"[zorder] custkey band: z-ordered scanned $zRows rows, " +
        s"date-sorted $dRows, table $total")
  }

  test("the q95 2-D box prunes row groups on the Z layout") {
    val box = Seq(zorder, dateSorted).map(df => df.filter(
      col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") <= lit("1995-06-30").cast("timestamp_ntz") &&
        col("o_custkey").between(30, 59)))
    assert(box(0).count() === box(1).count())
    val zRows = scanRows(box(0))
    // the box touches only the Z-cells intersecting BOTH ranges —
    // well under the full table even at 16-file granularity
    assert(zRows <= (total * 0.6).toLong,
      s"z-ordered copy failed to prune the 2-D box: $zRows of $total")
    System.err.println(s"[zorder] 2-D box: z-ordered scanned $zRows rows of $total")
  }

  test("q95 matches the same aggregation over the unordered original") {
    val q95 = queries.Registry.byName("q95_zorder_box")
      .run(spark, TestSpark.sf0001)
    val expected = Tables.load(spark, TestSpark.sf0001, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") <= lit("1995-06-30").cast("timestamp_ntz") &&
        col("o_custkey").between(30, 59))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = q95.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
    // both predicates reached the parquet scan
    val scan = nodes(q95.queryExecution.executedPlan).collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no scan"))
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("o_custkey") && pushed.contains("o_orderdate"),
      s"box predicates not pushed: $pushed")
  }
}
