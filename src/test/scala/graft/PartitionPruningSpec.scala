package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-pruned data layout — at 100 TB the difference between
  * scanning a month and scanning the lake. Writes orders hive-partitioned
  * by year and proves (a) a year predicate becomes a PartitionFilter that
  * eliminates directories before any IO, and (b) range-partitioned writes
  * produce the sorted file layout range queries want. */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-part").toString
    Tables.load(spark, TestSpark.sf0001, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(s"$d/orders_by_year")
    d
  }

  test("a partition-column predicate prunes directories, not just rows") {
    val df = spark.read.parquet(s"$dir/orders_by_year")
      .filter(col("o_year") === 1995)
      .select("o_orderkey", "o_totalprice")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"), plan)
    // the scan's selected partitions must be a single year directory
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val selected = scans.head.relation.location.listFiles(
      scans.head.partitionFilters, scans.head.dataFilters)
    assert(selected.size === 1, s"expected 1 partition, got ${selected.size}")
    // and the values are right
    val years = spark.read.parquet(s"$dir/orders_by_year")
      .filter(col("o_year") === 1995)
      .select(year(col("o_orderdate"))).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(years === Seq(1995))
  }

  test("partitioned write + read round-trips all rows") {
    val n = spark.read.parquet(s"$dir/orders_by_year").count()
    assert(n === Tables.load(spark, TestSpark.sf0001, "orders").count())
  }

  test("repartitionByRange produces range-disjoint output partitions") {
    val parts = Tables.load(spark, TestSpark.sf0001, "orders")
      .repartitionByRange(4, col("o_orderdate"))
      .select(unix_micros(col("o_orderdate").cast("timestamp")).as("d"))
      .rdd.mapPartitions(it => {
        val xs = it.map(_.getLong(0)).toSeq
        if (xs.isEmpty) Iterator.empty
        else Iterator.single((xs.min, xs.max))
      }).collect().sortBy(_._1)
    // consecutive partitions must not overlap
    parts.sliding(2).foreach {
      case Array((_, max1), (min2, _)) => assert(max1 <= min2)
      case _ =>
    }
    assert(parts.length >= 2)
  }

  // ---- the registered layout queries (q55 static / q56 dynamic) ------

  import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

  /** All plan nodes, descending through AQE wrappers (whose `children`
    * is empty — the Bench.leaves lesson). */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
    case q: QueryStageExec        => q +: nodes(q.plan)
    case o                        => o +: o.children.flatMap(nodes)
  }

  /** The scan over the o_year-partitioned orders copy, from the FINAL
    * (post-AQE) plan; numPartitions is its partitions-read metric. */
  private def factScan(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    nodes(df.queryExecution.executedPlan).collectFirst {
      case f: FileSourceScanExec
          if f.relation.partitionSchema.fieldNames.contains("o_year") => f
    }.getOrElse(fail(df.queryExecution.executedPlan.toString))

  test("q55: the o_year predicate reads exactly one partition directory") {
    val df = graft.queries.Registry.byName("q55_pruned_year_revenue")
      .run(spark, TestSpark.sf0001)
    df.collect()
    val scan = factScan(df)
    assert(scan.partitionFilters.nonEmpty, scan.toString)
    assert(scan.metrics("numPartitions").value === 1,
      s"expected 1 of 7 year dirs read, got ${scan.metrics("numPartitions").value}")
  }

  test("q56: scan carries a dynamic pruning filter and reads only 'mid' years") {
    val df = graft.queries.Registry.byName("q56_dpp_era_revenue")
      .run(spark, TestSpark.sf0001)
    df.collect()
    val scan = factScan(df)
    val pf = scan.partitionFilters
    assert(pf.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])),
      s"expected a dynamic pruning filter on the fact scan, got: ${pf.mkString("; ")}")
    assert(scan.metrics("numPartitions").value === 2,
      s"expected DPP to read 2 of 7 year dirs, got ${scan.metrics("numPartitions").value}")
  }
}
