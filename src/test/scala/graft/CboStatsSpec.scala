package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANALYZE-driven cost-based optimization — the metadata half of the
  * scale story. At 100 TB the optimizer's join strategy, join ORDER and
  * shuffle sizing all hang off cardinality estimates; without ANALYZE
  * those estimates are raw file sizes (every derived plan node falls
  * back to "same bytes as my child"). This spec pins the chain the
  * engine relies on:
  *
  *   ANALYZE TABLE → catalog rowCount/colStats → CBO row-count
  *   propagation → FilterEstimation tightening a selective predicate.
  *
  * q48 is the query-side face of the same idea (it computes the per-
  * column profile ANALYZE stores); here the catalog path itself is
  * exercised on the bucketed lineitem copy that q03b joins.
  */
class CboStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withConfs[A](kv: Map[String, String])(body: => A): A = {
    val saved = kv.keys.map(k => k -> spark.conf.getOption(k)).toMap
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("ANALYZE TABLE feeds CBO row counts and tightens filter estimates") {
    // materialize + analyze the catalog-bucketed lineitem copy
    Tables.bucketed(spark, TestSpark.sf0001, "lineitem", "l_orderkey",
      Seq("l_orderkey", "l_extendedprice", "l_discount"))
    val tbl = Tables.bucketedTableName(TestSpark.sf0001, "lineitem")
    spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS")
    spark.sql(
      s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR COLUMNS l_orderkey, l_extendedprice")

    withConfs(Map("spark.sql.cbo.enabled" -> "true")) {
      val rel = spark.table(tbl)
      val full = rel.queryExecution.optimizedPlan.stats
      val trueRows = rel.count()
      assert(full.rowCount.isDefined, "ANALYZE did not surface a rowCount")
      assert(full.rowCount.get.toLong === trueRows)
      // column stats made it into the estimation pipeline
      val colStats = full.attributeStats.map { case (a, s) => a.name -> s }
      assert(colStats.get("l_orderkey").exists(_.distinctCount.isDefined),
        s"no NDV for l_orderkey in $colStats")

      // FilterEstimation: a selective range predicate must shrink the
      // ESTIMATED cardinality (this estimate is what decides broadcast
      // vs shuffle and join order at scale), and the estimate must be
      // in the neighborhood of the true selectivity, not a fallback
      val maxKey = rel.agg(max(col("l_orderkey"))).collect().head.getLong(0)
      val cut = maxKey / 10
      val filtered = rel.filter(col("l_orderkey") <= cut)
      val est = filtered.queryExecution.optimizedPlan.stats
      assert(est.rowCount.isDefined)
      val estimated = est.rowCount.get.toLong
      val actual = filtered.count()
      assert(estimated < trueRows,
        s"filter estimate $estimated did not tighten below $trueRows")
      // range estimation over a roughly uniform key: within 3x of truth
      assert(estimated <= actual * 3 && estimated * 3 >= actual,
        s"estimate $estimated vs actual $actual — estimation broken")
    }
  }
}
