package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning (InjectRuntimeFilter) — the
  * row-group-level cousin of q56's dynamic PARTITION pruning. When a
  * selective dim filter sits on one side of a shuffle equi-join, Spark
  * can build a bloom filter over the dim's join keys and evaluate it
  * inside the fact scan, discarding non-matching rows before the
  * shuffle (and, pushed into parquet row-group stats, before IO). At
  * 100 TB this turns "shuffle the whole fact table to drop 99% of it
  * in the join" into "drop 99% of it at the scan" — the single biggest
  * shuffle-volume lever after partition layout.
  *
  * Local thresholds: the application-side scan must look big enough
  * (default threshold 10 GB), so the spec lowers it to 0 and disables
  * auto-broadcast to get the shuffle-join shape the rule targets.
  * Confs are saved/restored — the session is shared across suites.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val tuned = Map(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private def withConfs[A](kv: Map[String, String])(body: => A): A = {
    val saved = kv.keys.map(k => k -> spark.conf.getOption(k)).toMap
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Selective-dim fact join: urgent high-value orders × lineitem. */
  private def factJoin() = {
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
    val o = Tables.load(spark, TestSpark.sf0001, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 150000)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
  }

  test("a selective dim filter injects bloom_filter pruning into the fact side") {
    withConfs(tuned) {
      val df = factJoin()
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"expected an injected bloom-filter runtime filter, got:\n$opt")
      // the filter must sit on the FACT (lineitem) side, keyed by the
      // join key, i.e. before the shuffle — not above the join
      assert(opt.indexOf("might_contain") > opt.indexOf("Aggregate"), opt)
    }
  }

  test("bloom-filter pruning preserves the join result exactly") {
    val expected = factJoin().collect().toSeq // defaults: no runtime filter
    val got = withConfs(tuned)(factJoin().collect().toSeq)
    assert(got === expected)
  }
}
