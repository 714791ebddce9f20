package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join splitting — the RUNTIME half of the skew story
  * (operators/SaltedJoin is the write-time half, used by q26). When one
  * join key owns a disproportionate share of rows, the naive shuffle
  * sends it all to one reducer and the stage runs at the speed of that
  * straggler. AQE instead observes the actual map-output sizes and
  * splits the oversized partition into multiple reader tasks, each
  * joined against a duplicated copy of the other side's partition —
  * no code change, no salt columns, exact same result.
  *
  * The thresholds are lowered so a planted ~100× hot key qualifies as
  * "skewed" at test scale (the defaults target 256 MB partitions);
  * the law asserted is the one that matters at 100 TB: the physical
  * SMJ is marked isSkewJoin AND the result is bit-identical to the
  * unsplit join. Confs saved/restored — the session is shared.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val tuned = Map(
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
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

  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
    case q: QueryStageExec        => q +: nodes(q.plan)
    case o                        => o +: o.children.flatMap(nodes)
  }

  /** ~100× planted hot key 0; a fat payload column makes the hot
    * partition exceed the lowered byte threshold. */
  private def skewed() = {
    import spark.implicits._
    val left = spark.range(60000)
      .select(when($"id" < 54000, 0L).otherwise($"id" % 600).as("k"),
        concat(lit("payload-"), lpad($"id".cast("string"), 96, "x")).as("pay"))
    val right = spark.range(600).select($"id".as("k"),
      concat(lit("dim-"), $"id".cast("string")).as("tag"))
    left.join(right, "k")
  }

  test("AQE splits the planted hot partition (isSkewJoin) with an exact result") {
    val expectedCnt = 60000L // every left row matches exactly one dim row
    // execute the dataset's OWN plan inside the tuned-conf scope:
    // Dataset.count() spawns a separate QueryExecution, and a plan
    // first touched after the conf restore would re-plan under the
    // defaults (observed: a broadcast join with isFinalPlan=false)
    val df = withConfs(tuned) {
      val d = skewed()
      assert(d.queryExecution.toRdd.count() === expectedCnt)
      d
    }
    val smjs = nodes(df.queryExecution.executedPlan)
      .collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(smjs.exists(_.isSkewJoin),
      "expected AQE to mark the join isSkewJoin; plan:\n" +
        df.queryExecution.executedPlan.toString)
    // exactness: per-key counts identical to the logical expectation —
    // 54,000 planted + the 10 ids in [54000, 60000) divisible by 600
    val hot = withConfs(tuned) {
      skewed().groupBy("k").count().filter(col("k") === 0)
        .collect().head.getLong(1)
    }
    assert(hot === 54010L)
  }
}
