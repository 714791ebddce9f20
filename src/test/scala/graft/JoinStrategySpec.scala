package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Join-strategy surface (§2.B joins): the same equi-join must lower to
  * broadcast-hash, shuffled-hash, or sort-merge purely by configuration
  * — with BIT-IDENTICAL results. At 100 TB this is the lever that
  * matters most per byte: SMJ spills gracefully (sort + streamed merge),
  * shuffled-hash avoids the sort when one side fits per-partition
  * memory, broadcast deletes the fact-side shuffle entirely. The specs
  * pin that Spark respects the knobs (no silent hint override) so
  * deployment tuning is real.
  */
class JoinStrategySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def withConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** The join, with the build side carrying the given strategy hint
    * ("" = hint-free, session confs decide). */
  private def joined(hint: String) = {
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
    val right = if (hint.isEmpty) orders else orders.hint(hint)
    Tables.load(spark, dir, "lineitem")
      .join(right, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(18,4)")).as("qty"))
      .orderBy($"o_orderpriority")
  }

  private def canon(hint: String) =
    joined(hint).collect().map(_.toString).toSeq

  test("one join, three strategies via hints, identical results") {
    // The hint surface is the user-facing strategy lever; each hint
    // must change the physical join, never the values.
    val base = canon("")
    for ((hint, node) <- Seq(
        "broadcast" -> "BroadcastHashJoin",
        "merge" -> "SortMergeJoin",
        "shuffle_hash" -> "ShuffledHashJoin")) {
      val p = joined(hint).queryExecution.executedPlan.toString
      assert(p.contains(node), s"hint=$hint expected $node in:\n$p")
      assert(canon(hint) === base, s"hint=$hint changed values")
    }
  }

  test("with broadcast disabled, the hint-free join sort-merges") {
    // canBuildLocalHashMap keys off autoBroadcastJoinThreshold, so
    // threshold=-1 rules out BOTH broadcast and shuffled-hash: SMJ is
    // the spill-safe strategy of last resort — exactly what you want
    // chosen when a 100 TB join's sides defeat the size heuristics.
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val p = joined("").queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
    }
  }
}
