package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf

/** Correctness laws for the native sorted-merge as-of join
  * (graft.plans.AsOfJoinPlan/Exec). The independent reference is the
  * union + ordered-window composite — the same formulation q37 ships —
  * computed over the identical inputs; q37b's DuckDB ASOF JOIN oracle is
  * the third implementation. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // (key, time, event payload)
  private def leftDf(rows: Seq[(java.lang.Long, Timestamp, String)]): DataFrame =
    rows.toDF("k", "t", "tag")
  private def rightDf(rows: Seq[(java.lang.Long, Timestamp, java.lang.Long)]): DataFrame =
    rows.toDF("rk", "rt", "payload")

  private def native(l: DataFrame, r: DataFrame): Seq[(Option[Long], String, Option[Long])] =
    AsOf.joinBackward(l, r, l("k"), r("rk"), l("t"), r("rt"))
      .select($"k", $"tag", $"payload")
      .collect()
      .map(x => (Option(x.get(0)).map(_.asInstanceOf[Long]), x.getString(1),
        Option(x.get(2)).map(_.asInstanceOf[Long])))
      .toSeq.sortBy(x => (x._1, x._2))

  /** The window composite (q37's formulation) as the in-Spark reference. */
  private def composite(l: DataFrame, r: DataFrame): Seq[(Option[Long], String, Option[Long])] = {
    val lt = l.select($"k", $"t", lit(1).as("is_l"), $"tag",
      lit(null).cast("bigint").as("payload"))
    val rt = r.select($"rk".as("k"), $"rt".as("t"), lit(0).as("is_l"),
      lit(null).cast("string").as("tag"), $"payload")
    val w = Window.partitionBy($"k").orderBy($"t", $"is_l")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rt.unionAll(lt)
      .withColumn("m", last($"payload", ignoreNulls = true).over(w))
      .filter($"is_l" === 1 && $"k".isNotNull && $"t".isNotNull)
      .select($"k", $"tag", $"m")
      .collect()
      .map(x => (Option(x.get(0)).map(_.asInstanceOf[Long]), x.getString(1),
        Option(x.get(2)).map(_.asInstanceOf[Long])))
      .toSeq.sortBy(x => (x._1, x._2))
  }

  test("backward as-of matches the window composite on a mixed fixture") {
    val l = leftDf(Seq(
      (1L: java.lang.Long, ts("2024-01-01 10:00:00"), "a"),
      (1L: java.lang.Long, ts("2024-01-01 12:00:00"), "b"),
      (1L: java.lang.Long, ts("2024-01-01 09:00:00"), "early"),
      (2L: java.lang.Long, ts("2024-01-01 11:00:00"), "c"),
      (3L: java.lang.Long, ts("2024-01-01 11:00:00"), "nokey")))
    val r = rightDf(Seq(
      (1L: java.lang.Long, ts("2024-01-01 09:30:00"), 10L: java.lang.Long),
      (1L: java.lang.Long, ts("2024-01-01 11:30:00"), 11L: java.lang.Long),
      (2L: java.lang.Long, ts("2024-01-01 11:00:00"), 20L: java.lang.Long)))
    val got = native(l, r)
    assert(got === composite(l, r))
    // Spot semantics: exact-equal timestamp matches (inclusive <=);
    // events before any order get NULL.
    assert(got.contains((Some(1L), "a", Some(10L))))
    assert(got.contains((Some(1L), "b", Some(11L))))
    assert(got.contains((Some(1L), "early", None)))
    assert(got.contains((Some(2L), "c", Some(20L))))
    assert(got.contains((Some(3L), "nokey", None)))
  }

  test("empty right side yields all-null matches, one row per left row") {
    val l = leftDf(Seq(
      (1L: java.lang.Long, ts("2024-01-01 10:00:00"), "a"),
      (2L: java.lang.Long, ts("2024-01-01 10:00:00"), "b")))
    val r = rightDf(Seq.empty)
    assert(native(l, r) ===
      Seq((Some(1L), "a", None), (Some(2L), "b", None)))
  }

  test("null keys and null times never match and are never matched") {
    val l = leftDf(Seq(
      (null, ts("2024-01-01 10:00:00"), "nullkey"),
      (1L: java.lang.Long, null, "nulltime"),
      (1L: java.lang.Long, ts("2024-01-01 10:00:00"), "ok")))
    val r = rightDf(Seq(
      (null, ts("2024-01-01 09:00:00"), 98L: java.lang.Long),
      (1L: java.lang.Long, null, 99L: java.lang.Long),
      (1L: java.lang.Long, ts("2024-01-01 09:00:00"), 42L: java.lang.Long)))
    val got = native(l, r)
    assert(got.contains((None, "nullkey", None)))
    assert(got.contains((Some(1L), "nulltime", None)))
    assert(got.contains((Some(1L), "ok", Some(42L))))
  }

  test("randomized differential law vs the window composite") {
    // Deterministic pseudo-random fixture: 400 left / 200 right rows over
    // 20 keys and a 10-day span, duplicate (key, time) pairs excluded on
    // the right (as-of requires unique match points for determinism).
    val rng = new scala.util.Random(20240612L)
    val base = ts("2024-01-01 00:00:00").getTime
    val l = leftDf((0 until 400).map { i =>
      (java.lang.Long.valueOf(rng.nextInt(20).toLong),
        new Timestamp(base + rng.nextInt(864000) * 1000L), s"e$i")
    })
    val rRows = (0 until 200).map { i =>
      (java.lang.Long.valueOf(rng.nextInt(20).toLong),
        new Timestamp(base + rng.nextInt(864000) * 1000L),
        java.lang.Long.valueOf(i.toLong))
    }.distinctBy(x => (x._1, x._2))
    val r = rightDf(rRows)
    assert(native(l, r) === composite(l, r))
  }

  test("left-side filters push through the as-of join to the scan") {
    // A filter applied ABOVE the native join on left-only columns must
    // reach the left parquet scan (PushFilterThroughAsOfJoin), and a
    // filter on the matched right payload must stay above the join.
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
      .select($"event_id", $"user_id", $"ts", $"event_type")
    val od = Tables.load(spark, TestSpark.sf0001, "orders")
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("o_orderkey"))
    val joined = AsOf.joinBackward(ev, od,
      ev("user_id"), od("o_custkey"), ev("ts"), od("o_orderdate"))
    def pushedFilters(plan: String): String =
      """PushedFilters: \[[^\]]*\]""".r.findAllIn(plan).mkString("\n")
    val pushed = joined.filter($"event_type" === "purchase")
    val pPushed = pushed.queryExecution.executedPlan.toString
    assert(pushedFilters(pPushed).contains("event_type"), pPushed)
    // Equivalence under the rewrite: same rows as filtering afterwards
    // with the rule unable to fire (filter on a fresh alias boundary).
    val expected = joined.collect().filter(r =>
      r.getAs[String]("event_type") == "purchase").length
    assert(pushed.count() === expected)
    // Right-payload filter does NOT reach the left scan's pushed filters.
    val kept = joined.filter($"o_orderkey" > 100)
    val pKept = kept.queryExecution.executedPlan.toString
    assert(!pushedFilters(pKept).contains("o_orderkey"), pKept)
    // ...and the filter survives above the join.
    val joinLine = pKept.linesIterator.indexWhere(_.contains("AsOfJoin"))
    val filterLine = pKept.linesIterator.indexWhere(_.contains("Filter"))
    assert(filterLine >= 0 && filterLine < joinLine, pKept)
  }

  test("q37b physical plan contains AsOfJoin with sorted+clustered children") {
    val df = graft.queries.Registry.byName("q37b_asof_native")
      .run(spark, TestSpark.sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    // EnsureRequirements planted the contract: a Sort directly feeding
    // each side of the as-of join (exchanges may be reused/eliminated
    // by AQE, the sort order may not).
    val planLines = p.linesIterator.toSeq
    val joinIdx = planLines.indexWhere(_.contains("AsOfJoin"))
    assert(planLines.drop(joinIdx + 1).count(_.contains("Sort")) >= 2, p)
  }
}
