package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** q85's WITH RECURSIVE surface (Spark 4 UnionLoop). Three laws pin the
  * recursion semantics independently of the DuckDB oracle:
  *
  *   1. COVERAGE — the binary tree over s_suppkey (parent k DIV 2,
  *      root 0) reaches every supplier exactly once, so the per-depth
  *      counts sum to |supplier|.
  *   2. DEPTH — heap indexing gives a closed form, depth(k) =
  *      floor(log2(k)) + 1 for k >= 1 (0 for the root), so the
  *      per-depth histogram is computable without any recursion at all;
  *      the recursive result must match it.
  *   3. CONSERVATION — the depth table LEFT-joins per-supplier revenue,
  *      so summing total_revenue across depths reproduces the whole
  *      corpus revenue (nothing dropped, nothing duplicated).
  *
  * Plus the physical assertion that the plan actually runs Spark's
  * native recursion operator (UnionLoopExec), not an unrolled union.
  */
class RecursiveCteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val q85 =
    Registry.byName("q85_recursive_tree").run(spark, TestSpark.sf0001)

  test("q85 per-depth counts cover every supplier exactly once") {
    val nSupp = Tables.load(spark, TestSpark.sf0001, "supplier").count()
    val covered = q85.agg(sum("n_suppliers")).head.getLong(0)
    assert(covered === nSupp)
  }

  test("q85 depths match the closed-form floor(log2(k)) + 1 histogram") {
    import spark.implicits._
    val expected = Tables.load(spark, TestSpark.sf0001, "supplier")
      .select($"s_suppkey")
      .select(when($"s_suppkey" === 0, 0L)
        .otherwise(floor(log2($"s_suppkey")) + 1L).as("depth"))
      .groupBy($"depth").agg(count(lit(1)).as("n_suppliers"))
      .orderBy($"depth")
      .as[(Long, Long)].collect().toSeq
    val got = q85.select($"depth", $"n_suppliers")
      .as[(Long, Long)].collect().toSeq
    assert(got === expected)
  }

  test("q85 revenue is conserved across the depth partition") {
    import spark.implicits._
    val whole = Tables.load(spark, TestSpark.sf0001, "lineitem")
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
        (lit(1) - col("l_discount").cast("decimal(18,4)")))
        .cast("decimal(18,4)").cast("double"))
      .head.getDouble(0)
    val byDepth = q85.agg(sum($"total_revenue")).head.getDouble(0)
    assert(math.abs(whole - byDepth) < 1e-6,
      s"whole=$whole byDepth=$byDepth")
  }

  test("q85 plans through the native recursion operator (UnionLoopExec)") {
    val physical = q85.queryExecution.executedPlan.toString
    assert(physical.contains("UnionLoop"),
      s"expected UnionLoopExec in:\n$physical")
  }
}
