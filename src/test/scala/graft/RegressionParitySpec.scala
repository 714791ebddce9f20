package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** q92's companion: the NATIVE statistical aggregates (regr_slope /
  * regr_intercept / corr) must agree with the exact-decimal co-moment
  * composite to ~1e-9 relative. The native forms stream doubles through
  * an order-dependent co-moment update — fine for analysis, but their
  * last ulp depends on partitioning, which is why the GATED q92 derives
  * everything from mergeable exact sums instead. This spec is the
  * bridge: it proves the convenient form and the portable form are the
  * same statistic.
  */
class RegressionParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("native regr_slope/regr_intercept/corr match the exact composite") {
    import spark.implicits._
    val composite = Registry.byName("q92_regression")
      .run(spark, TestSpark.sf0001)
      .select($"l_returnflag", $"slope", $"intercept")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    val native = Tables.load(spark, TestSpark.sf0001, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        expr("regr_slope(l_extendedprice, l_quantity)").as("slope"),
        expr("regr_intercept(l_extendedprice, l_quantity)").as("intercept"),
        expr("corr(l_extendedprice, l_quantity)").as("r"))
      .collect()

    assert(native.length === composite.size)
    native.foreach { row =>
      val flag = row.getString(0)
      val (slope, intercept) = composite(flag)
      def relErr(a: Double, b: Double) = math.abs(a - b) / math.max(1.0, math.abs(b))
      assert(relErr(row.getDouble(1), slope) < 1e-9,
        s"$flag slope native=${row.getDouble(1)} exact=$slope")
      assert(relErr(row.getDouble(2), intercept) < 1e-9,
        s"$flag intercept native=${row.getDouble(2)} exact=$intercept")
      // correlation is bounded and dimensionless; sanity-pin its range
      // and sign agreement with the slope
      val r = row.getDouble(3)
      assert(r >= -1.0 && r <= 1.0)
      assert(math.signum(r) === math.signum(slope))
    }
  }
}
