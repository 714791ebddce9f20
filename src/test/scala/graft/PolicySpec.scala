package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.Policy._

/** Determinism-policy laws on literal frames + ScalaCheck algebraic laws
  * (SURVEY §5.B #2/#3). Gen is driven manually (fixed seed) — the
  * scalatest/scalacheck bridge artifact is not on the offline classpath. */
class PolicySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sumDbl is exact on decimal-hostile doubles") {
    import spark.implicits._
    // 0.1 is inexact in binary; the decimal cast makes the sum exact.
    val df = Seq.fill(1000)(0.1).toDF("x")
    val got = df.agg(sumDbl($"x").as("s")).collect().head.getDouble(0)
    assert(got === 100.0) // plain double summation would give 99.9999...
  }

  test("sumMoney rescales before the double cast") {
    import spark.implicits._
    val df = Seq((100.0, 0.25), (200.0, 0.5)).toDF("p", "d")
    // round 21: sumMoney takes the 1e-8-unit integer product
    val got = df.agg(sumMoney(u4($"p") * u4($"d")).as("s"))
      .collect().head.getDouble(0)
    assert(got === 125.0)
    // and agrees with its decimal twin on the same frame
    val dec8 = df.agg(sumMoneyDec(dec($"p") * dec($"d")).as("s"))
      .collect().head.getDouble(0)
    assert(got === dec8)
  }

  test("wavg_dec quantizes like CAST(double AS DECIMAL(18,4)) at a .00005 tie") {
    import spark.implicits._
    // 1.00005 is a representation tie: its exact binary expansion is
    // 1.0000499999…, which HALF_UP would round DOWN to 1.0000, while
    // Double.toString's shortest repr "1.00005" rounds UP to 1.0001 —
    // the path Spark's CAST (and DuckDB's) takes. wavg_dec must agree
    // with CAST or the q30 cross-engine hash breaks on adversarial data.
    val df = Seq((1.00005, 1.0)).toDF("v", "w")
    val got = df.agg(expr("wavg_dec(v, w)").as("a")).collect().head.getDouble(0)
    val cast = df.select($"v".cast("decimal(18,4)").cast("double"))
      .collect().head.getDouble(0)
    assert(cast === 1.0001, "CAST itself moved — policy assumption broken")
    assert(got === cast, "wavg_dec disagrees with Spark's decimal cast")
  }

  test("law: count splits by any predicate (count = countIf(p) + countIf(!p))") {
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
    val gen = Gen.choose(0.0, 0.1)
    val thresholds = (0 until 8).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))
    assert(thresholds.nonEmpty)
    thresholds.foreach { t =>
      val r = li.agg(
        count(lit(1)).as("n"),
        count(when(col("l_discount") <= t, 1)).as("a"),
        count(when(col("l_discount") > t, 1)).as("b")).collect().head
      assert(r.getLong(0) === r.getLong(1) + r.getLong(2), s"t=$t")
    }
  }

  test("law: semi ⊎ anti partitions the left table") {
    val c = Tables.load(spark, TestSpark.sf0001, "customer")
    val o = Tables.load(spark, TestSpark.sf0001, "orders").select("o_custkey")
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti").count()
    assert(semi + anti === c.count())
  }

  test("law: intersect + except partition the distinct left set") {
    val o = Tables.load(spark, TestSpark.sf0001, "orders")
    val hi = o.filter("o_totalprice > 300000").select("o_custkey")
    val lo = o.filter("o_totalprice < 150000").select("o_custkey")
    val n = hi.intersect(lo).count() + hi.except(lo).count()
    assert(n === hi.distinct().count())
  }

  test("law: intersectAll + exceptAll partition the left MULTISET") {
    val o = Tables.load(spark, TestSpark.sf0001, "orders")
    val hi = o.filter("o_totalprice > 300000").select("o_custkey")
    val lo = o.filter("o_totalprice < 150000").select("o_custkey")
    val n = hi.intersectAll(lo).count() + hi.exceptAll(lo).count()
    assert(n === hi.count()) // multiset semantics: counts, not distinct
  }

  test("statistical aggregates agree with exact-moment computation") {
    // stddev/var/corr/covar accumulate doubles in partition order, so
    // they can NOT sit under the hash oracle (order-dependent at ulp
    // scale); their values are instead checked here against a manual
    // exact-decimal-moment computation within a float tolerance.
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
    val r = li.agg(
      stddev_samp(col("l_quantity")).as("sd"),
      var_samp(col("l_quantity")).as("vr"),
      corr(col("l_quantity"), col("l_extendedprice")).as("cr"),
      covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
      count(lit(1)).as("n"),
      sum(dec(col("l_quantity"))).as("s1"),
      sum(dec(col("l_quantity")) * dec(col("l_quantity"))).as("s2"))
      .collect().head
    val n = r.getAs[Long]("n").toDouble
    val s1 = r.getAs[java.math.BigDecimal]("s1").doubleValue()
    val s2 = r.getAs[java.math.BigDecimal]("s2").doubleValue()
    val manualVar = (s2 - s1 * s1 / n) / (n - 1)
    assert(math.abs(r.getAs[Double]("vr") - manualVar) / manualVar < 1e-9)
    assert(math.abs(r.getAs[Double]("sd") - math.sqrt(manualVar)) < 1e-6)
    // quantity and price are independent in this generator: |corr| small,
    // and corr/covar must share a sign (covar = corr·σx·σy)
    val cr = r.getAs[Double]("cr")
    val cv = r.getAs[Double]("cv")
    assert(math.abs(cr) <= 1.0)
    assert(cr.sign === cv.sign)
  }
}
