package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.Policy._

/** Round-21 integer-unit money laws. The hot money aggregations moved
  * from per-row DECIMAL(18,4) arithmetic (BigDecimal multiply at
  * precision 38 per row) to exact integer 1e-4/1e-8 units computed in
  * codegen arithmetic. That is only result-identical because fixture
  * money columns are 2-DECIMAL — so this spec (a) verifies the
  * 2-decimal generator contract column by column on the REAL fixtures
  * at every shipped SF, (b) pins u4 ≡ the Dec4 unscaled value on every
  * such column, (c) differentials each integer-unit aggregate against
  * its retained decimal twin on real data, and (d) hits the HALF_UP
  * rescale with adversarial boundary sums where a naive scale-6
  * intermediate would double-round. A future fixture regen with finer
  * than 4-decimal money breaks (a)/(b) loudly instead of drifting. */
class MoneyUnitsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val moneyCols = Seq(
    ("lineitem", "l_extendedprice"), ("lineitem", "l_discount"),
    ("lineitem", "l_quantity"), ("lineitem", "l_tax"),
    ("orders", "o_totalprice"), ("part", "p_retailprice"),
    ("events", "value"), ("supplier", "s_acctbal"),
    ("customer", "c_acctbal"))

  test("every money column is 2-decimal at every shipped SF (the u4 precondition)") {
    for (dir <- Seq(TestSpark.sf0001, "/root/testdata/sf0.01");
         (tbl, c) <- moneyCols) {
      val bad = Tables.load(spark, dir, tbl)
        .filter(abs(col(c) * 100 - round(col(c) * 100)) > 1e-6)
        .count()
      assert(bad === 0L, s"$dir $tbl.$c holds non-2-decimal values")
    }
  }

  test("u4(c) equals dec(c)'s unscaled value on every fixture money column") {
    for ((tbl, c) <- moneyCols) {
      val bad = Tables.load(spark, "/root/testdata/sf0.01", tbl)
        .filter(u4(col(c)) =!=
          (dec(col(c)) * lit(10000)).cast(LongType))
        .count()
      assert(bad === 0L, s"$tbl.$c: u4 diverges from the Dec4 unscaled value")
    }
  }

  test("integer-unit aggregates equal their decimal twins on the real tables") {
    val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        sumDbl(col("l_extendedprice")).as("a"),
        sumDblDec(col("l_extendedprice")).as("a0"),
        sumMoney(revenue(col("l_extendedprice"), col("l_discount"))).as("b"),
        sumMoneyDec(revenueDec(col("l_extendedprice"), col("l_discount"))).as("b0"),
        avgDbl(col("l_quantity")).as("c"),
        avgDblDec(col("l_quantity")).as("c0"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) === r.getDouble(2), s"sumDbl drift: $r")
      assert(r.getDouble(3) === r.getDouble(4), s"sumMoney/revenue drift: $r")
      assert(r.getDouble(5) === r.getDouble(6), s"avgDbl drift: $r")
    }
    // the q09 margin shape (difference of two u8 products), negatives included
    val pj = li.join(Tables.load(spark, "/root/testdata/sf0.01", "part"),
      col("l_partkey") === col("p_partkey"))
    val m = pj.agg(
      sumMoney(revenue(col("l_extendedprice"), col("l_discount")) -
        u4(col("p_retailprice")) * u4(col("l_quantity"))).as("x"),
      sumMoneyDec(revenueDec(col("l_extendedprice"), col("l_discount")) -
        dec(col("p_retailprice")) * dec(col("l_quantity"))).as("x0"))
      .collect().head
    assert(m.getDouble(0) === m.getDouble(1), "margin drift")
  }

  test("dblU8's HALF_UP rescale survives the boundary sums a scale-6 intermediate double-rounds") {
    import spark.implicits._
    // ±...44999 (stays), ±...45000 (ties away from zero), ±...49995
    // (rounds up), plus large-magnitude sums past the 2^53 double range
    val sums = Seq(1234544999L, 1234545000L, 1234549995L,
      -1234544999L, -1234545000L, -1234549995L,
      987654321012345678L, -987654321012345678L)
    val got = sums.toDF("su")
      .select(dblU8(col("su").cast(DecimalType(38, 0))).as("d"))
      .collect().map(_.getDouble(0))
    val want = sums.map(s => new java.math.BigDecimal(s)
      .movePointLeft(8)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .doubleValue())
    assert(got.toSeq === want,
      s"rescale drift:\n got ${got.mkString(",")}\nwant ${want.mkString(",")}")
  }
}
