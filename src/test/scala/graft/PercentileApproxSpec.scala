package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** q35b guard: percentile_approx at accuracy 1e6 over groups with ≪ 1e6
  * rows has rank error < 1 row, i.e. the GK sketch degenerates to the
  * exact discrete percentile. Assert that equivalence against
  * percentile_disc (an independent exact implementation — sort-based,
  * not sketch-based), plus determinism across partition counts (the
  * sketch merge order must not matter at full accuracy). This is the
  * q15b/q24b pattern: the approximate operator is rows-only at the
  * driver gate, with its accuracy contract pinned by an in-Spark spec.
  */
class PercentileApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("q35b: full-accuracy sketch equals exact discrete percentiles") {
    val approx = Registry.byName("q35b_quantity_stats_approx")
      .run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.get(1), r.get(2), r.get(3))).toMap
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("li_q35b")
    val exact = spark.sql(
      """SELECT l_returnflag,
           percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25,
           percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS p50,
           percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity) AS p75
         FROM li_q35b GROUP BY l_returnflag""").collect()
      .map(r => r.getString(0) -> (r.get(1), r.get(2), r.get(3))).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, e) <- exact)
      assert(approx(k) === e, s"group $k: sketch drifted from exact")
  }

  test("q35b: result is invariant to shuffle partition count") {
    val q = Registry.byName("q35b_quantity_stats_approx")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val a = q.run(spark, dir).collect().toSeq
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val b = q.run(spark, dir).collect().toSeq
      assert(a === b, "sketch result depends on merge order")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
