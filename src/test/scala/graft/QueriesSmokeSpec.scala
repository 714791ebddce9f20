package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Every registered query runs at sf0.001 and satisfies basic shape
  * invariants; a few have hand-checked semantic assertions. The full
  * value-level gate is the DuckDB oracle (Verify + driver / tools/check.py)
  * — this suite is the fast in-JVM guard. */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("driver contract: entry() returns rows (the driver's smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query executes (no analysis/runtime errors)") {
    val failures = Registry.all.flatMap { q =>
      try { q.run(spark, dir).write.format("noop").mode("overwrite").save(); None }
      catch { case e: Throwable => Some(q.name -> e.getMessage) }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracled query has matching column names in the SQL") {
    // The driver sorts columns by name before hashing — a drifting alias
    // silently fails the whole query. Guard: Spark output columns must
    // all appear verbatim in the oracle text.
    val bad = Registry.all.filter(_.oracle.isDefined).flatMap { q =>
      val cols = q.run(spark, dir).columns
      val sql = q.oracle.get.toLowerCase
      val missing = cols.filterNot(c => sql.contains(c.toLowerCase))
      if (missing.isEmpty) None else Some(q.name -> missing.toSeq)
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("q01 pricing summary: group count and a hand total") {
    val rows = Registry.byName("q01_pricing_summary").run(spark, dir).collect()
    assert(rows.length === 6) // 3 returnflags × 2 linestatus
    val totalCount = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.load(spark, dir, "lineitem")
      .filter("l_shipdate <= TIMESTAMP_NTZ '1998-09-02'").count()
    assert(totalCount === expected)
  }

  test("q11 ranks are per-nation (restart at 1 in every nation)") {
    val rows = Registry.byName("q11_supplier_rank").run(spark, dir).collect()
    val byNation = rows.groupBy(_.getAs[String]("n_name"))
    assert(byNation.nonEmpty)
    byNation.foreach { case (n, rs) =>
      assert(rs.map(_.getAs[Long]("bal_rank")).min === 1L, s"nation $n")
    }
  }

  test("q19 window rewrite equals the naive pair join") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val o = Tables.load(spark, dir, "orders")
      .select($"o_custkey", $"o_orderdate")
    val naive = o.as("o1").join(o.as("o2"),
        col("o1.o_custkey") === col("o2.o_custkey") &&
          col("o2.o_orderdate") > col("o1.o_orderdate") &&
          col("o2.o_orderdate") <= col("o1.o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("o1.o_custkey").as("o_custkey"))
      .agg(count(lit(1)).as("pair_cnt"))
    val fast = Registry.byName("q19_order_pairs_30d").run(spark, dir)
    assert(fast.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("q23 emits only verified near-dups (jaccard >= 0.6, ids ordered)") {
    val rows = Registry.byName("q23_near_dup_minhash").run(spark, dir).collect()
    assert(rows.nonEmpty) // fixture plants near-duplicates
    rows.foreach { r =>
      assert(r.getAs[Double]("jaccard") >= 0.6)
      assert(r.getAs[Long]("doc1") < r.getAs[Long]("doc2"))
    }
  }

  test("q32 simhash pairs are a subset of q23 minhash pairs (families agree)") {
    // hamming ≤ 3 on 64-bit shingle simhash is a stricter near-dup
    // criterion than 5-gram Jaccard ≥ 0.6 on this corpus — every simhash
    // pair must also be a minhash pair.
    def pairs(name: String) = Registry.byName(name).run(spark, dir)
      .select("doc1", "doc2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = pairs("q32_simhash_near_dup")
    val min = pairs("q23_near_dup_minhash")
    assert(sim.nonEmpty)
    assert(sim.subsetOf(min), s"simhash-only pairs: ${sim.diff(min).take(5)}")
  }

  test("q24 returns 5 ordered neighbors per query vector") {
    val rows = Registry.byName("q24_cosine_topk").run(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.values.foreach { rs =>
      assert(rs.length === 5)
      val cos = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      assert(rs.forall(r => !Set(0L, 1L, 2L).contains(
        r.getAs[Long]("vec_id")) || r.getAs[Long]("q_id") != r.getAs[Long]("vec_id")))
    }
  }

  test("q26 confusion matrix covers every actual language once") {
    val rows = Registry.byName("q26_lang_id_confusion").run(spark, dir).collect()
    val langs = Tables.load(spark, dir, "documents")
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    val actual = rows.map(_.getAs[String]("lang")).toSet
    assert(actual === langs)
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs === Tables.load(spark, dir, "documents").count())
  }
}
