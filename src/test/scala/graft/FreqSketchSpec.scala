package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries sketch (`mg_sketch`) laws: the superset guarantee that
  * makes q59's two-phase heavy-hitter plan EXACT, pinned across
  * partition layouts (sketch content may vary with partitioning; the
  * guarantee must not).
  */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Zipf-ish corpus: item i (of 200) appears 1 + 40000/(i+1) times —
    * a realistic heavy-head/long-tail split with known exact counts. */
  private def corpus = {
    import spark.implicits._
    (0 until 200).flatMap(i => Seq.fill(1 + 40000 / (i + 1))(f"tok$i%03d"))
      .toDF("item")
  }

  private def sketchItems(parts: Int, k: Int): Set[String] = {
    val df = corpus.repartition(parts)
      .agg(expr(s"mg_sketch(item, $k)").as("sk"))
      .select(explode(col("sk")).as("c"))
      .select(col("c.item"), col("c.residual"))
    df.collect().map(_.getString(0)).toSet
  }

  test("superset guarantee holds for every partition layout") {
    import spark.implicits._
    val exact = corpus.groupBy($"item").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    for (k <- Seq(16, 64); parts <- Seq(1, 4, 13)) {
      val kept = sketchItems(parts, k)
      val mustKeep = exact.filter { case (_, c) => c * (k + 1) > n }.keySet
      assert(mustKeep.subsetOf(kept),
        s"k=$k parts=$parts lost ${mustKeep -- kept}")
      assert(kept.size <= k)
    }
  }

  test("residuals never exceed true counts and undercount by <= n/(k+1)") {
    import spark.implicits._
    val exact = corpus.groupBy($"item").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 32
    val rows = corpus.repartition(7)
      .agg(expr(s"mg_sketch(item, $k)").as("sk"))
      .select(explode(col("sk")).as("c"))
      .select(col("c.item"), col("c.residual")).collect()
    rows.foreach { case Row(item: String, residual: Long) =>
      val t = exact(item)
      assert(residual <= t, s"$item residual $residual > true $t")
      assert(t - residual <= n / (k + 1),
        s"$item undercount ${t - residual} > ${n / (k + 1)}")
    }
  }

  test("q59's sketch+exact plan equals the direct exact aggregation") {
    import spark.implicits._
    val toks = Tables.load(spark, TestSpark.sf0001, "documents")
      .select($"lang", explode(split(lower($"text"), " ")).as("token"))
      .filter(length($"token") > 0)
    val direct = toks.groupBy($"lang", $"token")
      .agg(count(lit(1)).as("cnt"))
      .join(toks.groupBy($"lang").agg(count(lit(1)).as("n_lang")), Seq("lang"))
      .filter($"cnt" * 100 >= $"n_lang")
      .select($"lang", $"token", $"cnt")
    val viaSketch = graft.queries.Registry.byName("q59_heavy_hitters")
      .run(spark, TestSpark.sf0001)
      .select($"lang", $"token", $"cnt")
    assert(viaSketch.collect().toSet === direct.collect().toSet)
    assert(viaSketch.count() > 0, "q59 fixture output must be non-empty")
  }

  test("mg_sketch rejects non-literal k and non-string items") {
    import spark.implicits._
    val df = Seq(("a", 1)).toDF("s", "i")
    val e1 = intercept[Exception] {
      df.selectExpr("mg_sketch(i, 4)").collect()
    }
    assert(e1.getMessage.toLowerCase.contains("string"))
    val e2 = intercept[Exception] {
      df.groupBy().agg(expr("mg_sketch(s, i)")).collect()
    }
    assert(e2 != null)
  }
}
