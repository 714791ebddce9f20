package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** q114 semantic-decontamination semantics on the real sf0.001 corpus:
  * the query plants a 1.001-scaled copy of HALF the benchmark set
  * (vec_id % 106 = 0) into the corpus and must flag EXACTLY those
  * leaks — full recall (every planted leak found despite the LSH
  * blocking, attributed to its benchmark original at cosine ≈ 1) and
  * zero false positives (un-leaked corpus vectors are random — natural
  * max cosine ≈ 0.5 ≪ 0.9, the q24c observation; and the UN-leaked
  * half of the benchmark, vec_id % 53 = 0 but % 106 ≠ 0, must surface
  * nothing). Also pins the scale shape: the benchmark side broadcasts
  * into both the candidate join and the scoring join — the corpus side
  * never shuffles.
  */
class SemDecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private lazy val df = Registry.byName("q114_semantic_decontam")
    .run(spark, dir)
  private lazy val rows = df.collect()

  test("q114 flags exactly the planted benchmark leaks (recall + no FPs)") {
    val n = Tables.rowCount(spark, dir, "embeddings")
    val plantedIds = (0L until n by 106L).map(_ + 1000000L).toSet
    val flagged = rows.map(_.getAs[Long]("corpus_id")).toSet
    assert(flagged === plantedIds,
      s"missed=${plantedIds -- flagged} extra=${flagged -- plantedIds}")
  }

  test("q114 attributes each leak to its benchmark original at cosine ≈ 1") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("bench_id") ===
        r.getAs[Long]("corpus_id") - 1000000L)
      assert(r.getAs[Double]("cosine") > 0.99,
        s"planted leak scored ${r.getAs[Double]("cosine")}")
    }
  }

  test("q114's benchmark side broadcasts; no nested-loop/cartesian join") {
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "expected the benchmark signatures/vectors to broadcast")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "decontamination must stay candidates-only — no all-pairs join")
  }
}
