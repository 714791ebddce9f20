package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{EmbeddingQueries, Registry}

/** q119 hard-negative mining laws on the real sf0.001 fixtures: every
  * mined negative's label must differ from its anchor's, ranks must be
  * dense 1..5 with non-increasing cosine, and the mining must be
  * CONSISTENT with q24b (same LSH index, same candidates): any
  * cross-label row in q24b's unconstrained top-5 can only move UP when
  * same-label rows are removed, so it must appear among q119's
  * negatives for that anchor. */
class HardNegativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val mined = Registry.byName("q119_hard_negatives")
    .run(spark, TestSpark.sf0001).collect()

  test("every mined negative is cross-label") {
    assert(mined.nonEmpty)
    mined.foreach { r =>
      assert(r.getAs[Int]("label") !== r.getAs[Int]("q_label"),
        s"same-label row leaked through the negative gate: $r")
    }
  }

  test("ranks are dense 1..5 with non-increasing cosine per anchor") {
    mined.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val inOrder = rs.sortBy(_.getAs[Long]("rk"))
      assert(inOrder.map(_.getAs[Long]("rk")).toSeq === (1L to 5L))
      inOrder.map(_.getAs[Double]("cosine")).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a >= b)
        case _ =>
      }
    }
  }

  test("planted recall: an exact cross-label copy of anchor 0 mines at rank 1") {
    // the plant is anchor 0's embedding COPIED BIT FOR BIT (not scaled:
    // both engines quantize via round(x*1e6) before the hyperplane
    // dots, and a scaled copy's quantized dot near zero could in
    // principle flip sign — round-14 ADVICE), so its LSH signature is
    // identical to the anchor's in ALL tables by construction — the
    // index MUST surface it — and its cosine is exactly 1, beating
    // every natural neighbor (max natural cosine ≈ 0.5 on random
    // vectors)
    val base = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val a0 = base.filter(col("vec_id") === 0L)
    val plant = a0.select(
      lit(1000000L).as("vec_id"),
      col("embedding"),
      ((col("label") + 1) % 10).as("label"))
    val r = EmbeddingQueries.bandBits(base.count())
    val got = EmbeddingQueries.hardNegatives(base.unionAll(plant), r)
      .filter(col("q_id") === 0L && col("rk") === 1L).collect()
    assert(got.length === 1)
    assert(got(0).getAs[Long]("vec_id") === 1000000L)
    assert(got(0).getAs[Double]("cosine") > 0.999)
  }

  test("q24b's cross-label top rows are contained in the mined set") {
    val unconstrained = Registry.byName("q24b_ann_lsh")
      .run(spark, TestSpark.sf0001).collect()
    val anchorLabel = mined
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Int]("q_label")).toMap
    val minedPairs = mined
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val crossLabel = unconstrained.filter(r =>
      r.getAs[Int]("label") != anchorLabel(r.getAs[Long]("q_id")))
    assert(crossLabel.nonEmpty, "q24b top-5 is all same-label — law vacuous")
    crossLabel.foreach { r =>
      val pair = (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))
      assert(minedPairs.contains(pair),
        s"cross-label q24b neighbor $pair missing from mined negatives")
    }
  }
}
