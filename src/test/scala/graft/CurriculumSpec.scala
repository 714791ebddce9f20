package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** q120 curriculum-packing laws on the real sf0.001 fixtures: the
  * value-based quartile staging must be difficulty-monotone across
  * stages (a value maps to exactly one stage), every stage must be
  * populated, bins within a stage must be dense from 0, and the packed
  * token mass must equal the corpus token mass (packing moves tokens,
  * never drops or double-counts them). */
class CurriculumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val rows = Registry.byName("q120_curriculum_pack")
    .run(spark, TestSpark.sf0001).collect()

  test("all four stages are populated") {
    assert(rows.map(_.getAs[Long]("stage")).toSet === Set(1L, 2L, 3L, 4L))
  }

  test("stages are difficulty-monotone (easy -> hard)") {
    val byStage = rows.groupBy(_.getAs[Long]("stage")).map { case (s, rs) =>
      s -> (rs.map(_.getAs[Long]("min_diff")).min,
        rs.map(_.getAs[Long]("max_diff")).max)
    }.toSeq.sortBy(_._1)
    byStage.sliding(2).foreach {
      case Seq((_, (_, loMax)), (_, (hiMin, _))) =>
        // value-based cutoffs: a difficulty value lives in exactly one
        // stage, so consecutive stages cannot interleave
        assert(loMax < hiMin)
      case _ =>
    }
  }

  test("bins within a stage are dense from 0") {
    rows.groupBy(_.getAs[Long]("stage")).foreach { case (_, rs) =>
      val bins = rs.map(_.getAs[Long]("bin")).sorted
      assert(bins === (0L until bins.length).toArray.toSeq)
    }
  }

  test("token mass is conserved end-to-end") {
    val packed = rows.map(_.getAs[Long]("sum_tokens")).sum
    val corpus = Tables.load(spark, TestSpark.sf0001, "documents")
      .select(sum(size(expr(
        "filter(split(lower(text), ' '), t -> length(t) > 0)"))
        .cast("long")))
      .collect()(0).getLong(0)
    assert(packed === corpus)
  }

  test("bin boundaries respect the first-token-owns-the-bin convention") {
    // the first doc of bin b starts at offset cum(bins < b), which must
    // land inside bin b's token span [b*2048, (b+1)*2048)
    rows.groupBy(_.getAs[Long]("stage")).foreach { case (_, rs) =>
      val inOrder = rs.sortBy(_.getAs[Long]("bin"))
      var cumBefore = 0L
      inOrder.foreach { r =>
        val b = r.getAs[Long]("bin")
        assert(b * 2048 <= cumBefore && cumBefore < (b + 1) * 2048,
          s"bin $b first-doc offset $cumBefore outside its span")
        cumBefore += r.getAs[Long]("sum_tokens")
      }
    }
  }
}
