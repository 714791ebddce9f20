package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{EmbeddingQueries, Registry}

/** q121 alignment-audit laws: the per-label language-purity argmax
  * over the embeddings⋈documents id join. Planted frames pin a pure
  * label (purity = 1e6 ppm exactly), the deterministic tie-break
  * (count desc, then lang ASC), and that unmatched ids on either side
  * simply drop out of the audit (inner-join contract). The real-
  * fixture test pins conservation: Σ n_vecs = join cardinality. */
class AlignmentAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("label", IntegerType)))
  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType)))

  private def embF(rows: (Long, Int)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, l) => Row(id, l) }, 3), embSchema)
  private def docF(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, l) => Row(id, l) }, 3), docSchema)

  private def audit(e: DataFrame, d: DataFrame): Seq[(Int, Long, String, Long, Long)] =
    EmbeddingQueries.alignmentAudit(e, d).collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))

  test("a language-pure label reads exactly 1e6 ppm; a mixed one its exact share") {
    val e = embF(1L -> 0, 2L -> 0, 3L -> 0, 10L -> 1, 11L -> 1, 12L -> 1)
    val d = docF(1L -> "en", 2L -> "en", 3L -> "en",
      10L -> "en", 11L -> "fr", 12L -> "fr")
    assert(audit(e, d) === Seq(
      (0, 3L, "en", 3L, 1000000L),
      (1, 3L, "fr", 2L, 666666L)))
  }

  test("tied language counts break to the lexicographically smaller lang") {
    val e = embF(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0)
    val d = docF(1L -> "zh", 2L -> "zh", 3L -> "de", 4L -> "de")
    assert(audit(e, d) === Seq((0, 4L, "de", 2L, 500000L)))
  }

  test("a NULL-lang group loses a count tie to a real lang (NULLS LAST, both engines)") {
    val e = embF(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0)
    val d = docF(1L -> null, 2L -> null, 3L -> "zz", 4L -> "zz")
    assert(audit(e, d) === Seq((0, 4L, "zz", 2L, 500000L)))
  }

  test("unmatched ids on either side drop out (inner-join contract)") {
    val e = embF(1L -> 0, 99L -> 0) // 99 has no document
    val d = docF(1L -> "en", 50L -> "fr") // 50 has no vector
    assert(audit(e, d) === Seq((0, 1L, "en", 1L, 1000000L)))
  }

  test("sf0.001 conservation: per-label totals sum to the join cardinality") {
    val rows = Registry.byName("q121_alignment_audit")
      .run(spark, TestSpark.sf0001).collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === 500L)
    rows.foreach { r =>
      assert(r.getAs[Long]("top_cnt") <= r.getAs[Long]("n_vecs"))
      assert(r.getAs[Long]("purity_ppm") ===
        r.getAs[Long]("top_cnt") * 1000000L / r.getAs[Long]("n_vecs"))
    }
  }
}
