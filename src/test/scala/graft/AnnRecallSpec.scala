package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** ANN semantics on PLANTED near-duplicates: a corpus of random vectors
  * plus, for each query id 0/1/2, a near-copy (tiny perturbation). The
  * random-hyperplane LSH bucket of a near-copy almost surely equals the
  * query's bucket, so q24b (bucketed ANN) must find it at rank 1 — and
  * q24 (brute force) trivially must. This is the recall property that
  * makes the LSH variant usable as the 100 TB scale path. */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-ann").toString
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)((rnd.nextFloat() - 0.5f))
    val base = (0 until 100).map(i => (i.toLong, vec(), i % 5))
    // planted near-copies of vectors 0,1,2 at ids 1000+q
    val planted = (0 until 3).map { q =>
      val v = base(q)._2.map(x => x + 0.001f * (rnd.nextFloat() - 0.5f))
      ((1000 + q).toLong, v, q % 5)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val rows = (base ++ planted).map { case (i, v, l) =>
      Row(i, v.toSeq, l)
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4), schema)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def rank1(name: String): Map[Long, Long] =
    Registry.byName(name).run(spark, dir).collect()
      .filter(_.getAs[Long]("rk") == 1L)
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("vec_id")).toMap

  test("q24 brute force ranks each planted near-copy first") {
    val top = rank1("q24_cosine_topk")
    (0 until 3).foreach(q => assert(top(q.toLong) === 1000L + q))
  }

  test("q24b LSH-bucketed ANN recalls each planted near-copy at rank 1") {
    val top = rank1("q24b_ann_lsh")
    (0 until 3).foreach { q =>
      assert(top.get(q.toLong).contains(1000L + q),
        s"planted near-copy of $q not recalled: $top")
    }
  }
}
