package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Recall guard for the MinHash-LSH design (q23): the DuckDB oracle
  * proves Spark and DuckDB agree, but both share the SAME hash families
  * — a family design that silently lost recall would stay oracle-green.
  * This spec plants near-duplicate pairs at high Jaccard (one appended
  * word over a 30-word doc → J ≈ 26/27 on 5-gram shingles, band-hit
  * probability ≈ 1) among unrelated documents with disjoint
  * vocabularies, and asserts q23 finds every planted pair and nothing
  * else. Deterministic: fixed corpus, fixed hash families.
  * (AnnRecallSpec is the same idea for the embedding LSH.) */
class MinHashRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val nPairs = 12

  private lazy val corpusDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-minhash-recall").toString
    def text(p: Int) =
      (0 until 30).map(w => s"w${p}x$w").mkString(" ")
    val pairs = (0 until nPairs).flatMap { p =>
      val base = text(p)
      Seq((p.toLong * 2, base), (p.toLong * 2 + 1, base + s" tail$p"))
    }
    val unrelated = (0 until nPairs).map { p =>
      ((1000 + p).toLong, (0 until 30).map(w => s"u${p}y$w").mkString(" "))
    }
    (pairs ++ unrelated).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("planted"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q23 finds every planted near-dup pair and only those") {
    val got = Registry.byName("q23_near_dup_minhash").run(spark, corpusDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0 until nPairs)
      .map(p => (p.toLong * 2, p.toLong * 2 + 1)).toSet
    assert(got === want,
      s"missed ${want -- got}, spurious ${got -- want}")
  }

  test("q39 clusters each planted pair together, representatives = min id") {
    val rows = Registry.byName("q39_dedup_clusters").run(spark, corpusDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byCluster = rows.groupBy(_._1)
    assert(byCluster.size === nPairs)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._2).sorted.toSeq ===
        Seq(cid, cid + 1), s"cluster $cid malformed")
      assert(members.forall(m => m._3 === (m._2 == cid)))
    }
  }
}
