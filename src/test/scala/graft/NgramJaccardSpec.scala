package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** q45's prefix filter claims EXACTNESS (no false negatives at τ=0.5),
  * unlike q23's probabilistic banding. The oracle can't prove that by
  * itself — both sides run the same prefix algorithm, so a shared
  * false-negative bug would cancel out. This spec computes the
  * ground-truth pair set WITHOUT any prefix restriction (join the full
  * per-doc shingle sets on ANY shared shingle — complete for every pair
  * with J > 0, a superset of J ≥ 0.5) and asserts q45 returns exactly
  * the ≥-threshold subset of it. */
class NgramJaccardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q45 prefix filtering loses no pair vs the unfiltered join (sf0.001)") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val sh = docs
      .select($"doc_id", split(lower($"text"), " ").as("tk"))
      .filter(size($"tk") >= 3)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(tk) - 2), " +
          "i -> concat_ws(' ', slice(tk, i, 3)))")).as("shingle"))
      .distinct()
      .localCheckpoint()
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    // Ground truth: every pair sharing >= 1 shingle, exact Jaccard.
    val inter = sh.toDF("doc1", "shingle")
      .join(sh.toDF("doc2", "shingle"), "shingle")
      .filter($"doc1" < $"doc2")
      .groupBy($"doc1", $"doc2")
      .agg(count(lit(1)).as("n_shared"))
    val truth = inter
      .join(sizes.toDF("doc1", "n1"), "doc1")
      .join(sizes.toDF("doc2", "n2"), "doc2")
      .filter($"n_shared" * 2 >= $"n1" + $"n2" - $"n_shared")
      .select($"doc1", $"doc2", $"n_shared", $"n1", $"n2")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    val got = Registry.byName("q45_ngram_jaccard")
      .run(spark, TestSpark.sf0001)
      .select("doc1", "doc2", "n_shared", "n1", "n2")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(truth.nonEmpty, "test corpus has no near-dup pair at τ=0.5 — " +
      "the completeness assertion would be vacuous")
    assert(got === truth)
  }
}
