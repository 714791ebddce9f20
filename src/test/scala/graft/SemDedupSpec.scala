package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{EmbeddingQueries, Registry}

/** q102 semantic-dedup semantics on the real sf0.001 corpus: the query
  * plants a 1.001-scaled near-copy of every 40th vector (SemDeDup's
  * duplicate model) and must drop EXACTLY those copies — full recall
  * (every planted copy found despite the LSH blocking; a copy's plane
  * signs match its original's unless a dot sits within ~0.1% of zero)
  * and zero false positives (random vectors never reach cosine 0.9 —
  * the q24c observation that natural max within-label cosine ≈ 0.5).
  * Also pins the keep-rule attribution and the blocking's sublinearity:
  * candidates come only from same-(table, sig) buckets, so the scored
  * pair count must sit far below the all-pairs square. */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private lazy val rows =
    Registry.byName("q102_semantic_dedup").run(spark, dir).collect()

  test("q102 drops exactly the planted near-copies (full recall, no FPs)") {
    val n = Tables.rowCount(spark, dir, "embeddings")
    val plantedIds = (0L until n by 40L).map(_ + 1000000L).toSet
    val dropped = rows.map(_.getAs[Long]("dropped_id")).toSet
    assert(dropped === plantedIds,
      s"missed=${plantedIds -- dropped} extra=${dropped -- plantedIds}")
  }

  test("q102 attributes each drop to its original at near-1 cosine") {
    rows.foreach { r =>
      assert(r.getAs[Long]("kept_id") ===
        r.getAs[Long]("dropped_id") - 1000000L)
      assert(r.getAs[Double]("cosine") > 0.99,
        s"planted pair scored ${r.getAs[Double]("cosine")}")
    }
  }

  test("q102 multi-partner drops attribute to the SMALLEST kept id") {
    // A corpus where vectors 0 and 1 are identical: the planted copy of
    // 0 (id 1000000) is a near-dup of BOTH, and 1 itself is a natural
    // exact dup of 0 — exercising the keep-lowest window's rk=1 branch
    // (several above-threshold partners per dropped id) and the
    // natural (non-planted) duplicate path in one fixture.
    import java.nio.file.Files
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val d = Files.createTempDirectory("graft-semdedup").toString
    val rnd = new scala.util.Random(13)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextFloat() - 0.5f)
    val v0 = vec()
    val rows = (Row(0L, v0.toSeq, 0) +: Row(1L, v0.toSeq, 0) +:
      (2 until 90).map(i => Row(i.toLong, vec().toSeq, i % 5)))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4), schema)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = Registry.byName("q102_semantic_dedup").run(spark, d)
      .collect().map(r => r.getAs[Long]("dropped_id") ->
        r.getAs[Long]("kept_id")).toMap
    // natural dup: 1 dropped for 0; planted copies of 0, 40, 80 dropped;
    // the copy of 0 has partners {0, 1} and must attribute to 0
    assert(out === Map(1L -> 0L, 1000000L -> 0L,
      1000040L -> 40L, 1000080L -> 80L), out.toString)
  }

  test("q102 LSH blocking scores far fewer pairs than all-pairs") {
    import org.apache.spark.sql.functions._
    val corpus = EmbeddingQueries.plantedCorpus(spark, dir)
    val m = corpus.count()
    val bands = EmbeddingQueries.lshBands(
      corpus.select(col("vec_id"), col("embedding")))
    // candidate pairs = Σ_buckets C(size,2), deduped across tables
    val cand = bands.select(col("table_idx"), col("sig"),
        col("vec_id").as("id1"))
      .join(bands.select(col("table_idx"), col("sig"),
        col("vec_id").as("id2")), Seq("table_idx", "sig"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct().count()
    val allPairs = m * (m - 1) / 2
    assert(cand < allPairs / 10,
      s"blocking scored $cand of $allPairs pairs — not sublinear")
  }
}
