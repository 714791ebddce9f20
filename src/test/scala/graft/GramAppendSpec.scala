package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DocQueries, Registry}

/** q117c — the cumulative gram-index append cycle (round-15 verdict
  * item 3). The DuckDB oracle grades both batches against pure set
  * semantics (batch 1 vs the mod-2 gram set, batch 2 vs mod-2 ∪
  * mod-0); these laws pin the storage mechanics and the cross-query
  * relationships the oracle cannot see:
  *
  *  1. the delta segment's membership is EXACTLY batch-1's novel grams
  *     (independent anti-join recompute from raw text);
  *  2. batch-1 rows are identical to q117b's batch-1 rows — before any
  *     append the two monitors measure the same thing;
  *  3. MONOTONICITY vs the stateless monitor: on batch 2 the same
  *     gram counts, and cumulative novel_grams ≤ q117b's stateless
  *     novel_grams per source — with a STRICT witness somewhere (the
  *     fixture binds: batch 1 shares grams with batch 2 that the
  *     corpus lacks), or the append provably absorbed nothing.
  */
class GramAppendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private lazy val cumulative = Registry.byName("q117c_gram_index_append")
    .run(spark, dir).collect()
  private lazy val stateless = Registry.byName("q117b_stream_novelty")
    .run(spark, dir).collect()

  private def byBatch(rows: Array[org.apache.spark.sql.Row], b: Long) =
    rows.filter(_.getAs[Long]("batch") == b)
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("batch_grams"), r.getAs[Long]("novel_grams")))
      .toMap

  test("delta segment holds exactly batch-1's novel grams") {
    cumulative // run the append
    val delta = spark.read
      .parquet(Tables.gramBaseLoc(spark, dir, "_delta").toString)
    val b1 = DocQueries.shingleTable(
        Tables.load(spark, dir, "documents")
          .filter(DocQueries.q110Mod === 0), Nil)
      .select(col("shingle").as("gram")).distinct()
    val expected = b1.join(Tables.gramIndex(spark, dir),
      Seq("gram"), "left_anti")
    assert(delta.join(expected, Seq("gram"), "left_anti").count() === 0L,
      "delta carries grams that are not batch-1 novel grams")
    assert(expected.join(delta, Seq("gram"), "left_anti").count() === 0L,
      "delta is missing batch-1 novel grams")
    assert(delta.count() === delta.distinct().count())
  }

  test("batch-1 rows equal the stateless monitor's — nothing appended yet") {
    val c1 = cumulative.filter(_.getAs[Long]("batch") == 1L).map(_.toSeq)
    val s1 = stateless.filter(_.getAs[Long]("batch") == 1L).map(_.toSeq)
    assert(c1.toSeq === s1.toSeq)
  }

  test("batch-2 monotonicity: cumulative novelty <= stateless, strictly somewhere") {
    val c2 = byBatch(cumulative, 2L)
    val s2 = byBatch(stateless, 2L)
    assert(c2.keySet === s2.keySet)
    c2.foreach { case (src, (bg, nv)) =>
      val (sbg, snv) = s2(src)
      assert(bg === sbg, s"$src: same batch must yield same gram count")
      assert(nv <= snv,
        s"$src: appending batch-1 grams INCREASED novelty ($nv > $snv)")
    }
    val absorbed = c2.map { case (src, (_, nv)) => s2(src)._2 - nv }.sum
    assert(absorbed > 0L,
      "fixture regression: the append absorbed zero batch-2 grams — " +
        "the cumulative form is indistinguishable from the stateless one")
  }

  // ------------------------------------------------------------- q117d
  // The append cycle as a checkpointed stream (shares q117c's oracle —
  // read-equivalence); laws mirror StreamIndexDedupSpec's for q110d.

  private lazy val streamed = Registry.byName("q117d_stream_gram_append")
    .run(spark, dir).collect()

  test("q117d: streamed cumulative report equals the batch q117c relation") {
    assert(streamed.map(_.toSeq).toSeq === cumulative.map(_.toSeq).toSeq)
  }

  test("q117d: at-least-once redelivery leaves sink and segments unchanged") {
    // redeliver BOTH batches through the per-batch function directly —
    // batch 0 re-runs with batch 1's segment already on disk, so its
    // `batch < 0` filter must hide both its own first delivery and
    // batch 1's grams, or its novelty would shrink
    val replay = graft.streaming.StreamingJobs.docsReplayDir(spark, dir)
    def tmp(t: String): String = java.nio.file.Files
      .createTempDirectory(s"graft-gad-$t").toString
    val (delta, sink, ckpt) = (tmp("delta"), tmp("sink"), tmp("ckpt"))
    DocQueries.runStreamGramAppend(spark, dir, replay, delta, sink, ckpt)
    def snap(): (Seq[Seq[Any]], Set[Seq[Any]]) = (
      DocQueries.streamGramTable(spark, sink).collect().map(_.toSeq).toSeq,
      spark.read.parquet(delta).select("batch", "gram").distinct()
        .collect().map(_.toSeq).toSet)
    val before = snap()
    val grams = Tables.gramIndex(spark, dir)
    val all = spark.read.parquet(replay)
    Seq(0L, 1L).foreach { id =>
      DocQueries.streamGramBatch(spark,
        all.filter(DocQueries.q110Mod === id), id, grams, delta, sink)
    }
    assert(snap() === before,
      "redelivered batches changed the sink or the gram segments")
  }

  test("q117d: checkpoint resume between batches equals the one-shot run") {
    import java.nio.file.{Files, Path, StandardCopyOption}
    val oneShot = streamed.map(_.toSeq).toSeq // force BEFORE own legs
    val src = new java.io.File(
      graft.streaming.StreamingJobs.docsReplayDir(spark, dir))
    def tmp(t: String): Path = Files.createTempDirectory(s"graft-gar-$t")
    val stage = tmp("replay")
    val (delta, sink, ckpt) =
      (tmp("delta").toString, tmp("sink").toString, tmp("ckpt").toString)
    def arrive(name: String): Unit = {
      val from = new java.io.File(src, name)
      val to = stage.resolve(name)
      Files.copy(from.toPath, to, StandardCopyOption.REPLACE_EXISTING)
      assert(to.toFile.setLastModified(from.lastModified))
    }
    arrive("b0.parquet")
    DocQueries.runStreamGramAppend(spark, dir, stage.toString, delta,
      sink, ckpt)
    arrive("b1.parquet")
    DocQueries.runStreamGramAppend(spark, dir, stage.toString, delta,
      sink, ckpt)
    val resumed = DocQueries.streamGramTable(spark, sink)
      .collect().map(_.toSeq).toSeq
    assert(resumed === oneShot,
      "restarted gram-append stream diverged from the one-shot run")
    // the resumed batch-1 probe really read index ∪ the batch-0 delta
    val plan = graft.streaming.StreamingJobs
      .innerPlanOf("q117d_stream_gram_append batch=1")
      .getOrElse(fail("resumed batch-1 probe plan was not recorded"))
    assert(plan.contains(delta) && plan.contains("docs_grams_base_"),
      s"resumed batch-1 probe is not index ∪ prior delta:\n$plan")
  }

  test("q117d: recorded per-batch probe plan is broadcast-semi, index never shuffled") {
    streamed // ensure a run recorded the plans
    Seq(0, 1).foreach { id =>
      val plan = graft.streaming.StreamingJobs
        .innerPlanOf(s"q117d_stream_gram_append batch=$id")
        .getOrElse(fail(s"batch-$id probe plan was not recorded"))
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
        s"batch-$id probe is not a broadcast semi-join:\n$plan")
      assert(!plan.contains("SortMergeJoin") &&
        !plan.contains("ShuffledHashJoin"),
        s"batch-$id gram index side is being shuffled:\n$plan")
    }
  }

  test("probe plan: base∪delta index side broadcast-semi, never shuffled") {
    // the q117b plan contract extended to the unioned read: both index
    // scans stream map-only through the broadcast semi
    cumulative
    val bg2 = DocQueries.shingleTable(
        Tables.load(spark, dir, "documents")
          .filter(DocQueries.q110Mod === 1), Seq("source"))
      .select(col("source"), col("shingle")).distinct()
    val idx = Tables.gramIndex(spark, dir).union(spark.read
      .parquet(Tables.gramBaseLoc(spark, dir, "_delta").toString))
    val rep = DocQueries.noveltyBatchReport(bg2, idx)
    val plan = rep.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"unioned index probe is not a broadcast semi-join:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      s"gram index side is being shuffled:\n$plan")
  }
}
