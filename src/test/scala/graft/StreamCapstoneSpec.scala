package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DocQueries, Registry}
import graft.streaming.StreamingJobs

/** q122 — the streaming ingest capstone: ONE foreachBatch composing
  * the index dedup (q110d), the cumulative gram novelty + append
  * (q117d) and the ingest drift report (q116b) over a single replay
  * drain. The combined DuckDB oracle grades the wide relation; these
  * laws pin what it cannot see:
  *
  *  1. per-family read-equivalence — the wide report's funnel / drift
  *     / novelty projections equal the standalone queries' relations
  *     row for row (composition changed the execution, not any
  *     answer);
  *  2. the one replay really fed BOTH monitors per batch (recorded
  *     dedup AND novelty inner plans for each batchId, from one run);
  *  3. foreachBatch writes are idempotent under at-least-once
  *     redelivery across all four artifact families (two index delta
  *     roots, gram delta root, two sinks);
  *  4. checkpoint resume between batches equals the one-shot run;
  *  5. a torn write (all segments landed, neither sink committed)
  *     converges on restart — the q110d crash law over the composed
  *     batch.
  */
class StreamCapstoneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private lazy val capstone = Registry.byName("q122_stream_ingest_capstone")
    .run(spark, dir).collect()

  private def proj(cols: String*): Seq[Seq[Any]] =
    capstone.map(r => cols.map(c => r.getAs[Any](c)).toSeq).toSeq

  test("funnel projection equals the q110c append-cycle relation") {
    val cyc = Registry.byName("q110c_index_append_cycle")
      .run(spark, dir).collect().map(_.toSeq).toSeq
    assert(proj("batch", "source", "batch_docs", "near_dups",
      "kept_docs") === cyc)
  }

  test("drift projection equals the q116b stream-drift relation") {
    val drift = Registry.byName("q116b_stream_drift")
      .run(spark, dir).collect().map(_.toSeq).toSeq
    assert(proj("batch", "source", "batch_docs", "corpus_docs",
      "batch_ppm", "corpus_ppm", "drift_ppm") === drift)
  }

  test("novelty projection equals the q117c cumulative-append relation") {
    val nov = Registry.byName("q117c_gram_index_append")
      .run(spark, dir).collect().map(_.toSeq).toSeq
    assert(proj("batch", "source", "batch_grams", "novel_grams",
      "novelty_ppm") === nov)
  }

  test("one replay fed both monitors: dedup AND novelty plans recorded per batch") {
    capstone // one run records all four keys
    Seq(0, 1).foreach { id =>
      val dedup = StreamingJobs
        .innerPlanOf(s"q122_stream_ingest_capstone dedup batch=$id")
        .getOrElse(fail(s"dedup batch=$id inner plan was not recorded"))
      val probe = StreamingJobs
        .innerPlanOf(s"q122_stream_ingest_capstone novelty batch=$id")
        .getOrElse(fail(s"novelty batch=$id inner plan was not recorded"))
      // the q117d probe contract holds inside the composition: the
      // gram index side streams map-only through a broadcast semi
      assert(probe.contains("BroadcastHashJoin") &&
        probe.contains("LeftSemi"),
        s"capstone novelty probe batch=$id is not a broadcast semi:\n$probe")
      assert(!probe.contains("SortMergeJoin") &&
        !probe.contains("ShuffledHashJoin"),
        s"capstone gram index side is shuffled at batch $id:\n$probe")
      // and the dedup side reads the minhash base index (batch 0's
      // plan must scan it; batch 1 unions it with the prior delta)
      assert(dedup.contains("docs_minhash_base_"),
        s"capstone dedup batch=$id does not scan the base index:\n$dedup")
    }
  }

  test("at-least-once redelivery leaves both sinks and all three segment roots unchanged") {
    val replay = StreamingJobs.docsReplayDir(spark, dir)
    def tmp(t: String): String = java.nio.file.Files
      .createTempDirectory(s"graft-capd-$t").toString
    val (db, ds, gd, fs, ns, ckpt) = (tmp("db"), tmp("ds"), tmp("gd"),
      tmp("fs"), tmp("ns"), tmp("ckpt"))
    DocQueries.runStreamCapstone(spark, dir, replay, db, ds, gd, fs, ns,
      ckpt)
    def snap(): (Seq[Seq[Any]], Set[Seq[Any]], Set[Seq[Any]]) = (
      DocQueries.capstoneTable(spark, dir, fs, ns)
        .collect().map(_.toSeq).toSeq,
      spark.read.parquet(db).select("batch", "doc_id").distinct()
        .collect().map(_.toSeq).toSet,
      spark.read.parquet(gd).select("batch", "gram").distinct()
        .collect().map(_.toSeq).toSet)
    val before = snap()
    // redeliver BOTH batches through the per-batch function — batch 0
    // re-runs with every later segment already on disk, so its
    // `batch < 0` filters must hide them all across both families
    val (iBands, iSets) = Tables.minhashIndexBase(spark, dir)
    val grams = Tables.gramIndex(spark, dir)
    val all = spark.read.parquet(replay)
    Seq(0L, 1L).foreach { id =>
      DocQueries.streamCapstoneBatch(spark,
        all.filter(DocQueries.q110Mod === id), id, iBands, iSets,
        db, ds, grams, gd, fs, ns)
    }
    assert(snap() === before,
      "redelivered batches changed a sink or a segment root")
  }

  test("checkpoint resume between batches equals the one-shot run") {
    import java.nio.file.{Files, Path, StandardCopyOption}
    val oneShot = capstone.map(_.toSeq).toSeq // force BEFORE own legs
    val src = new java.io.File(StreamingJobs.docsReplayDir(spark, dir))
    def tmp(t: String): Path = Files.createTempDirectory(s"graft-capr-$t")
    val stage = tmp("replay")
    val (db, ds, gd, fs, ns, ckpt) = (tmp("db").toString,
      tmp("ds").toString, tmp("gd").toString, tmp("fs").toString,
      tmp("ns").toString, tmp("ckpt").toString)
    def arrive(name: String): Unit = {
      val from = new java.io.File(src, name)
      val to = stage.resolve(name)
      Files.copy(from.toPath, to, StandardCopyOption.REPLACE_EXISTING)
      assert(to.toFile.setLastModified(from.lastModified))
    }
    arrive("b0.parquet")
    DocQueries.runStreamCapstone(spark, dir, stage.toString, db, ds, gd,
      fs, ns, ckpt)
    arrive("b1.parquet")
    DocQueries.runStreamCapstone(spark, dir, stage.toString, db, ds, gd,
      fs, ns, ckpt)
    val resumed = DocQueries.capstoneTable(spark, dir, fs, ns)
      .collect().map(_.toSeq).toSeq
    assert(resumed === oneShot,
      "restarted capstone diverged from the one-shot run")
  }

  test("torn write: a crash after all segment writes, before the sinks, converges on restart") {
    val oneShot = capstone.map(_.toSeq).toSeq
    val replay = StreamingJobs.docsReplayDir(spark, dir)
    def tmp(t: String): String = java.nio.file.Files
      .createTempDirectory(s"graft-capt-$t").toString
    val (db, ds, gd, fs, ns, ckpt) = (tmp("db"), tmp("ds"), tmp("gd"),
      tmp("fs"), tmp("ns"), tmp("ckpt"))
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val thrown = intercept[Exception] {
      DocQueries.runStreamCapstone(spark, dir, replay, db, ds, gd, fs,
        ns, ckpt, crashBeforeSink = id =>
          if (id == 1L && crashed.compareAndSet(false, true))
            throw new RuntimeException("torn-write injection"))
    }
    assert(thrown.getMessage != null)
    assert(crashed.get, "the injected crash never fired")
    // the tear is real: batch 1's three segments exist, neither sink
    assert(new java.io.File(s"$db/batch=1").exists() &&
      new java.io.File(s"$gd/batch=1").exists(),
      "crash fired before the segment writes — wrong injection point")
    assert(!new java.io.File(s"$fs/batch=1").exists() &&
      !new java.io.File(s"$ns/batch=1").exists(),
      "a sink partition exists despite the pre-sink crash")
    DocQueries.runStreamCapstone(spark, dir, replay, db, ds, gd, fs, ns,
      ckpt)
    val recovered = DocQueries.capstoneTable(spark, dir, fs, ns)
      .collect().map(_.toSeq).toSeq
    assert(recovered === oneShot,
      "post-crash rerun diverged from the one-shot run")
  }
}
