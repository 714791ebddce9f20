package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DocQueries, Registry}
import graft.streaming.StreamingJobs

/** q110d — the streaming twin of the q110c ingest-dedup loop. The
  * DuckDB oracle grades the funnel against pure two-step semantics;
  * this spec pins what the oracle cannot see: (1) the stream computes
  * the SAME relation as the batch append cycle (the batch/stream
  * parity law, on real fixtures); (2) the replay genuinely arrives as
  * two micro-batches in carve order; (3) the foreachBatch writes are
  * idempotent under AT-LEAST-ONCE redelivery — re-running both batches
  * (batch 0 after batch 1's delta segment already exists, the worst
  * case for the `batch < id` index filter) leaves the funnel sink and
  * both index delta segments unchanged. */
class StreamIndexDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private lazy val streamed = Registry.byName("q110d_stream_index_dedup")
    .run(spark, dir).collect()

  test("streamed funnel equals the batch q110c relation row for row") {
    val cyc = Registry.byName("q110c_index_append_cycle")
      .run(spark, dir).collect()
    assert(streamed.map(_.toSeq).toSeq === cyc.map(_.toSeq).toSeq)
  }

  test("replay is two single-file micro-batches in carve order") {
    val replay = StreamingJobs.docsReplayDir(spark, dir)
    val files = new java.io.File(replay).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.map(_.getName).toSeq === Seq("b0.parquet", "b1.parquet"))
    // mtimes strictly increasing: the file source admits b0 first
    assert(files(0).lastModified < files(1).lastModified)
    // each file is exactly one md5-carve class
    val mods = files.map { f =>
      spark.read.parquet(f.toString).select(DocQueries.q110Mod.as("m"))
        .distinct().collect().map(_.getLong(0)).toSet
    }
    assert(mods(0) === Set(0L) && mods(1) === Set(1L))
    // the streamed report carries both batch tags
    assert(streamed.map(_.getAs[Long]("batch")).toSet === Set(1L, 2L))
  }

  test("at-least-once redelivery leaves the funnel and the index unchanged") {
    val replay = StreamingJobs.docsReplayDir(spark, dir)
    def tmp(t: String): String = java.nio.file.Files
      .createTempDirectory(s"graft-sids-$t").toString
    val (db, ds, sink, ckpt) =
      (tmp("dbands"), tmp("dsets"), tmp("sink"), tmp("ckpt"))
    DocQueries.runStreamIndexDedup(spark, dir, replay, db, ds, sink, ckpt)
    def snap(): (Seq[Seq[Any]], Set[Seq[Any]], Set[Seq[Any]]) = (
      DocQueries.streamDedupTable(spark, sink)
        .collect().map(_.toSeq).toSeq,
      spark.read.parquet(db).select("batch", "doc_id").distinct()
        .collect().map(_.toSeq).toSet,
      spark.read.parquet(ds).select("batch", "doc_id").distinct()
        .collect().map(_.toSeq).toSet)
    val before = snap()
    // redeliver BOTH batches directly through the per-batch function —
    // batch 0 re-runs with batch 1's segment already on disk, so its
    // `batch < 0` filter must hide batch 0's own first delivery AND
    // batch 1's segment, or its docs would near-dup themselves
    val (iBands, iSets) = Tables.minhashIndexBase(spark, dir)
    val all = spark.read.parquet(replay)
    Seq(0L, 1L).foreach { id =>
      DocQueries.streamDedupBatch(spark,
        all.filter(DocQueries.q110Mod === id), id,
        iBands, iSets, db, ds, sink)
    }
    assert(snap() === before,
      "redelivered batches changed the sink or the index segments")
  }

  test("checkpoint resume: a restart between batches equals the one-shot run") {
    // the restart case redelivery doesn't cover: the stream DIES after
    // batch 0 (here: drains a replay dir that only holds b0), then a
    // NEW stream execution starts from the same checkpoint once b1 has
    // arrived — it must resume at batchId 1 (not reprocess b0, not
    // restart numbering at 0, which would overwrite batch 0's sink
    // partition with b1's data) and the final funnel must equal the
    // uninterrupted run's
    import java.nio.file.{Files, Path, StandardCopyOption}
    val src = new java.io.File(
      StreamingJobs.docsReplayDir(spark, dir))
    def tmp(t: String): Path =
      Files.createTempDirectory(s"graft-sidr-$t")
    val stage = tmp("replay")
    val (db, ds, sink, ckpt) = (tmp("db").toString, tmp("ds").toString,
      tmp("sink").toString, tmp("ckpt").toString)
    def arrive(name: String): Unit = {
      val from = new java.io.File(src, name)
      val to = stage.resolve(name)
      Files.copy(from.toPath, to, StandardCopyOption.REPLACE_EXISTING)
      assert(to.toFile.setLastModified(from.lastModified))
    }
    // leg 1: only b0 has arrived; the stream drains it and "dies"
    arrive("b0.parquet")
    DocQueries.runStreamIndexDedup(spark, dir, stage.toString,
      db, ds, sink, ckpt)
    // leg 2: b1 arrives; a fresh execution resumes from the SAME
    // checkpoint against the same sink/delta dirs
    arrive("b1.parquet")
    DocQueries.runStreamIndexDedup(spark, dir, stage.toString,
      db, ds, sink, ckpt)
    val resumed = DocQueries.streamDedupTable(spark, sink)
      .collect().map(_.toSeq).toSeq
    assert(resumed === streamed.map(_.toSeq).toSeq,
      "restarted stream diverged from the one-shot run")
  }
}
