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
    }
    // the k=1 fold cadence's read set (round-17 verdict item 2):
    // batch 0 reads the minhash base index; batch 1 — after the fold
    // at batch 0 — reads the fold=0 segment ALONE, never the base
    val dedup0 = StreamingJobs
      .innerPlanOf("q122_stream_ingest_capstone dedup batch=0").get
    val dedup1 = StreamingJobs
      .innerPlanOf("q122_stream_ingest_capstone dedup batch=1").get
    assert(dedup0.contains("docs_minhash_base_"),
      s"capstone dedup batch=0 does not scan the base index:\n$dedup0")
    assert(dedup1.contains("fold=0") &&
      !dedup1.contains("docs_minhash_base_"),
      s"capstone dedup batch=1 is not the fold=0 scan alone:\n$dedup1")
  }

  test("k=1 cadence: batch 1's dedup AND gram probe read fold segments only — no base, no delta") {
    // the q110f/q117e read-side signature on the COMPOSED job, with
    // known dirs so the delta-root absence is assertable: after the
    // fold at batch 0, batch 1's recorded dedup plan scans the two
    // minhash fold=0 segments and its recorded novelty plan scans the
    // gram fold=0 segment — never a base table, never a delta root.
    val replay = StreamingJobs.docsReplayDir(spark, dir)
    def tmp(t: String): String = java.nio.file.Files
      .createTempDirectory(s"graft-capc-$t").toString
    val (db, ds, cb, cs, gd, gf, fs, ns, ckpt) = (tmp("db"), tmp("ds"),
      tmp("cb"), tmp("cs"), tmp("gd"), tmp("gf"), tmp("fs"), tmp("ns"),
      tmp("ckpt"))
    // gc = false: this law forensically inspects the SUPERSEDED fold=0
    // (and the delta roots) after the drain — exactly what the wired-in
    // post-checkpoint GC deletes; the GC equivalence law below covers
    // the default path
    DocQueries.runStreamCapstone(spark, dir, replay, db, ds, cb, cs,
      gd, gf, fs, ns, ckpt, gc = false)
    // the fold landed at the cadence in ALL THREE relations' dirs
    for (d <- Seq(cb, cs, gf); n <- Seq(0, 1))
      assert(new java.io.File(s"$d/fold=$n", "_SUCCESS").exists(),
        s"fold=$n missing or uncommitted under $d")
    val dedup1 = StreamingJobs
      .innerPlanOf("q122_stream_ingest_capstone dedup batch=1")
      .getOrElse(fail("batch-1 dedup inner plan was not recorded"))
    assert(dedup1.contains(s"$cb/fold=0") && dedup1.contains(s"$cs/fold=0"),
      s"batch-1 dedup does not scan the minhash folds:\n$dedup1")
    assert(!dedup1.contains(db) && !dedup1.contains(ds) &&
      !dedup1.contains("docs_minhash_base_"),
      s"batch-1 dedup still scans the base index or a delta root:\n$dedup1")
    val probe1 = StreamingJobs
      .innerPlanOf("q122_stream_ingest_capstone novelty batch=1")
      .getOrElse(fail("batch-1 novelty inner plan was not recorded"))
    assert(probe1.contains(s"$gf/fold=0"),
      s"batch-1 gram probe does not scan the gram fold:\n$probe1")
    assert(!probe1.contains(gd) && !probe1.contains("docs_grams_"),
      s"batch-1 gram probe still scans the gram base or a delta root:\n$probe1")
  }

  test("a fold torn across the three relations is uncommitted; a k-retune after the crash converges") {
    // the StreamIndexDedupSpec torn-fold law on the composed cadence:
    // under k=1, batch 0's fold crashes BETWEEN the bands write and
    // the sets/gram writes; the restart retunes to k=2, so the re-run
    // batch 0 never re-fires its fold and the torn fold=0 stays on
    // disk forever. foldPoint's committed-in-EVERY-relation predicate
    // must read past it (base ∪ delta tail), and the final report must
    // equal the one-shot run's.
    val oneShot = capstone.map(_.toSeq).toSeq
    val replay = StreamingJobs.docsReplayDir(spark, dir)
    val (iBands, iSets) = Tables.minhashIndexBase(spark, dir)
    val grams = Tables.gramIndex(spark, dir)
    val all = spark.read.parquet(replay)
    def tmp(t: String): String = java.nio.file.Files
      .createTempDirectory(s"graft-capf-$t").toString
    val (db, ds, cb, cs, gd, gf, fs, ns) = (tmp("db"), tmp("ds"),
      tmp("cb"), tmp("cs"), tmp("gd"), tmp("gf"), tmp("fs"), tmp("ns"))
    // seed the delta roots (the runStreamCapstone contract, inline so
    // the batches can be driven directly)
    iBands.select("doc_id", "band_idx", "band_val").limit(0)
      .write.mode("overwrite").parquet(s"$db/batch=-1")
    iSets.select("doc_id", "ss", "n").limit(0)
      .write.mode("overwrite").parquet(s"$ds/batch=-1")
    grams.limit(0).select(org.apache.spark.sql.functions.col("gram"))
      .write.mode("overwrite").parquet(s"$gd/batch=-1")
    def batch(id: Long, k: Int,
        crashMidFold: Long => Unit = _ => ()): Unit =
      DocQueries.streamCapstoneBatch(spark,
        all.filter(DocQueries.q110Mod === id), id, iBands, iSets,
        db, ds, cb, cs, grams, gd, gf, fs, ns, k,
        crashMidFold = crashMidFold)
    val thrown = intercept[RuntimeException] {
      batch(0L, k = 1,
        crashMidFold = _ => throw new RuntimeException("torn-fold injection"))
    }
    assert(thrown.getMessage === "torn-fold injection")
    // the tear is real: the bands fold committed, sets + gram never
    assert(new java.io.File(s"$cb/fold=0", "_SUCCESS").exists(),
      "bands fold missing — wrong injection point")
    assert(!new java.io.File(s"$cs/fold=0").exists() &&
      !new java.io.File(s"$gf/fold=0").exists(),
      "a later relation's fold exists despite the mid-fold crash")
    // restart retuned to k=2: batch 0 re-runs (no fold re-fires —
    // (0+1) % 2 != 0), batch 1 folds under the new cadence
    batch(0L, k = 2)
    batch(1L, k = 2)
    assert(!new java.io.File(s"$cs/fold=0").exists(),
      "the retuned re-run resurrected the torn fold")
    for (d <- Seq(cb, cs, gf))
      assert(new java.io.File(s"$d/fold=1", "_SUCCESS").exists(),
        s"the k=2 fold at batch 1 did not commit under $d")
    val recovered = DocQueries.capstoneTable(spark, dir, fs, ns)
      .collect().map(_.toSeq).toSeq
    assert(recovered === oneShot,
      "the torn fold leaked into the capstone report")
    // and the re-run batch 1 read PAST the torn fold: base ∪ deltas
    val dedup1 = StreamingJobs
      .innerPlanOf("q122_stream_ingest_capstone dedup batch=1").get
    assert(dedup1.contains("docs_minhash_base_") && !dedup1.contains(cb),
      s"batch-1 re-run touched the torn fold instead of the base:\n$dedup1")
  }

  test("at-least-once redelivery leaves both sinks and all three segment roots unchanged") {
    val replay = StreamingJobs.docsReplayDir(spark, dir)
    def tmp(t: String): String = java.nio.file.Files
      .createTempDirectory(s"graft-capd-$t").toString
    val (db, ds, cb, cs, gd, gf, fs, ns, ckpt) = (tmp("db"), tmp("ds"),
      tmp("cb"), tmp("cs"), tmp("gd"), tmp("gf"), tmp("fs"), tmp("ns"),
      tmp("ckpt"))
    // gc = false: the law snapshots the delta roots and BOTH folds,
    // which the wired-in post-checkpoint GC would reap
    DocQueries.runStreamCapstone(spark, dir, replay, db, ds, cb, cs,
      gd, gf, fs, ns, ckpt, gc = false)
    def snap(): (Seq[Seq[Any]], Set[Seq[Any]], Set[Seq[Any]],
        Set[Seq[Any]]) = (
      DocQueries.capstoneTable(spark, dir, fs, ns)
        .collect().map(_.toSeq).toSeq,
      spark.read.parquet(db).select("batch", "doc_id").distinct()
        .collect().map(_.toSeq).toSet,
      spark.read.parquet(gd).select("batch", "gram").distinct()
        .collect().map(_.toSeq).toSet,
      // per-fold membership across the k=1 folds — redelivery must
      // leave the fold segments unchanged too
      spark.read.parquet(cb).select("fold", "doc_id").distinct()
        .collect().map(_.toSeq).toSet)
    val before = snap()
    // a committed fold is never rewritten on redelivery (the lsmFoldAt
    // skip — rewriting passed it through a transient uncommitted
    // window): pin via the part-FILE NAME sets. Every Spark write job
    // mints fresh job-UUID part names (part-00000-<uuid>-…), so a
    // rewrite — even one landing byte-identical content within the
    // same mtime-granularity second (round-18 ADVICE item 3) —
    // changes the name set, while a skip provably cannot.
    def foldPartNames: Seq[Set[String]] =
      for (d <- Seq(cb, cs, gf); n <- Seq(0, 1))
        yield new java.io.File(s"$d/fold=$n").list().toSet
    val partNamesBefore = foldPartNames
    assert(partNamesBefore.forall(_.exists(_.startsWith("part-"))),
      "fixture: expected parquet part files in every committed fold")
    // redeliver BOTH batches through the per-batch function — batch 0
    // re-runs with every later segment already on disk, so its
    // `batch < 0` filters must hide them all across both families
    val (iBands, iSets) = Tables.minhashIndexBase(spark, dir)
    val grams = Tables.gramIndex(spark, dir)
    val all = spark.read.parquet(replay)
    Seq(0L, 1L).foreach { id =>
      DocQueries.streamCapstoneBatch(spark,
        all.filter(DocQueries.q110Mod === id), id, iBands, iSets,
        db, ds, cb, cs, grams, gd, gf, fs, ns)
    }
    assert(snap() === before,
      "redelivered batches changed a sink, a segment root, or a fold")
    assert(foldPartNames === partNamesBefore,
      "a committed fold was rewritten during redelivery")
  }

  test("checkpoint resume between batches equals the one-shot run") {
    import java.nio.file.{Files, Path, StandardCopyOption}
    val oneShot = capstone.map(_.toSeq).toSeq // force BEFORE own legs
    val src = new java.io.File(StreamingJobs.docsReplayDir(spark, dir))
    def tmp(t: String): Path = Files.createTempDirectory(s"graft-capr-$t")
    val stage = tmp("replay")
    val (db, ds, cb, cs, gd, gf, fs, ns, ckpt) = (tmp("db").toString,
      tmp("ds").toString, tmp("cb").toString, tmp("cs").toString,
      tmp("gd").toString, tmp("gf").toString, tmp("fs").toString,
      tmp("ns").toString, tmp("ckpt").toString)
    def arrive(name: String): Unit = {
      val from = new java.io.File(src, name)
      val to = stage.resolve(name)
      Files.copy(from.toPath, to, StandardCopyOption.REPLACE_EXISTING)
      assert(to.toFile.setLastModified(from.lastModified))
    }
    arrive("b0.parquet")
    DocQueries.runStreamCapstone(spark, dir, stage.toString, db, ds,
      cb, cs, gd, gf, fs, ns, ckpt)
    arrive("b1.parquet")
    DocQueries.runStreamCapstone(spark, dir, stage.toString, db, ds,
      cb, cs, gd, gf, fs, ns, ckpt)
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
    val (db, ds, cb, cs, gd, gf, fs, ns, ckpt) = (tmp("db"), tmp("ds"),
      tmp("cb"), tmp("cs"), tmp("gd"), tmp("gf"), tmp("fs"), tmp("ns"),
      tmp("ckpt"))
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val thrown = intercept[Exception] {
      DocQueries.runStreamCapstone(spark, dir, replay, db, ds, cb, cs,
        gd, gf, fs, ns, ckpt, crashBeforeSink = id =>
          if (id == 1L && crashed.compareAndSet(false, true))
            throw new RuntimeException("torn-write injection"))
    }
    assert(thrown.getMessage != null)
    assert(crashed.get, "the injected crash never fired")
    // the tear is real: batch 1's three segments AND its fold exist
    // (the fold precedes the sinks in the batch), neither sink does
    assert(new java.io.File(s"$db/batch=1").exists() &&
      new java.io.File(s"$gd/batch=1").exists(),
      "crash fired before the segment writes — wrong injection point")
    assert(!new java.io.File(s"$fs/batch=1").exists() &&
      !new java.io.File(s"$ns/batch=1").exists(),
      "a sink partition exists despite the pre-sink crash")
    DocQueries.runStreamCapstone(spark, dir, replay, db, ds, cb, cs,
      gd, gf, fs, ns, ckpt)
    val recovered = DocQueries.capstoneTable(spark, dir, fs, ns)
      .collect().map(_.toSeq).toSeq
    assert(recovered === oneShot,
      "post-crash rerun diverged from the one-shot run")
  }

  test("post-checkpoint GC rides the capstone's own path: dead segments die, the report and live fold survive") {
    // round-18 verdict item 5 — the StreamIndexDedupSpec GC law
    // extended to the capstone's THREE relations, exercised where a
    // deployment runs it: runStreamCapstone's default gc = true calls
    // lsmGc(capstoneRels, checkpointedBatchId(ckpt)) after the drain.
    // The registry fixture (`capstone`) already runs that path; here
    // a gc'd and an un-gc'd drive of the same replay must agree on
    // the report, and the gc'd tree must hold exactly the live state.
    val replay = StreamingJobs.docsReplayDir(spark, dir)
    def tmp(t: String): String = java.nio.file.Files
      .createTempDirectory(s"graft-capgc-$t").toString
    def drive(gc: Boolean): (Seq[Seq[Any]], Seq[String], String) = {
      val (db, ds, cb, cs, gd, gf, fs, ns, ckpt) = (tmp("db"), tmp("ds"),
        tmp("cb"), tmp("cs"), tmp("gd"), tmp("gf"), tmp("fs"), tmp("ns"),
        tmp("ckpt"))
      DocQueries.runStreamCapstone(spark, dir, replay, db, ds, cb, cs,
        gd, gf, fs, ns, ckpt, gc = gc)
      val table = DocQueries.capstoneTable(spark, dir, fs, ns)
        .collect().map(_.toSeq).toSeq
      (table, Seq(db, ds, cb, cs, gd, gf), ckpt)
    }
    // the wired-in path: a gc'd and an un-gc'd drive agree on the report
    val (tableNoGc, dirsNoGc, ckptNoGc) = drive(gc = false)
    val (tableGc, dirsGc, _) = drive(gc = true)
    assert(tableGc === tableNoGc, "GC changed the capstone report")
    def assertGcd(dirs: Seq[String]): Unit = {
      val Seq(db, ds, cb, cs, gd, gf) = dirs
      // the checkpoint committed batches 0 and 1 → live fold point = 1:
      // fold=0 is superseded and deltas 0..1 folded — dead; fold=1
      // survives committed. (No batch=-1 schema seed exists any more —
      // round 21 elides the empty-tail read by listing instead of
      // seeding a schema; a spec-seeded one would still survive GC via
      // deadSegs' n >= 0 bound, pinned in StreamIndexDedupSpec.)
      for (d <- Seq(cb, cs, gf)) {
        assert(!new java.io.File(s"$d/fold=0").exists(),
          s"GC left the superseded fold=0 alive under $d")
        assert(new java.io.File(s"$d/fold=1", "_SUCCESS").exists(),
          s"GC touched the live fold under $d")
      }
      for (d <- Seq(db, ds, gd)) {
        assert(!new java.io.File(s"$d/batch=0").exists() &&
          !new java.io.File(s"$d/batch=1").exists(),
          s"GC left a folded delta alive under $d")
      }
    }
    assertGcd(dirsGc)
    // the same GC applied DIRECTLY (the deployment's maintenance call,
    // against the real checkpoint's committed id) on the un-gc'd tree:
    // also reaps a stranded stage dir below the live point — the
    // stage+rename crash leftover only a mid-fold kill can produce
    val Seq(db, ds, cb, cs, gd, gf) = dirsNoGc
    assert(new java.io.File(s"$cb/.fold=0.staging").mkdirs())
    val (iBands, iSets) = graft.Tables.minhashIndexBase(spark, dir)
    val grams = graft.Tables.gramIndex(spark, dir)
    val rels = Seq(
      DocQueries.LsmRelation(
        iBands.select("doc_id", "band_idx", "band_val"), db,
        Seq("doc_id", "band_idx", "band_val"), cb),
      DocQueries.LsmRelation(iSets.select("doc_id", "ss", "n"), ds,
        Seq("doc_id", "ss", "n"), cs),
      DocQueries.LsmRelation(grams.select("gram"), gd, Seq("gram"), gf))
    assert(DocQueries.checkpointedBatchId(ckptNoGc) === 1L,
      "commit log does not show both drained batches")
    assert(DocQueries.lsmGc(rels, 1L) === 1L)
    assertGcd(dirsNoGc)
    assert(!new java.io.File(s"$cb/.fold=0.staging").exists(),
      "GC left the dead staging leftover alive")
    // and the GC'd tree still reads exactly the live fold: a NEW
    // batch 2 folds fold=2 from fold=1 ∪ its own delta alone
    val all = spark.read.parquet(replay)
    DocQueries.streamCapstoneBatch(spark,
      all.filter(DocQueries.q110Mod === 1L), 2L, iBands, iSets,
      db, ds, cb, cs, grams, gd, gf,
      tmp("fs2"), tmp("ns2"))
    assert(new java.io.File(s"$cb/fold=2", "_SUCCESS").exists(),
      "batch 2 on the GC'd tree failed to fold")
  }

  test("a torn fold heals by stage+rename; committed sibling folds are never touched") {
    // round-18 verdict item 6 (r17 ADVICE item 4 residual): the
    // genuinely-torn redelivery path now stages the rewrite to a
    // dot-prefixed sibling and renames into place — the final
    // location is never mid-write — and a relation whose fold is
    // COMMITTED keeps its part files and _SUCCESS bit-for-bit (the
    // skip set), pinned by part-file NAME sets (fresh job UUIDs per
    // write make any rewrite visible regardless of mtime granularity).
    val replay = StreamingJobs.docsReplayDir(spark, dir)
    def tmp(t: String): String = java.nio.file.Files
      .createTempDirectory(s"graft-captr-$t").toString
    val (db, ds, cb, cs, gd, gf, fs, ns, ckpt) = (tmp("db"), tmp("ds"),
      tmp("cb"), tmp("cs"), tmp("gd"), tmp("gf"), tmp("fs"), tmp("ns"),
      tmp("ckpt"))
    DocQueries.runStreamCapstone(spark, dir, replay, db, ds, cb, cs,
      gd, gf, fs, ns, ckpt, gc = false)
    def names(d: String, n: Long): Set[String] =
      Option(new java.io.File(s"$d/fold=$n").list())
        .map(_.toSet).getOrElse(Set.empty)
    val csRows = spark.read.parquet(s"$cs/fold=1")
      .collect().map(_.toSeq).toSet
    // tear fold=1 in ONE relation (sets): drop its commit marker AND
    // a part file — the on-disk shape of a crash mid-write
    assert(new java.io.File(s"$cs/fold=1", "_SUCCESS").delete())
    new java.io.File(s"$cs/fold=1").listFiles()
      .filter(_.getName.startsWith("part-")).take(1)
      .foreach(f => assert(f.delete()))
    val cbBefore = names(cb, 1L); val gfBefore = names(gf, 1L)
    // redeliver batch 1: pending = {sets} alone; the torn fold heals
    val (iBands, iSets) = (graft.Tables.minhashIndexBase(spark, dir))
    val grams = graft.Tables.gramIndex(spark, dir)
    val all = spark.read.parquet(replay)
    DocQueries.streamCapstoneBatch(spark,
      all.filter(DocQueries.q110Mod === 1L), 1L, iBands, iSets,
      db, ds, cb, cs, grams, gd, gf, fs, ns)
    assert(names(cb, 1L) === cbBefore && names(gf, 1L) === gfBefore,
      "a committed sibling fold was rewritten while healing the torn one")
    assert(new java.io.File(s"$cs/fold=1", "_SUCCESS").exists(),
      "the torn fold did not heal to a committed state")
    assert(spark.read.parquet(s"$cs/fold=1")
      .collect().map(_.toSeq).toSet === csRows,
      "the healed fold's content differs from the original commit")
    assert(!new java.io.File(s"$cs/.fold=1.staging").exists(),
      "the stage dir survived its own rename")
  }
}
