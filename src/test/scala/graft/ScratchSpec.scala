package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Registry, Scratch}

/** queries.Scratch — the per-run scratch-dir registry behind the
  * streaming queries' sink/checkpoint/delta roots (round-15 ADVICE
  * item 2: Bench's timed reps were accumulating a full delta-index +
  * sink copy per rep under /tmp). Pins the two halves of the
  * contract: purge really deletes (recursively), and the streaming
  * queries really route their dirs through the registry so the
  * harness purge reaches them. */
class ScratchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("purge recursively deletes registered dirs, tolerates absences") {
    val d = new java.io.File(Scratch.dir("graft-scratch-spec"))
    val nested = new java.io.File(d, "a/b")
    assert(nested.mkdirs())
    java.nio.file.Files.writeString(
      nested.toPath.resolve("f.txt"), "x")
    // a SECOND registered dir that someone already removed must not
    // abort the sweep
    val gone = new java.io.File(Scratch.dir("graft-scratch-gone"))
    assert(gone.delete())
    Scratch.purge()
    assert(!d.exists(), "purge left the registered dir on disk")
    assert(Scratch.liveCount === 0)
    // idempotent on empty
    Scratch.purge()
  }

  test("a q110d run routes its per-run dirs through the registry") {
    // drain anything earlier suites left behind so the count below is
    // this run's own registration
    Scratch.purge()
    Registry.byName("q110d_stream_index_dedup").run(spark, dir)
      .queryExecution.toRdd.count()
    // delta-bands, delta-sets, sink, checkpoint
    assert(Scratch.liveCount >= 4,
      "q110d no longer registers its scratch dirs — the Bench/Verify " +
        "purge cannot reach them")
    Scratch.purge()
    assert(Scratch.liveCount === 0)
  }
}
