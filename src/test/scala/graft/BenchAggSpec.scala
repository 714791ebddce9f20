package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench's aggregation under induced failures (round-6 verdict item 7):
  * a query keeps its median as long as ONE pass succeeded; it is dropped
  * (→ "failed") only when every pass threw. Plus the short-key
  * uniqueness contract from round-6 ADVICE: collisions fall back to
  * full names instead of emitting duplicate JSON keys. */
class BenchAggSpec extends AnyFunSuite {

  test("summarize: median over successful passes only") {
    val names = Seq("q01_a", "q02_b", "q03_c")
    val times = Map(
      "q01_a" -> Vector(3.0, 1.0, 2.0), // all passes ok → median 2.0
      "q02_b" -> Vector(7.5),           // 1 of 3 survived → still reported
      "q03_c" -> Vector.empty[Double])  // all passes failed → dropped
    val out = Bench.summarize(names, times)
    assert(out.map(_._1) === Seq("q01_a", "q02_b"))
    val byName = out.map(t => t._1 -> t).toMap
    assert(byName("q01_a")._2 === 2.0) // median
    assert(byName("q01_a")._3 === 1.0) // min
    assert(byName("q01_a")._4 === 3.0) // max
    assert(byName("q01_a")._5 === 3)   // reps_ok
    assert(byName("q02_b")._2 === 7.5)
    assert(byName("q02_b")._5 === 1)
  }

  test("summarize: a query missing from the times map is dropped") {
    val out = Bench.summarize(Seq("q09_z"), Map.empty[String, Vector[Double]])
    assert(out.isEmpty)
  }

  test("shortKeys: unique tokens shorten, repeated tokens get initials") {
    val ks = Bench.shortKeys(Seq(
      "q15_distinct_parts", "q15_distinct_parts_approx", "q22_tokens"))
    assert(ks("q22_tokens") === "q22")
    assert(ks("q15_distinct_parts") === "q15_dp")
    assert(ks("q15_distinct_parts_approx") === "q15_dpa")
    assert(ks.values.toSeq.distinct.size === 3)
  }

  test("shortKeys: collision falls back to full names for all queries") {
    // same token AND same remaining-word initials → initials collide
    val names = Seq("q08_alpha_beta", "q08_apple_banana")
    val ks = Bench.shortKeys(names)
    assert(ks === names.map(n => n -> n).toMap)
  }

  test("shortKeys: the real registry is collision-free") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val ks = Bench.shortKeys(names)
    assert(ks.values.toSeq.distinct.size === names.size)
    // and it actually shortened (fallback would return identity)
    assert(ks(names.head) !== names.head)
  }
}
