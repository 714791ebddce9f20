package graft

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry
import graft.tools.Canon

/** Golden-hash regression gate (SURVEY §5.B #1): every registered query's
  * canonicalized sf0.001 result must match the checked-in SHA-256.
  * Catches silent semantic drift between rounds. After an INTENTIONAL
  * change, regenerate with graft.tools.GoldenGen and review the diff. */
class GoldenHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val golden: Map[String, (Long, String)] = {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/golden/sf0.001.json"), "UTF-8")
    try {
      val txt = src.mkString
      """"([^"]+)": \{"rows": (\d+), "sha256": "([0-9a-f]{64})"\}""".r
        .findAllMatchIn(txt)
        .map(m => m.group(1) -> (m.group(2).toLong, m.group(3))).toMap
    } finally src.close()
  }

  test("golden file covers exactly the registered queries") {
    assert(golden.keySet === Registry.all.map(_.name).toSet)
  }

  test("sf0.01 golden file covers exactly the registered queries") {
    // Coverage-only (hashes re-executed at sf0.001 above; re-running
    // all queries at sf0.01 would double the suite time): the key SET
    // must track the registry so the file stays GoldenGen-reproducible
    // instead of drifting by hand-edit (round-10 review finding — three
    // new queries were missing while their families were present).
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/golden/sf0.01.json"), "UTF-8")
    val keys =
      try """"(q[^"]+)": \{""".r.findAllMatchIn(src.mkString)
        .map(_.group(1)).toSet
      finally src.close()
    assert(keys === Registry.all.map(_.name).toSet)
  }

  for (q <- Registry.all) test(s"${q.name} matches its golden hash") {
    val lines = Canon.rows(q.run(spark, TestSpark.sf0001))
    val (rows, hash) = golden(q.name)
    assert(lines.size === rows, "row count drifted")
    assert(Canon.sha256(lines) === hash,
      s"result drifted; if intentional, regenerate via graft.tools.GoldenGen")
  }
}
