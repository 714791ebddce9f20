package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession for the whole forked test JVM (suites run
  * sequentially under sbt's forked runner). Built by the same factory
  * as Verify/Bench so tests exercise production conf (UTC, AQE,
  * nanosAsLong, graft extensions). */
object TestSpark {
  lazy val spark: SparkSession = {
    sys.props.put("SPARK_GRAFT_CPUS", "4")
    Sessions.local("graft-test")
  }
  val sf0001 = "/root/testdata/sf0.001"

  /** Recursive delete of a test scratch path (deepest-first walk,
    * stream closed — the Scratch.purge contract, shared by the GC
    * laws in StreamIndexDedupSpec and GramAppendSpec). */
  def rmr(p: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  /** The FINAL section of an executed AQE plan string. AQE's toString
    * prints "== Final Plan ==" followed by "== Initial Plan ==", and
    * the Initial section legitimately contains shapes (e.g. an SMJ
    * later demoted to broadcast) that plan-shape assertions forbid —
    * asserting on the raw string checks the wrong plan. Call after the
    * df has been executed. */
  def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    val p = df.queryExecution.executedPlan.toString
    p.indexOf("== Initial Plan ==") match {
      case -1 => p
      case i => p.substring(0, i)
    }
  }
}
