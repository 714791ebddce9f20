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
}
