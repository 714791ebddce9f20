package graft.tools
import graft.{Sessions, SparkEntry}
/** Dev tool: print the formatted plan + timed run for named queries.
  * Usage: runMain graft.tools.Explain <sfDir> <query> [query...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Sessions.local("graft-explain")
    sys.env.get("GRAFT_BROADCAST_THRESHOLD").foreach(v =>
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
    // warm up codegen/JIT so timings are comparable
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    args.tail.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      df.explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
