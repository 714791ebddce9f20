package graft.tools

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.{Files, Paths}

import graft.{Sessions, SparkEntry}

/** Round-20 optimization evidence: write plans/r20/<query>_<tag>.txt with
  * the formatted physical plan of each named query (and, for streaming
  * queries, the recorded inner foreachBatch plans — the q44 caveat: the
  * returned DataFrame is a sink read, so the per-batch kernels are the
  * plans that matter).
  * Usage: runMain graft.tools.PlanDumpR20 <sfDir> <tag> <query> [query...]
  */
object PlanDumpR20 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = args(1)
    val spark = Sessions.local("graft-plandump-r20")
    Files.createDirectories(Paths.get("plans/r20"))
    args.drop(2).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val buf = new ByteArrayOutputStream()
      Console.withOut(new PrintStream(buf, true, "UTF-8")) {
        df.explain("formatted")
      }
      val out = new StringBuilder
      out ++= s"== $name ($tag) ==\n\n"
      out ++= buf.toString("UTF-8").trim
      out ++= "\n"
      val innerKeys = graft.streaming.StreamingJobs.innerPlanKeys
        .filter(_.startsWith(name + " "))
      innerKeys.foreach { k =>
        out ++= s"\n== recorded inner plan: $k ==\n\n"
        out ++= graft.streaming.StreamingJobs.innerPlanOf(k).get.trim
        out ++= "\n"
      }
      Files.writeString(Paths.get(s"plans/r20/${name}_$tag.txt"),
        PlanDump.normalizeScratch(out.toString))
      println(s"[plandump-r20] wrote plans/r20/${name}_$tag.txt")
      graft.queries.QueryCaches.releaseAll()
      graft.queries.Scratch.purge()
    }
    spark.stop()
  }
}
