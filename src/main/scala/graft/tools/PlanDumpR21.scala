package graft.tools

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.{Files, Paths}

import graft.{Sessions, SparkEntry}

/** Round-21 optimization evidence: write plans/r21/<query>_<tag>.txt —
  * the PlanDumpR20 contract, new round directory.
  * Usage: runMain graft.tools.PlanDumpR21 <sfDir> <tag> <query> [query...] */
object PlanDumpR21 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = args(1)
    val spark = Sessions.local("graft-plandump-r21")
    Files.createDirectories(Paths.get("plans/r21"))
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
      Files.writeString(Paths.get(s"plans/r21/${name}_$tag.txt"),
        PlanDump.normalizeScratch(out.toString))
      println(s"[plandump-r21] wrote plans/r21/${name}_$tag.txt")
      graft.queries.QueryCaches.releaseAll()
      graft.queries.Scratch.purge()
    }
    spark.stop()
  }
}
