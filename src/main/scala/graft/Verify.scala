package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing args: run only these queries (local iteration;
    // the driver always passes exactly two args)
    val only = args.drop(2).toSet
    val spark = Sessions.local("graft-verify")
    new java.io.File(outDir).mkdirs()
    // name -> one-line exception summary for every failed query; written
    // as $outDir/errors.json so a failure degrades to a driver-visible
    // `err` CORRECTNESS row instead of a silently absent key (round-8
    // verdict item 2: 14 events queries vanished with no artifact trail).
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          val n = spark.read.parquet(s"$outDir/$name").count()
          System.err.println(s"[verify] $name rows=$n")
        } catch { case e: Throwable =>
          val msg = s"${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator
              .take(3).mkString(" | ").take(500)
          errors(name) = msg
          System.err.println(s"[verify] $name failed: $msg")
        } finally {
          // release any cache a query persisted (q93) and delete the
          // streaming queries' scratch dirs — in a finally so a
          // failure AFTER persist() still drops its entries immediately
          // (round-9 ADVICE item 3), mirroring Bench's structure. The
          // write above already consumed the sink read, so deletion is
          // safe (Scratch's contract).
          queries.QueryCaches.releaseAll()
          queries.Scratch.purge()
        }
      }
    // JSON string escape (shared with Bench — ONE escape table, so the
    // two JSON writers cannot drift): backslash, quote, and ALL control
    // chars (<0x20) — a tab or CR in builder-authored SQL would
    // otherwise make the driver's json.load fail and silently zero the
    // round's correctness.
    def q(s: String): String = "\"" + Bench.jesc(s) + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} failed: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
