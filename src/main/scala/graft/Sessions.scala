package graft

import org.apache.spark.sql.SparkSession

/** One place that builds every SparkSession (Verify, Bench, tests).
  *
  * All cross-engine determinism-relevant settings live HERE, not in
  * loaders or queries (a loader mutating session conf as a side effect
  * silently changes later reads — flagged in round 1's verdict):
  *
  *   - session.timeZone=UTC: events.ts round-trips through TimestampNTZ;
  *     any NTZ↔LTZ cast must agree with the DuckDB oracle's UTC epoch math.
  *   - legacy.parquet.nanosAsLong=true: events.parquet stores
  *     TIMESTAMP(NANOS), which Spark's reader otherwise rejects; we read
  *     raw Long nanos and truncate to µs ourselves (Tables.loadEvents).
  *   - shuffle.partitions = cpu count (NOT the 200 default): local[32]
  *     single-JVM; on a real cluster this is sized to executor count and
  *     AQE coalesces post-shuffle partitions anyway.
  *   - AQE on: runtime re-plan (broadcast conversion, skew-join split) is
  *     the 100 TB answer to stats drift; we design plans assuming it.
  */
object Sessions {
  def cpus: String = sys.props.get("SPARK_GRAFT_CPUS")
    .orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")

  def local(appName: String): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("graft.warehouse", "/tmp/graft-warehouse"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Typed Aggregator exemplars register per-session (UDAFs are not
    // injectable through SparkSessionExtensions).
    spark.udf.register("wavg_dec",
      org.apache.spark.sql.functions.udaf(
        graft.functions.DecimalWeightedAvg,
        graft.functions.DecimalWeightedAvg.inputEncoder))
    spark
  }
}
