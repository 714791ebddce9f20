package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: the Spark-side implementation plus (optionally) the
  * equivalent DuckDB SQL the driver runs as the correctness oracle.
  * Column names/aliases MUST match between the two — the driver sorts
  * columns by name before hashing values.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object QueryDef {
  /** DuckDB-side CTE exposing `events` with ts truncated ns→µs, mirroring
    * graft.Tables.loadEvents. `//` is DuckDB integer floor-division. */
  val EventsUs: String =
    "WITH ev AS (SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, " +
      "user_id, event_type, value, props FROM events)"
}
