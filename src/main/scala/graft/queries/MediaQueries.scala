package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps

/** Q31: the multimodal pipeline under the oracle gate. The binary
  * payloads are synthesized deterministically from `documents` (UTF-8
  * bytes), so the DuckDB oracle can recompute every derived feature —
  * which proves the Spark-side plumbing (binary columns, decode stage,
  * frame explode, feature aggregation) end to end even though the codec
  * kernel itself is a stub (MultimodalOps scaladoc). */
object MediaQueries {

  private val q31 = QueryDef(
    "q31_multimodal_features",
    (s, dir) => {
      import s.implicits._
      val decoded = MultimodalOps.decodeStub(
        MultimodalOps.mediaFromDocuments(s, dir))
      val frames = MultimodalOps.sampleFrames(decoded)
        .groupBy($"media_id").agg(count(lit(1)).as("n_frames"))
      decoded.join(frames, "media_id")
        .groupBy($"kind", $"source")
        .agg(count(lit(1)).as("n_media"),
          sum($"n_bytes").as("total_bytes"),
          countDistinct($"checksum").as("n_checksums"),
          sum($"n_frames").as("total_frames"))
        .orderBy($"kind", $"source")
    },
    // The oracle recomputes the frame count arithmetically (Σ ceil(n/64))
    // — the Spark side actually explodes frame rows and counts them, so a
    // match proves the explode fan-out is exactly ceil(n_bytes/64) rows.
    Some("""WITH media AS (
        SELECT doc_id AS media_id,
          (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
          octet_length(encode(text)) AS n_bytes,
          md5(text) AS checksum,
          source
        FROM documents)
      SELECT kind, source, COUNT(*) AS n_media,
        CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        COUNT(DISTINCT checksum) AS n_checksums,
        CAST(SUM(CAST(ceil(n_bytes / 64.0) AS BIGINT)) AS BIGINT)
          AS total_frames
      FROM media GROUP BY 1, 2 ORDER BY 1, 2"""))

  val all: Seq[QueryDef] = Seq(q31)
}
