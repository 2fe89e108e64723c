package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.MultimodalOps

/** Multimodal plumbing query (north-star surface): synthetic media table
  * over `documents` — binary payload construction, typed metadata, and the
  * metadata-only resize transform, all DuckDB-mirrorable. The stub decode
  * path (mapPartitions) is covered by MultimodalSpec instead (not
  * SQL-expressible).
  */
object MediaQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_media_meta" -> ((s, d) =>
      MultimodalOps.resizeMeta(
          MultimodalOps.syntheticMedia(Tables.documents(s, d)), 256)
        .select(col("doc_id"), col("modality"),
          octet_length(col("payload")).as("n_bytes"),
          col("width"), col("height"), col("duration_ms"),
          col("out_width"), col("out_height"))
        .orderBy(col("doc_id"))))

  def oracles: Map[String, String] = Map(
    "q37_media_meta" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
        |    unhex(md5(text)) AS payload,
        |    CAST(n_chars % 640 AS INTEGER) AS width,
        |    CAST(n_chars % 480 AS INTEGER) AS height,
        |    CAST(n_chars * 10 AS BIGINT) AS duration_ms
        |  FROM documents),
        |r AS (
        |  SELECT *, least(CAST(1.0 AS DOUBLE),
        |           256 / greatest(width, height, 1)) AS scale
        |  FROM m)
        |SELECT doc_id, modality, CAST(octet_length(payload) AS INTEGER) AS n_bytes,
        |  width, height, duration_ms,
        |  CAST(ceil(width * scale) AS INTEGER) AS out_width,
        |  CAST(ceil(height * scale) AS INTEGER) AS out_height
        |FROM r ORDER BY doc_id""".stripMargin
  )
}
