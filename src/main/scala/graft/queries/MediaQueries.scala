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
        .orderBy(col("doc_id"))),

    // REAL image decode through the JDK's ImageIO: each document becomes a
    // deterministic solid-gray PNG (w = 1+id%8, h = 1+id%5, luma = id%256),
    // the batched mapPartitions decode recovers true pixel dimensions and
    // the exact channel mean, and the oracle predicts the decode output
    // arithmetically (PNG is lossless) — no decoder needed on the oracle
    // side. Proves the decode path end-to-end: encode → bytes → ImageIO →
    // pixel stats.
    "q67_image_decode" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id")).as[Long]
        .map { id =>
          val w = (1 + id % 8).toInt
          val h = (1 + id % 5).toInt
          val c = (id % 256).toInt
          MultimodalOps.MediaRow(id, "image",
            MultimodalOps.encodePng(w, h, (c << 16) | (c << 8) | c),
            "png", w, h, 0L)
        }
      MultimodalOps.decodeImages(media).toDF()
        .select(col("doc_id"), col("decoded"), col("img_width"),
          col("img_height"), col("mean_luma"))
        .orderBy(col("doc_id"))
    }),

    // REAL audio decode through the JDK's sampled-audio reader: each
    // document becomes a deterministic mono 16-bit PCM WAV (n = 8 + id%16
    // samples at 8 kHz, sample i = (id + 7i) % 2048 - 1024), the batched
    // mapPartitions decode recovers the container format and the exact
    // sample stream, and the oracle predicts the RMS arithmetically (WAV is
    // lossless; the sum of squares is an exact BIGINT on both engines and
    // sqrt of the same double is correctly rounded). The audio twin of q67.
    "q132_audio_decode" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id")).as[Long]
        .map { id =>
          val n = (8 + id % 16).toInt
          val samples = Array.tabulate[Short](n)(i =>
            (((id + 7L * i) % 2048) - 1024).toShort)
          MultimodalOps.MediaRow(id, "audio",
            MultimodalOps.encodeWav(8000, samples), "wav", 0, 0, 0L)
        }
      MultimodalOps.decodeAudio(media).toDF()
        .select(col("doc_id"), col("decoded"), col("sample_rate"),
          col("channels"), col("n_samples"), col("rms"))
        .orderBy(col("doc_id"))
    }),

    // REAL multi-frame VIDEO decode through javax.imageio's animated-GIF
    // reader — the one true multi-frame codec the JDK ships (MP4/H.264
    // remain a documented stub). Each document becomes a deterministic
    // nf-frame solid-gray animation (frame k's gray = (31·id + 17·k) %
    // 256), the batched mapPartitions decode demuxes and decodes every
    // frame, and the oracle predicts frame count, dimensions and the
    // cross-frame mean arithmetically (GIF is lossless for solid frames;
    // the pixel sum is an exact BIGINT, the final division mirrors the
    // decoder's sum/(3.0·npix) op order). The motion twin of q67/q132.
    "q144_video_decode" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id")).as[Long]
        .map { id =>
          val w = (1 + id % 4).toInt
          val h = (1 + id % 3).toInt
          val nf = (1 + id % 5).toInt
          val colors = Array.tabulate(nf) { k =>
            val c = ((31L * id + 17L * k) % 256).toInt
            (c << 16) | (c << 8) | c
          }
          MultimodalOps.MediaRow(id, "video",
            MultimodalOps.encodeAnimatedGif(w, h, colors, 10),
            "gif", w, h, nf * 100L)
        }
      MultimodalOps.decodeVideos(media).toDF()
        .select(col("doc_id"), col("decoded"), col("n_frames"),
          col("vid_width"), col("vid_height"), col("mean_luma"))
        .orderBy(col("doc_id"))
    }),

    // Frame-sampling MANIFEST (relational twin of MultimodalOps.sampleFrames'
    // schedule): one row per sampled frame of each video every 1000 ms —
    // the generate runs map-side off metadata; the byte-slicing stub decode
    // stays in the Dataset path (MultimodalSpec).
    "q57_frame_manifest" -> ((s, d) =>
      MultimodalOps.syntheticMedia(Tables.documents(s, d))
        .filter(col("modality") === "video")
        .select(col("doc_id"), col("duration_ms"),
          greatest(lit(1L), floor(col("duration_ms") / 1000)).as("n_frames"))
        .select(col("doc_id"), col("duration_ms"), col("n_frames"),
          explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_id"))
        .withColumn("offset_ms", col("frame_id") * 1000)
        .orderBy(col("doc_id"), col("frame_id"))))

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
        |FROM r ORDER BY doc_id""".stripMargin,
    "q67_image_decode" ->
      """SELECT doc_id, true AS decoded,
        |  CAST(1 + doc_id % 8 AS INTEGER) AS img_width,
        |  CAST(1 + doc_id % 5 AS INTEGER) AS img_height,
        |  CAST(doc_id % 256 AS DOUBLE) AS mean_luma
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Video: per-frame solid grays sum exactly; the mean mirrors the
    // decoder's CAST(sum AS DOUBLE) / (3.0 * npix) op order, where
    // sum = 3·w·h·Σc and npix = w·h·nf.
    "q144_video_decode" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    1 + doc_id % 4 AS w, 1 + doc_id % 3 AS h,
        |    1 + doc_id % 5 AS nf
        |  FROM documents),
        |f AS (SELECT doc_id, w, h, nf, unnest(range(nf)) AS k FROM d),
        |c AS (SELECT doc_id, w, h, nf, (31 * doc_id + 17 * k) % 256 AS gray
        |      FROM f),
        |a AS (
        |  SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
        |    any_value(nf) AS nf,
        |    CAST(3 * any_value(w) * any_value(h) * SUM(gray) AS BIGINT) AS s
        |  FROM c GROUP BY doc_id)
        |SELECT doc_id, true AS decoded,
        |  CAST(nf AS INTEGER) AS n_frames,
        |  CAST(w AS INTEGER) AS vid_width, CAST(h AS INTEGER) AS vid_height,
        |  CAST(s AS DOUBLE) / (3.0 * CAST(w * h * nf AS BIGINT)) AS mean_luma
        |FROM a ORDER BY doc_id""".stripMargin,
    "q132_audio_decode" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 16 AS n FROM documents),
        |s AS (SELECT doc_id, n, unnest(range(n)) AS i FROM d),
        |q AS (SELECT doc_id, n, (doc_id + 7 * i) % 2048 - 1024 AS v FROM s),
        |a AS (SELECT doc_id, any_value(n) AS n, sum(v * v) AS ss
        |      FROM q GROUP BY doc_id)
        |SELECT doc_id, true AS decoded,
        |  CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(1 AS INTEGER) AS channels,
        |  CAST(n AS BIGINT) AS n_samples,
        |  sqrt(CAST(ss AS DOUBLE) / n) AS rms
        |FROM a ORDER BY doc_id""".stripMargin,
    "q57_frame_manifest" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(n_chars * 10 AS BIGINT) AS duration_ms
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT doc_id, duration_ms,
        |    greatest(CAST(1 AS BIGINT), duration_ms // 1000) AS n_frames
        |  FROM m)
        |SELECT doc_id, duration_ms, CAST(n_frames AS BIGINT) AS n_frames,
        |  CAST(unnest(range(0, n_frames)) AS BIGINT) AS frame_id,
        |  CAST(unnest(range(0, n_frames)) * 1000 AS BIGINT) AS offset_ms
        |FROM f ORDER BY doc_id, frame_id""".stripMargin
  )
}
