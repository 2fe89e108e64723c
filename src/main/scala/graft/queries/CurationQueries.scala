package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextOps

/** Corpus-lifecycle operators: snapshot-to-snapshot diff (what changed
  * between two corpus versions) and curriculum ordering (which slice of the
  * corpus trains first). The reference's asset graph re-materializes the
  * whole corpus per run (/root/reference/dagster_icij/assets.py — every
  * asset is a full rebuild); at 100 TB the pipeline needs the delta, and
  * training consumers need a deterministic order over the kept mass.
  */
object CurationQueries {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  /** The v2 snapshot, derived deterministically from v1 in-query (the
    * q154/q181 fixture discipline — every status below is predictable
    * arithmetic in doc_id, so the oracle re-derives the whole diff):
    * doc_id ≡ 0 (mod 13) dropped, doc_id ≡ 0 (mod 7) re-edited (text +
    * ' rev2'), doc_id ≡ 0 (mod 11) additionally spawns a brand-new doc at
    * doc_id + 10⁷ ('v2new ' prefix). */
  private def snapshotV2(v1: DataFrame): DataFrame = {
    val kept = v1.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"),
        col("source"))
    val added = v1.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(lit("v2new "), col("text")).as("text"), col("source"))
    kept.unionByName(added)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SNAPSHOT DIFF — the incremental-ingestion primitive: given corpus
    // v1 and v2, classify every doc_id as added / removed / changed /
    // unchanged and report the per-source counts. The plan is the shape
    // that survives 100 TB: each side is reduced MAP-SIDE to
    // (doc_id, source, md5) — 16 bytes of content identity instead of the
    // document — before the FULL OUTER join on doc_id (bucketable; with
    // both snapshots bucketed by doc_id the diff is exchange-free), and
    // the classification aggregates straight down to |sources|×|statuses|
    // rows. Text never crosses a shuffle. Downstream consumers re-run
    // expensive stages (embed, dedup closure, decontam) on the
    // added+changed slice only — this query prices that slice.
    "q183_snapshot_diff" -> ((s, d) => {
      val v1 = docs(s, d)
        .select(col("doc_id"), col("source"), md5(col("text")).as("h1"))
      val v2 = snapshotV2(docs(s, d))
        .select(col("doc_id"), col("source").as("source2"),
          md5(col("text")).as("h2"))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .select(coalesce(col("source"), col("source2")).as("source"),
          when(col("h1").isNull, "added")
            .when(col("h2").isNull, "removed")
            .when(col("h1") =!= col("h2"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy(col("source"), col("status"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("source"), col("status"))
    }),

    // CURRICULUM ORDERING — the training-schedule twin of the q124/q139
    // mixing operators: rank quality WITHIN each source (a per-source
    // ntile(4), so no source is starved by another's score distribution),
    // then order the (source, stage) cells globally easiest-first by mean
    // quality. Per-cell mean quality is summed FIXED-POINT
    // (floor(quality·1e9) per doc — the q167 discipline: long sums are
    // partition-order-independent, so the mean is bit-stable where a
    // double sum is not). Scale shape: quality is one map-side projection
    // (no shuffle), the ntile window shuffles (source, 8-byte qfp) pairs
    // once, and the output is |sources|·4 rows — the schedule a trainer
    // consumes directly.
    "q184_curriculum_order" -> ((s, d) => {
      val scored = docs(s, d).select(col("doc_id"), col("source"),
        floor(TextOps.qualityScore(col("text")) * 1e9).cast("long")
          .as("qfp"))
      val staged = scored.withColumn("stage",
        ntile(4).over(Window.partitionBy(col("source"))
          .orderBy(col("qfp"), col("doc_id"))))
      val cells = staged.groupBy(col("source"), col("stage"))
        .agg(count(lit(1)).as("n_docs"), sum(col("qfp")).as("sum_qfp"))
        .withColumn("avg_quality",
          col("sum_qfp").cast("double") / 1e9
            / col("n_docs").cast("double"))
      cells.withColumn("curriculum_rank",
          row_number().over(Window.orderBy(col("avg_quality").desc,
            col("source"), col("stage"))))
        .select(col("curriculum_rank"), col("source"), col("stage"),
          col("n_docs"), col("avg_quality"))
        .orderBy(col("curriculum_rank"))
    }))

  /** DuckDB mirror of TextOps.tokens (TextQueries.toksSql twin). */
  private val toksSql =
    "list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0)"

  /** The q20 quality formula over `toks`/`text` (the corpusFlagshipSql
    * fragment verbatim — the cross-file duplication is the oracle string,
    * not engine code). */
  private def qualitySql(stopwords: Seq[String]) =
    s"""0.3 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
       |      + 0.3 * (CAST(len(list_filter(toks, t -> list_contains([${stopwords.map(w => s"'$w'").mkString(",")}], t))) AS DOUBLE) / greatest(len(toks), 1))
       |      + 0.2 * (CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / greatest(length(text), 1))
       |      + 0.2 * (1.0 - least((CAST(list_sum(list_transform(toks, w -> CAST(length(w) AS BIGINT))) AS DOUBLE) / greatest(len(toks), 1)) / 10.0, 1.0))""".stripMargin

  def oracles: Map[String, String] = Map(
    "q183_snapshot_diff" ->
      """WITH v1 AS (
        |  SELECT doc_id, source, md5(text) AS h1 FROM documents),
        |v2 AS (
        |  SELECT doc_id, source AS source2,
        |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2'
        |      ELSE text END) AS h2
        |  FROM documents WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT doc_id + 10000000, source, md5('v2new ' || text)
        |  FROM documents WHERE doc_id % 11 = 0)
        |SELECT coalesce(v1.source, v2.source2) AS source,
        |  CASE WHEN h1 IS NULL THEN 'added'
        |    WHEN h2 IS NULL THEN 'removed'
        |    WHEN h1 <> h2 THEN 'changed'
        |    ELSE 'unchanged' END AS status,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM v1 FULL OUTER JOIN v2 USING (doc_id)
        |GROUP BY 1, 2 ORDER BY source, status""".stripMargin,
    "q184_curriculum_order" ->
      s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS toks
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, source,
         |    CAST(floor((${qualitySql(TextOps.langStopwords.toMap.apply("en"))}) * 1e9) AS BIGINT) AS qfp
         |  FROM t),
         |staged AS (
         |  SELECT source, qfp,
         |    ntile(4) OVER (PARTITION BY source ORDER BY qfp, doc_id)
         |      AS stage
         |  FROM scored),
         |cells AS (
         |  SELECT source, stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(qfp) AS DOUBLE) / 1e9 / COUNT(*) AS avg_quality
         |  FROM staged GROUP BY source, stage)
         |SELECT CAST(row_number() OVER (ORDER BY avg_quality DESC,
         |    source, stage) AS INTEGER) AS curriculum_rank,
         |  source, stage, n_docs, avg_quality
         |FROM cells ORDER BY curriculum_rank""".stripMargin)
}
