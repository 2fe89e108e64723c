package graft.text

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.vector.VectorOps

/** Entity-linking operators (SURVEY.md §2 V2/V3/V5 + W3): the reference's
  * gazetteer NER (`EntityRuler`, dev.ipynb cells 112-116), alias-prior
  * candidate generation (`get_alias_candidates`) and context-embedding
  * disambiguation (`kb.disambiguate`, dev.ipynb cells 73-88), re-expressed as
  * relational plans.
  *
  * Scale design:
  *  - the gazetteer is produced by aggregation and capped to `maxCandidates`
  *    per alias (candidate generation, not a full index scan) — it stays
  *    small enough to BROADCAST, so mention matching is a broadcast hash join
  *    against the token stream: no shuffle of the 100 TB document side.
  *  - disambiguation joins candidates to an embedding table on ids (shuffle
  *    on the small candidate set only) and scores with per-row fold math
  *    inside codegen; the argmax is one window per mention.
  */
object EntityLinking {

  /** Weighted alias gazetteer from (alias, entity) observations:
    * P(entity | alias) = cnt / total, capped to the top `maxCandidates`
    * entities per alias (by count desc, entity asc — deterministic).
    * Output: (alias, entity, prior). */
  def gazetteer(obs: DataFrame, aliasCol: String, entityCol: String,
                maxCandidates: Int): DataFrame = {
    val counted = obs.groupBy(col(aliasCol).as("alias"), col(entityCol).as("entity"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("alias"))
    counted
      .withColumn("total", sum(col("cnt")).over(w))
      .withColumn("rn", row_number().over(
        w.orderBy(col("cnt").desc, col("entity").asc)))
      .filter(col("rn") <= maxCandidates)
      .select(col("alias"), col("entity"),
        (col("cnt").cast("double") / col("total")).as("prior"))
  }

  /** Token stream with positions: (doc_id, pos, token). */
  def tokenStream(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "token")))

  /** V5 — gazetteer mention matching: broadcast-join the alias table against
    * the token stream. Output: (doc_id, pos, token, entity, prior) — one row
    * per candidate per mention. */
  def mentionCandidates(docs: DataFrame, gaz: DataFrame): DataFrame =
    tokenStream(docs, "doc_id", "text")
      .join(broadcast(gaz), col("token") === col("alias"))
      .select(col("doc_id"), col("pos"), col("token"), col("entity"), col("prior"))

  /** V3/W3 — disambiguation: score = prior × cosine(context embedding,
    * entity embedding), argmax per mention (ties → lower entity id).
    * `docVecs`: (doc_id, ctx_emb); `entVecs`: (entity, ent_emb).
    * Output: (doc_id, pos, token, entity, prior, score). */
  def disambiguate(candidates: DataFrame, docVecs: DataFrame,
                   entVecs: DataFrame): DataFrame = {
    val scored = candidates
      .join(docVecs, Seq("doc_id"))
      .join(entVecs, Seq("entity"))
      .withColumn("score",
        col("prior") * VectorOps.cosine(col("ctx_emb"), col("ent_emb")))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"), col("pos"))
          .orderBy(col("score").desc, col("entity").asc)))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("pos"), col("token"), col("entity"),
        col("prior"), col("score"))
  }
}
