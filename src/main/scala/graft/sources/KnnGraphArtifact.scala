package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.vector.VectorOps

/** MATERIALIZED kNN-graph artifact — the write-once/read-many production
  * shape of q220's refined neighbor graph, completing the [[DedupClosure]] /
  * [[EmbedArtifact]] boundary for the neighborhood-graph family.
  *
  * The reference builds its vector KB once and every retrieval/
  * disambiguation call queries the persisted copy
  * (/root/reference/dev.ipynb cell 91 ≈L4600 — the LanceDB table is the
  * materialized neighbor-candidate source; cells 84-88 consume neighbor
  * candidates for disambiguation-by-similarity). The engine's q220 gate
  * deliberately rebuilds the graph in-plan (self-contained oracle plans,
  * the cache-hygiene discipline) — which SCALE_r15 priced at 251 s per run
  * at ×100, the suite's largest decade row, paid PER CONSUMER. In
  * production the graph — warm-start cells, random-bridge reach, two
  * NN-descent rounds — is built ONCE per corpus snapshot and persisted
  * BUCKETED BY u, so every consumer (SemDeDup pruning, link prediction,
  * label-noise votes) joins neighbors with no exchange on the artifact
  * side and pays an artifact READ, not a graph build. This object is that
  * boundary:
  *
  *  - [[stages]] — q220's exact build ladder (shared code, not a copy:
  *    q220 calls this, so the gate pins the artifact's values too);
  *  - [[graph]] — the final refined graph (u, v, cos): each vector's top-3
  *    neighbors after two descent rounds, cosines kept;
  *  - [[materialize]] / [[read]] — write-once via
  *    [[Artifacts.materializeBucketed]], keyed by
  *    [[Artifacts.sourceFingerprint]] over the SOURCE-FILE METADATA backing
  *    the embeddings (driver-side FS listing, zero Spark jobs to locate on
  *    re-read — the q146/q147 staleness contract).
  */
object KnnGraphArtifact {

  /** Neighbors kept per vector — q220's dial. */
  val K = 3

  /** Attach exact cosines to a candidate edge table (u, v). */
  def score(e: DataFrame, cand: DataFrame): DataFrame = cand
    .join(e.select(col("vec_id").as("u"), col("embedding").as("eu")),
      Seq("u"))
    .join(e.select(col("vec_id").as("v"), col("embedding").as("ev")),
      Seq("v"))
    .withColumn("cos", VectorOps.cosine(col("eu"), col("ev")))

  /** Per-u top-K by (cos desc, v asc) — the shared total order that makes
    * per-round recall monotone (see q220's scaladoc). */
  def topK(scored: DataFrame): DataFrame = scored
    .withColumn("rn", row_number().over(Window.partitionBy(col("u"))
      .orderBy(col("cos").desc, col("v").asc)))
    .filter(col("rn") <= K).select(col("u"), col("v"), col("cos"))

  /** One NN-descent round over a SCORED graph: candidates = G ∪ G⁻¹ ∪
    * (G∘G); carried edges keep their cosine (deterministic on the same
    * doubles), only genuinely new pairs (anti-join) pay the embedding
    * joins — at ×100 the embedding side is shuffle-sized, so every avoided
    * scoring pass is a corpus-scale exchange saved. */
  def descend(e: DataFrame, scored: DataFrame): DataFrame = {
    val g = scored.select(col("u"), col("v"))
    val fresh = g.select(col("v").as("u"), col("u").as("v"))
      .unionByName(g.select(col("u"), col("v").as("mid"))
        .join(g.select(col("u").as("mid"), col("v").as("w")), Seq("mid"))
        .select(col("u"), col("w").as("v"))
        .filter(col("u") =!= col("v")))
      .distinct()
      .join(g, Seq("u", "v"), "left_anti")
    topK(scored.unionByName(
      score(e, fresh).select(col("u"), col("v"), col("cos"))))
  }

  /** q220's build ladder over `e` (vec_id, embedding; callers pass an
    * eagerly materialized frame — it feeds the cell assignment and every
    * scoring join). Returns (sc0, refined, refined2), each (u, v, cos):
    * sc0 = the scored warm-start graph (within-ivf2-cell top-3 ∪ 3
    * deterministic random-bucket bridges per vector), refined/refined2 =
    * after one/two NN-descent rounds. Work is O(N·64) warm start +
    * O(N·~48) candidates per round at ANY corpus size (k ∝ N cells pin
    * cell size, bucket size is pinned at ~8). */
  def stages(e: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val n = e.count()
    val nBuckets = math.max(n / 8L, 1L) // ~8 mates per bucket
    val k = math.min(n, math.max(8L, math.ceil(n / 64.0).toLong)).toInt
    val c2 = math.max(2L, math.ceil(math.sqrt(k.toDouble)).toLong).toInt
    val withCell = e
      .join(VectorOps.ivf2Assign(e, k, c2), Seq("vec_id"))
    val cellCand = withCell
      .select(col("cluster"), col("vec_id").as("u"))
      .join(withCell.select(col("cluster"), col("vec_id").as("v")),
        Seq("cluster"))
      .filter(col("u") =!= col("v")).select(col("u"), col("v"))
    val rb = e.select(col("vec_id"),
      pmod(graft.text.TextOps.tokenHash60(col("vec_id").cast("string")),
        lit(nBuckets)).as("rb"))
    val rndEdges = rb.select(col("rb"), col("vec_id").as("u"))
      .join(rb.select(col("rb"), col("vec_id").as("v")), Seq("rb"))
      .filter(col("u") =!= col("v"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("u"))
        .orderBy(col("v").asc)))
      .filter(col("rn") <= 3).select(col("u"), col("v"))
    val g0 = topK(score(e, cellCand)).select(col("u"), col("v"))
      .unionByName(rndEdges).distinct()
      .localCheckpoint() // reused: the sc0 scoring pass + rev/nbr sets
    // every g0 edge scored ONCE; init and round 1 both read this table
    val sc0 = score(e, g0).select(col("u"), col("v"), col("cos"))
      .localCheckpoint()
    val refined = descend(e, sc0)
      .localCheckpoint() // feeds round 2's three subtrees (+ q220's flag join)
    val refined2 = descend(e, refined)
    (sc0, refined, refined2)
  }

  /** The persisted graph plan: refined2 — (u, v, cos), K rows per u. */
  def graph(e: DataFrame): DataFrame = stages(e)._3

  /** Fingerprinted artifact name — same staleness contract as
    * [[DedupClosure.tableName]] (shared [[Artifacts]] machinery). */
  def tableName(embs: DataFrame, dir: String): String =
    s"graft_knn_graph_${Artifacts.sourceFingerprint(embs, dir, "vec_id")}"

  /** Write-once materialization bucketed by u. The build pays q220's graph
    * ladder once per corpus snapshot; every consumer read after that is a
    * bucketed scan. Returns the table name. */
  def materialize(spark: SparkSession, embs: DataFrame, dir: String,
                  buckets: Int = 8): String =
    Artifacts.materializeBucketed(spark, tableName(embs, dir), "u",
      buckets)(graph(embs.select(col("vec_id"), col("embedding"))
      .localCheckpoint()))

  /** The artifact as a DataFrame (u, v, cos), building it on first use. */
  def read(spark: SparkSession, embs: DataFrame, dir: String): DataFrame =
    spark.table(materialize(spark, embs, dir))
}
