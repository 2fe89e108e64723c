package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.vector.VectorOps

/** MATERIALIZED hash-embedding artifact — the write-once/read-many
  * production shape of q148's (vec_id → embedding) table, completing the
  * [[DedupClosure]] boundary for the vector family.
  *
  * The reference persists its vector KB as a columnar table and every
  * retrieval call scans the persisted copy, never re-embedding
  * (/root/reference/dev.ipynb cell 91 ≈L4600 — the LanceDB table is built
  * once from the entity descriptions, then queried); the engine's q149/q150
  * oracle queries deliberately recompute q148's embed inside the plan (each
  * q-entry is a self-contained plan, the cache-hygiene discipline). In
  * production the embed runs ONCE per corpus snapshot — it is the corpus's
  * dominant token-stream shuffle — and is persisted BUCKETED BY vec_id so
  * every consumer equi-joining on vec_id (label joins, metadata enrich,
  * incremental upserts) runs with no exchange on the artifact side, while
  * ANN consumers simply skip the embed stage. This object is that boundary:
  *
  *  - [[embed]] — q148's plan: [[VectorOps.hashEmbed]] (64-dim hashed
  *    tf-idf, exact int64 fixed-point arithmetic) renamed to the
  *    `embeddings`-table shape (vec_id, embedding array<double>);
  *  - [[materialize]] — write-once via [[Artifacts.materializeBucketed]],
  *    keyed by [[Artifacts.sourceFingerprint]] over the SOURCE-FILE
  *    METADATA backing `docs` (driver-side FS listing — zero Spark jobs to
  *    locate the artifact on re-read, the q146/q147 staleness contract);
  *  - [[read]] — the artifact as a DataFrame, building it only if absent.
  */
object EmbedArtifact {

  /** Hashed-embedding dimension — matches q148/q149/q150 so the artifact
    * is value-identical to their in-plan embed stage (hash-gated). */
  val Dim = 64

  /** q148's embed plan over `docs` (doc_id, text), in the `embeddings`
    * table's (vec_id, embedding) shape. */
  def embed(docs: DataFrame): DataFrame =
    VectorOps.hashEmbed(docs, "doc_id", "text", Dim)
      .select(col("doc_id").as("vec_id"), col("embedding"))

  /** Fingerprinted artifact name — same staleness contract as
    * [[DedupClosure.tableName]] (shared [[Artifacts]] machinery). */
  def tableName(docs: DataFrame, dir: String): String =
    s"graft_hash_embed_${Artifacts.sourceFingerprint(docs, dir, "doc_id")}"

  /** Write-once materialization bucketed by vec_id. Returns the table
    * name. `buckets` follows [[Bucketing]]'s sizing rule. */
  def materialize(spark: SparkSession, docs: DataFrame, dir: String,
                  buckets: Int = 8): String =
    Artifacts.materializeBucketed(spark, tableName(docs, dir), "vec_id",
      buckets)(embed(docs))

  /** The artifact as a DataFrame (vec_id, embedding), building it on first
    * use — every subsequent consumer pays a driver-side file listing plus
    * a bucketed (exchange-free on this side) read. */
  def read(spark: SparkSession, docs: DataFrame, dir: String): DataFrame =
    spark.table(materialize(spark, docs, dir))

  /** FROZEN (token, idf) table of the snapshot — ITS OWN fingerprinted,
    * write-once artifact (r16 advice: the first r16 form re-derived idf
    * from the full v1 corpus on EVERY maintenance call — a corpus-scale
    * tokenize plus two aggregate shuffles hiding inside the "delta-sized"
    * path; persisting the statistics the featurizer was frozen WITH makes
    * maintenance compute genuinely delta-proportional). Bucketed by token
    * — the key the delta's tf stream joins on. */
  def idfTableName(docs: DataFrame, dir: String): String =
    s"${tableName(docs, dir)}_idf"

  /** Write-once idf materialization (one corpus-scale derivation, at v1
    * build time or first maintenance — never per delta). */
  def materializeIdf(spark: SparkSession, docs: DataFrame, dir: String,
                     buckets: Int = 8): String =
    Artifacts.materializeBucketed(spark, idfTableName(docs, dir), "token",
      buckets)(VectorOps.hashEmbedIdf(
      docs.select(col("doc_id"), col("text")), "doc_id", "text"))

  /** The frozen idf artifact as a DataFrame (token, idf), building it on
    * first use. */
  def readIdf(spark: SparkSession, docs: DataFrame, dir: String): DataFrame =
    spark.table(materializeIdf(spark, docs, dir))

  /** DELTA-LAYOUT CDC maintenance of the embed artifact (the
    * [[DedupClosure.maintainCdcDelta]] shape for the vector family) under
    * the FROZEN-MODEL contract: the delta's documents are embedded with
    * the SNAPSHOT's (token, idf) statistics
    * ([[VectorOps.hashEmbedLongWithIdf]]) — in production the featurizer
    * is trained once per snapshot; re-deriving idf from the grown corpus
    * would silently change EVERY persisted vector (tf-idf weights are
    * corpus-statistics-dependent) and invalidate every downstream ANN
    * index. Under the frozen model a survivor's vector never changes, so
    * the maintenance writes are delta-sized: the added docs' vectors and
    * a tombstone list; [[readDelta]] composes v2 merge-on-read. Unseen
    * delta vocabulary carries weight 0 (the frozen-featurizer OOV rule,
    * see hashEmbedLongWithIdf). The idf statistics come from the
    * PERSISTED [[readIdf]] artifact, so a maintenance call's compute is
    * the delta tokenize + a delta-tf × idf-artifact join — nothing
    * corpus-scale (r16 advice executed). */
  def maintainCdcDelta(spark: SparkSession, v1docs: DataFrame, dir: String,
                       added: DataFrame, removed: DataFrame, tag: String,
                       buckets: Int = 8): (String, String) = {
    val idf = readIdf(spark, v1docs, dir)
    val embD = Artifacts.rematerializeBucketed(spark,
      s"${tableName(v1docs, dir)}_${tag}_demb", "vec_id", buckets)(
      VectorOps.hashEmbedLongWithIdf(added, "doc_id", "text", Dim, idf)
        .groupBy(col("doc_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("val")))),
          e => e.getField("val")).as("embedding"))
        .select(col("doc_id").as("vec_id"), col("embedding")))
    val tomb = Artifacts.rematerializeBucketed(spark,
      s"${tableName(v1docs, dir)}_${tag}_tomb", "vec_id", 1)(
      removed.select(col("doc_id").as("vec_id")))
    (embD, tomb)
  }

  /** Composed v2 embeddings over the delta layout (merge-on-read): v1
    * artifact minus tombstones union the delta vectors. */
  def readDelta(spark: SparkSession, v1docs: DataFrame, dir: String,
                tag: String): DataFrame =
    read(spark, v1docs, dir)
      .join(spark.table(s"${tableName(v1docs, dir)}_${tag}_tomb"),
        Seq("vec_id"), "left_anti")
      .unionByName(spark.table(s"${tableName(v1docs, dir)}_${tag}_demb"))
}
