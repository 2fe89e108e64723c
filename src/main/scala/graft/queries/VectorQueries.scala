package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.vector.VectorOps

/** Similarity-search queries over `embeddings` (SURVEY.md §2 V1-V3 + the
  * north-star ANN surface). Every query — including the LSH and IVF
  * approximate paths — has an EXACT DuckDB oracle because all similarity math
  * is a sequential double fold and all pseudo-randomness is integer
  * arithmetic (see [[graft.vector.VectorOps]]).
  */
object VectorQueries {

  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // V1/V2 — brute-force cosine kNN: 8 query vectors × full corpus, top-5.
    "q25_knn_bruteforce" -> ((s, d) => {
      val e = emb(s, d)
      VectorOps.knnBruteForce(e.filter(col("vec_id") < 8), e, 5)
        .orderBy(col("query_id"), col("rn"))
    }),

    // Embedding-cosine near-dup pairs — exact O(N²) baseline, computed with
    // the native codegen'd cosine (30× the HOF fold at sf0.1: 2.7s vs 83s).
    "q26_cosine_pairs" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      VectorOps.cosinePairs(emb(s, d), 0.35,
          (a, b) => call_function("cosine_sim", a, b))
        .orderBy(col("ia"), col("ib"))
    }),

    // Sign-LSH ANN: 8 hyperplanes → 256 buckets → candidates → exact cosine.
    "q27_lsh_pairs" -> ((s, d) =>
      VectorOps.lshNeighborPairs(emb(s, d), 8, 0.2)
        .orderBy(col("ia"), col("ib"))),

    // SAME semantics and SAME oracle as q27, but DECLARATIVE: the user
    // writes a join on the approx_cosine_join marker predicate and the
    // RewriteApproxCosineJoin optimizer rule (SparkSessionExtensions /
    // GraftRules.install) turns the quadratic marker join into the LSH
    // bucket equi-join + exact cosine verify — SURVEY §4's "custom
    // similarity-join strategy" tier, proven under the hash gate.
    "q74_approx_join_rule" -> ((s, d) => {
      graft.plans.GraftRules.install(s)
      val e = emb(s, d)
      val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
      a.join(b,
          call_function("approx_cosine_join",
            col("ea"), col("eb"), lit(0.2), lit(8)) && col("ia") < col("ib"))
        .select(col("ia"), col("ib"),
          call_function("cosine_sim", col("ea"), col("eb")).as("cosine"))
        .orderBy(col("ia"), col("ib"))
    }),

    // HOF-fold cross-check of the native expression on a vec_id<300 subset:
    // same math through `aggregate`/`zip_with`, bit-identical per element —
    // keeps the portable reference implementation in the correctness gate
    // without paying its 30× cost on the full corpus.
    "q38_cosine_hof" -> ((s, d) =>
      VectorOps.cosinePairs(emb(s, d).filter(col("vec_id") < 300), 0.35)
        .orderBy(col("ia"), col("ib"))),

    // IVF: label-cell centroids (decimal-exact means) → nearest-cell probe.
    "q28_ivf_knn" -> ((s, d) => {
      val e = emb(s, d)
      val cents = VectorOps.centroids(e, "label")
      VectorOps.ivfKnn(e.filter(col("vec_id") < 8), e, cents, "label", 3)
        .orderBy(col("query_id"), col("rn"))
    }),

    // IVF multi-probe: scan the 2 nearest cells per query — the standard
    // recall/cost dial (quantization-boundary neighbors come back without
    // ever scanning the corpus).
    "q54_ivf_multiprobe" -> ((s, d) => {
      val e = emb(s, d)
      val cents = VectorOps.centroids(e, "label")
      VectorOps.ivfKnn(e.filter(col("vec_id") < 8), e, cents, "label", 3, nprobe = 2)
        .orderBy(col("query_id"), col("rn"))
    }))

  /** DuckDB mirror of VectorOps.dot: sequential left-fold of per-element
    * double products (1-indexed lists). */
  private def dotSql(a: String, b: String) =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a)+1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"

  private def normSql(a: String) = s"sqrt(${dotSql(a, a)})"

  private def cosSql(a: String, b: String) =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"

  /** DuckDB mirror of VectorOps.l2Dist. */
  private def l2Sql(a: String, b: String) =
    s"sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len($a)+1), " +
      s"i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)))), (acc, x) -> acc + x))"

  /** DuckDB mirror of VectorOps.lshSignature (8 planes, 0-indexed dims). */
  private val sigSql =
    "array_to_string(list_transform(range(0, 8), p -> CASE WHEN " +
      "list_reduce(list_prepend(0.0, list_transform(range(1, len(embedding)+1), " +
      "i -> CAST(embedding[i] AS DOUBLE) * " +
      "((CAST((p * 73856093 + (i - 1) * 19349663) % 10007 AS DOUBLE) / 10007.0) * 2.0 - 1.0)" +
      ")), (acc, x) -> acc + x) >= 0 THEN '1' ELSE '0' END), '')"

  def oracles: Map[String, String] = Map(
    "q38_cosine_hof" ->
      s"""SELECT a.vec_id AS ia, b.vec_id AS ib,
         |       ${cosSql("a.embedding", "b.embedding")} AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE a.vec_id < 300 AND b.vec_id < 300
         |  AND ${cosSql("a.embedding", "b.embedding")} >= 0.35
         |ORDER BY ia, ib""".stripMargin,
    "q25_knn_bruteforce" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
         |           FROM embeddings WHERE vec_id < 8),
         |s AS (
         |  SELECT query_id, e.vec_id AS neighbor_id,
         |         ${cosSql("q_emb", "e.embedding")} AS cosine
         |  FROM q JOIN embeddings e ON e.vec_id <> query_id),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id ASC) AS rn
         |  FROM s)
         |SELECT query_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rn
         |FROM r WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin,
    "q26_cosine_pairs" ->
      s"""SELECT a.vec_id AS ia, b.vec_id AS ib,
         |       ${cosSql("a.embedding", "b.embedding")} AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.35
         |ORDER BY ia, ib""".stripMargin,
    "q27_lsh_pairs" ->
      s"""WITH sig AS (
         |  SELECT vec_id, embedding, $sigSql AS bucket FROM embeddings)
         |SELECT a.vec_id AS ia, b.vec_id AS ib,
         |       ${cosSql("a.embedding", "b.embedding")} AS cosine
         |FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.2
         |ORDER BY ia, ib""".stripMargin,
    // q74 = q27 through the optimizer-rule rewrite — same oracle verbatim.
    "q74_approx_join_rule" ->
      s"""WITH sig AS (
         |  SELECT vec_id, embedding, $sigSql AS bucket FROM embeddings)
         |SELECT a.vec_id AS ia, b.vec_id AS ib,
         |       ${cosSql("a.embedding", "b.embedding")} AS cosine
         |FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.2
         |ORDER BY ia, ib""".stripMargin,
    "q28_ivf_knn" -> ivfOracle(nprobe = 1),
    "q54_ivf_multiprobe" -> ivfOracle(nprobe = 2)
  )

  /** IVF oracle, nprobe-parameterized: q28 single-probe, q54 multi-probe. */
  private def ivfOracle(nprobe: Int): String =
      s"""WITH dims AS (
         |  SELECT label AS cell, i - 1 AS pos,
         |         CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
         |           / COUNT(*) AS mean
         |  FROM embeddings CROSS JOIN range(1, 65) t(i)
         |  GROUP BY label, i),
         |cents AS (
         |  SELECT cell, list(mean ORDER BY pos) AS centroid
         |  FROM dims GROUP BY cell),
         |q AS (SELECT vec_id AS query_id, embedding AS q_emb
         |      FROM embeddings WHERE vec_id < 8),
         |ad AS (
         |  SELECT query_id, q_emb, cell,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY ${l2Sql("q_emb", "centroid")} ASC, cell ASC) AS crn
         |  FROM q CROSS JOIN cents),
         |assigned AS (SELECT query_id, q_emb, cell FROM ad WHERE crn <= $nprobe),
         |probe AS (
         |  SELECT query_id, a.cell, e.vec_id AS neighbor_id,
         |         ${cosSql("q_emb", "e.embedding")} AS cosine
         |  FROM assigned a JOIN embeddings e
         |    ON e.label = a.cell AND e.vec_id <> a.query_id),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id ASC) AS rn
         |  FROM probe)
         |SELECT query_id, cell, neighbor_id, cosine, CAST(rn AS INTEGER) AS rn
         |FROM r WHERE rn <= 3 ORDER BY query_id, rn""".stripMargin
}
