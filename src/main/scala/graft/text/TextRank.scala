package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TextRank keyphrase extraction (SURVEY.md §2 V4/W2): the reference runs
  * pytextrank — noun-chunk candidates → word co-occurrence graph → PageRank →
  * per-doc top-k (/root/reference/dagster_icij/assets.py:133,
  * src/analysis.py:10-23). Here: token co-occurrence within a ±`window`
  * positional window → per-doc PageRank → top-k.
  *
  * ALL docs' graphs are ranked in ONE iterated DataFrame plan keyed by
  * (doc_id, token) — no per-doc driver loop, so a billion-doc corpus runs as
  * `iterations` shuffle rounds regardless of doc count.
  *
  * Determinism: per-node contribution sums are FIXED-POINT — each
  * contribution is floored to 1e-15 resolution and summed as BIGINT, which is
  * exact and partition-order-independent, then rescaled to double. (A double
  * sum would drift with shuffle order; a DECIMAL cast rounds differently in
  * Spark [HALF_UP] vs DuckDB, breaking oracle parity at the 16th digit.)
  */
object TextRank {

  /** Teleport and damping are INDEPENDENT double literals (0.15, 0.85), never
    * derived as `1.0 - d`: DuckDB parses numeric literals as DECIMAL, so
    * `1.0 - 0.85` is exact there but binary here — the oracle twin uses
    * `CAST(0.15 AS DOUBLE)` and both sides must mean the same bits. */
  val damping = 0.85
  val teleport = 0.15

  /** Distinct undirected co-occurrence edges (both directions) between
    * tokens within ±window positions, loops excluded: (doc_id, src, dst).
    *
    * Built as one EQUI-join per offset on (doc_id, pos+o) — never a doc-wide
    * self-join with a positional filter, which enumerates O(len²) candidate
    * pairs per doc before filtering (~100× the surviving edges). The
    * equi-join emits exactly the window·len forward pairs, then symmetrizes. */
  def coocEdges(tokens: DataFrame, window: Int): DataFrame = {
    val t = tokens.select(col("doc_id"), col("pos"), col("token"))
    val fwd = (1 to window).map { o =>
      t.select(col("doc_id"), (col("pos") + o).as("pos"), col("token").as("src"))
        .join(t.select(col("doc_id"), col("pos"), col("token").as("dst")),
          Seq("doc_id", "pos"))
        .select(col("doc_id"), col("src"), col("dst"))
    }.reduce(_ unionByName _)
    fwd.unionByName(
        fwd.select(col("doc_id"), col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Per-doc PageRank over the co-occurrence graph, `iterations` rounds of
    * r(v) = (1-d)/n + d·Σ_{u→v} r(u)/outdeg(u).
    * Output: (doc_id, token, rank). */
  def pageRank(tokens: DataFrame, window: Int, iterations: Int): DataFrame = {
    // Loop invariants are CACHED: without this every iteration's reference
    // re-derives the tokenize→distinct→self-join subtree, so the final plan
    // contains it `iterations`× (GraphX does the same for its edge RDD).
    // Columnar cache (not localCheckpoint) for the loop — the invariants are
    // scanned 4×/iteration and InMemoryRelation reads beat row-RDD reads —
    // then released before returning (see the materialize-then-unpersist
    // tail, same discipline as GraphOps.pageRankDeterministic).
    val nodes = tokens.select(col("doc_id"), col("token")).distinct().cache()
    val n = nodes.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).cache()
    // edges⋈outdeg is loop-invariant — attach odeg once so each iteration
    // runs ONE ranks⋈edges equi-join instead of a 3-table join (same
    // division and fixed-point floor: value-identical, oracle untouched)
    val e0 = coocEdges(tokens, window)
    val edges = e0.join(
        e0.groupBy(col("doc_id"), col("src")).agg(count(lit(1)).as("odeg")),
        Seq("doc_id", "src"))
      .cache()

    try {
      var ranks = nodes.join(n, Seq("doc_id"))
        .select(col("doc_id"), col("token"), (lit(1.0) / col("n")).as("rank"))
      for (_ <- 1 to iterations) {
        val contribs = ranks.as("r")
          .join(edges.as("e"), col("r.doc_id") === col("e.doc_id") &&
            col("r.token") === col("e.src"))
          .select(col("e.doc_id").as("doc_id"), col("e.dst").as("token"),
            floor((col("r.rank") / col("e.odeg")) * lit(1e15)).as("contrib"))
          .groupBy(col("doc_id"), col("token"))
          .agg((sum(col("contrib")).cast("double") / lit(1e15)).as("inflow"))
        ranks = nodes.join(n, Seq("doc_id"))
          .join(contribs, Seq("doc_id", "token"), "left")
          .select(col("doc_id"), col("token"),
            (lit(teleport) / col("n") +
              lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
      }
      // Materialize the final ranks (small: one row per distinct doc-token)
      // so the invariant caches can be dropped without the caller's later
      // action re-deriving the whole loop — a library call must leave
      // NOTHING in the session cache registry (un-owned entries accumulate
      // over a long-lived session and alias by logical plan across
      // unrelated queries).
      ranks.localCheckpoint()
    } finally {
      nodes.unpersist(); n.unpersist(); edges.unpersist()
    }
  }

  /** [[pageRank]]'s per-group LOCAL twin: identical fixed-point arithmetic,
    * computed inside one `flatMapGroups` pass per document.
    *
    * The per-doc graph is tiny (vocab ≤ doc length, edges ≤ 2·window·len),
    * so iterating it is genuine per-group imperative logic — the declarative
    * loop pays `iterations` shuffle rounds over the whole corpus for graphs
    * that never span a partition. Here the token stream shuffles ONCE (the
    * groupByKey on doc_id) and all rounds run in-memory per group; on a
    * billion-doc corpus that is 1 shuffle vs 3·iterations, and doc_id keys
    * shard it perfectly. Memory bound: O(len·window) per task, the same
    * transient the span generator already allocates; a pathological
    * single-document skew is one task, not a plan change.
    *
    * Value-identical by construction (law-pinned in TextRankSpec): same
    * edge set (±window, symmetrized, no loops, distinct), same
    * floor((rank/odeg)·1e15) long contributions, same exact long sums, same
    * teleport/n + damping·inflow recombination — every float op is the same
    * IEEE op in the same order as the DataFrame plan, so q35/q47/q36/q49
    * keep their DuckDB oracles untouched. */
  def pageRankLocal(tokens: DataFrame, window: Int, iterations: Int): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.select(col("doc_id").cast("long"), col("pos").cast("int"), col("token"))
      .as[(Long, Int, String)]
      .groupByKey(_._1)
      .flatMapGroups { (docId: Long, rows: Iterator[(Long, Int, String)]) =>
        import scala.collection.mutable
        val toks = rows.map(r => (r._2, r._3)).toArray
        val nodes = mutable.LinkedHashSet[String]()
        toks.foreach(t => nodes += t._2)
        val nD = nodes.size.toDouble
        // adjacency: src@p ↔ dst@(p+o), o ∈ [1, window], loops excluded —
        // the symmetrized distinct edge set coocEdges builds declaratively
        val byPos = mutable.HashMap[Int, mutable.ArrayBuffer[String]]()
        toks.foreach { case (p, t) =>
          byPos.getOrElseUpdate(p, mutable.ArrayBuffer[String]()) += t
        }
        val nbrs = mutable.HashMap[String, mutable.HashSet[String]]()
        for ((p, ts) <- byPos; o <- 1 to window; qs <- byPos.get(p + o);
             a <- ts; b <- qs if a != b) {
          nbrs.getOrElseUpdate(a, mutable.HashSet[String]()) += b
          nbrs.getOrElseUpdate(b, mutable.HashSet[String]()) += a
        }
        val rank = mutable.HashMap[String, Double]()
        nodes.foreach(t => rank(t) = 1.0 / nD)
        for (_ <- 1 to iterations) {
          val inflow = mutable.HashMap[String, Long]()
          for ((src, ds) <- nbrs) {
            // one floored contribution per src, fanned to its neighbors —
            // floor(double)→long is exactly Spark's FLOOR(DOUBLE) semantics
            val c = math.floor((rank(src) / ds.size.toDouble) * 1e15).toLong
            ds.foreach(d => inflow(d) = inflow.getOrElse(d, 0L) + c)
          }
          nodes.foreach { t =>
            rank(t) = teleport / nD +
              damping * (inflow.getOrElse(t, 0L).toDouble / 1e15)
          }
        }
        nodes.iterator.map(t => (docId, t, rank(t)))
      }
      .toDF("doc_id", "token", "rank")
  }

  /** Per-doc top-k tokens by rank (W1 window top-k; ties → token asc).
    * Output: (doc_id, token, rank, rn). */
  def topPhrases(tokens: DataFrame, window: Int, iterations: Int, k: Int): DataFrame =
    pageRankLocal(tokens, window, iterations)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("rank").desc, col("token").asc)))
      .filter(col("rn") <= k)

  /** V4 PHRASE form — the reference's `doc._.phrases` semantics
    * (/root/reference/src/analysis.py:14-15): multi-word spans ranked by
    * aggregating member-token TextRank scores, with occurrence counts, top-k
    * per doc (the reference caps at `[:30]`, analysis.py:11).
    *
    * For each distinct surface of 1..maxN tokens in a doc:
    *   phrase_rank = (Σ member-token rank) / n_tokens
    *   cnt         = occurrences of that surface in the doc
    * The rank sum is FIXED-POINT (floor to 1e-15 → BIGINT sum) like every
    * other float aggregation crossing a shuffle — partition-order-exact,
    * reproducible in DuckDB.
    *
    * Spans are rebuilt FROM the token stream
    * ([[EntityLinking.ngramSpansFromTokens]]) — the callers cache `tokens`
    * for the PageRank loop, and re-tokenizing the corpus for span
    * enumeration was the most expensive redundant work in the NLP suite.
    *
    * Output: (doc_id, surface, len, cnt, phrase_rank, rn). */
  def topPhraseSpans(tokens: DataFrame, maxN: Int,
                     window: Int, iterations: Int, k: Int): DataFrame = {
    val ranks = pageRankLocal(tokens, window, iterations)
    // Member ranks ride the TOKEN STREAM, not a per-doc vocabulary map: the
    // previous form joined a map_from_entries(all distinct tokens → rank)
    // row onto EVERY span row, so each span physically copied its doc's
    // whole vocabulary map through the join output — S spans × V entries of
    // per-row garbage per doc, the heap-churn signature behind the 3–6×
    // GC spikes the round-6 bench caught on this family. Here the rank is
    // attached per POSITION with one token-stream-sized equi-join, the doc
    // is folded once into a (pos, token, fp) array, and one generator emits
    // every span WITH its fixed-point member-rank sum — span rows carry
    // three scalars, and the only non-scalar allocation is one doc-length
    // array per doc row (which the span enumeration needed anyway). One
    // fewer shuffle too: the spans⋈rankMap join on doc_id is gone.
    // Value-identical: Σ floor(rank·1e15) over member positions is the same
    // long arithmetic the map lookup fold computed (duplicate member tokens
    // contribute identical floored ranks either way), so the oracle is
    // untouched.
    val fp = tokens.join(ranks, Seq("doc_id", "token"))
      .select(col("doc_id"), col("pos"), col("token"),
        floor(col("rank") * lit(1e15)).as("fp"))
    val docsW = fp.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("token"), col("fp"))))
        .as("wr"))
    val wr = col("wr")
    val spans = docsW
      .select(col("doc_id"), wr, explode(sequence(lit(1), lit(maxN))).as("len"))
      .select(col("doc_id"), col("len"),
        explode(when(size(wr) >= col("len"),
          transform(sequence(lit(1), size(wr) - col("len") + lit(1)),
            i => struct(
              concat_ws(" ",
                transform(slice(wr, i, col("len")), e => e("token"))).as("surface"),
              aggregate(slice(wr, i, col("len")), lit(0L),
                (acc, e) => acc + e("fp")).as("fpsum"))))
          .otherwise(array().cast("array<struct<surface:string,fpsum:bigint>>")))
          .as("sp"))
      .select(col("doc_id"), col("sp.surface").as("surface"), col("len"),
        col("sp.fpsum").as("fpsum"))
    spans.groupBy(col("doc_id"), col("surface"), col("len"))
      .agg(count(lit(1)).as("cnt"),
        // fpsum is a function of (doc_id, member tokens) — identical across
        // occurrences of a surface — so min() is pure plumbing, not a choice
        min(col("fpsum")).as("fpsum"))
      .withColumn("phrase_rank",
        (col("fpsum").cast("double") / lit(1e15)) / col("len"))
      .drop("fpsum")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("phrase_rank").desc, col("surface").asc)))
      .filter(col("rn") <= k)
  }
}
