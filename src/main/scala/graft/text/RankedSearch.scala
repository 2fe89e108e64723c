package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked full-text candidate search — the SCORED half of the
  * reference's tantivy surface (spacy-lancedb-linker's hybrid search,
  * /root/reference/dev.ipynb cells 70-72 ≈L4069-4129): a multi-token mention
  * queries the corpus and gets back relevance-RANKED candidates, not just
  * filtered ones. q46's fuzzy/edit-distance search covers the typo half;
  * this covers the ranking half.
  *
  * Scale design — classic inverted-index retrieval, never all-pairs:
  *   - one shuffle builds the postings list (doc, token) → tf;
  *   - token document frequencies are vocabulary-sized → broadcast;
  *   - candidate GENERATION goes through each mention's `blockK` RAREST
  *     tokens only (df asc, token asc — deterministic), the champion-list
  *     pruning tantivy/Lucene's WAND family formalizes: per-mention fan-out
  *     is bounded by the rare token's df, not by corpus size;
  *   - candidate SCORING then uses ALL terms the mention shares with the
  *     candidate (absent terms contribute 0 to BM25 anyway), so the score
  *     is exact for every emitted candidate — blocking only bounds recall
  *     (a candidate must share one of the mention's rare tokens).
  *
  * Cross-engine determinism (the DuckDB hash gate): the BM25+ idf is the
  * ln of the INTEGER ratio (2N+2)/(2df+1), quantized with the integer-only
  * fixed-point ln ([[graft.functions.IntLn]]) — no libm on either engine,
  * so the idf is identical by construction at ANY vocabulary scale (the
  * former floor(libm ln·1e9) form rested on a ≤1-ulp faithful-rounding
  * argument); all remaining arithmetic is IEEE
  * mul/div on identical operands in identical order. Per-(mention, doc)
  * term contributions are summed FIXED-POINT (floor(c·1e9) as BIGINT) so
  * the sum is shuffle-order-independent, and ranking sorts the exact
  * fixed-point score with doc-id tie-break.
  */
object RankedSearch {

  /** Top-`topK` BM25-ranked documents per mention surface.
    *
    * @param docs     corpus with `idCol` (long) and `textCol` (string)
    * @param mentions DataFrame with a string column `surface`
    * @param broadcastQueries broadcast the per-mention block keys into the
    *   postings probe (default): right whenever the query set is bounded —
    *   the normal retrieval shape, and 2× faster than the shuffle join it
    *   replaces. Disable for corpus-scale probe sets (every n-gram of a
    *   100 TB corpus), where a mention-sized broadcast would not fit the
    *   driver and the shuffle join is the only correct plan.
    * @param championN cap each token's posting list to its top-N docs by
    *   (tf desc, doc_id asc) for candidate GENERATION (Lucene/WAND champion
    *   lists); 0 (default) = uncapped. With a cap, per-mention fan-out is
    *   ≤ blockK·championN at any corpus size — the knob that keeps the
    *   candidate join linear under corpus growth. Scoring stays exact for
    *   every emitted candidate; only recall is bounded.
    * @return (surface, doc_id, score double, rn int)
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               mentions: DataFrame,
               k1: Double = 1.2, b: Double = 0.75,
               blockK: Int = 1, topK: Int = 5,
               broadcastQueries: Boolean = true,
               checkpoint: Boolean = true,
               championN: Int = 0): DataFrame = {
    // Postings: (doc, token) → tf, plus per-doc length dl. One shuffle —
    // and CACHED for the call: the postings list is referenced four times
    // (doc lengths, df stats, candidate generation, scoring) and an
    // uncached reference re-scans and re-aggregates the corpus each time.
    // This is the inverted-index BUILD — released before returning via the
    // materialize-then-unpersist tail (cache-leak-free, CacheHygieneSpec).
    // `checkpoint = false` skips both the cache and the eager checkpoint
    // and returns the raw logical plan — for PlanSpec only (the eager
    // localCheckpoint otherwise hides the plan behind an RDD scan).
    val postingsPlan = docs
      .select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    if (!checkpoint)
      return ranked(postingsPlan, mentions, k1, b, blockK, topK,
        broadcastQueries, championN)
    val postings = postingsPlan.cache()
    try {
      ranked(postings, mentions, k1, b, blockK, topK, broadcastQueries,
          championN)
        .localCheckpoint()
    // finally: a failed checkpoint (lost executor, cancelled job) must still
    // release the postings cache, or every failed call leaks an entry
    } finally postings.unpersist()
  }

  /** The BM25 scoring plan over a prebuilt postings list — the body shared
    * by [[bm25TopK]]'s materializing and plan-only modes. */
  private def ranked(postings: DataFrame, mentions: DataFrame,
                     k1: Double, b: Double, blockK: Int, topK: Int,
                     broadcastQueries: Boolean, championN: Int): DataFrame = {
    val docLen = postings.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("dl"))
    // Corpus constants as a 1-row broadcast scalar (same pattern as nvec).
    val stats = docLen.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    // Token stats with quantized BM25+ idf: vocabulary-sized → broadcast.
    // 1 + (N−df+0.5)/(df+0.5) = (2N+2)/(2df+1), so the idf is the ln of an
    // INTEGER ratio and the quantization runs on the integer-only fixed-
    // point ln (functions.IntLn) — no libm on either engine, closing the
    // former ≤1-ulp cross-engine caveat at any vocabulary scale.
    val tokenIdf = broadcast(
      postings.groupBy(col("token")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          (graft.functions.IntLn.iln1e9(col("n_docs") * 2 + 2)
            - graft.functions.IntLn.iln1e9(col("df") * 2 + 1))
            .cast("double") / lit(1e9))
        .select(col("token"), col("df"), col("idf")))

    // Distinct (mention, term) pairs; qtf is ignored (standard for short
    // queries — each distinct query term contributes once).
    val mentionTerms = mentions.select(col("surface")).distinct()
      .select(col("surface"), explode(TextOps.tokens(col("surface"))).as("token"))
      .distinct()
    // Champion-list blocking: each mention probes the index through its
    // blockK rarest present tokens only.
    val blockKeys = mentionTerms.join(tokenIdf.select(col("token"), col("df")), Seq("token"))
      .withColumn("krn", row_number().over(
        Window.partitionBy(col("surface")).orderBy(col("df").asc, col("token").asc)))
      .filter(col("krn") <= blockK)
      .select(col("surface"), col("token"))
    // Non-broadcast path: SHUFFLE_HASH, not sort-merge — both sides
    // co-partition on token either way, but hashing the per-partition
    // probe shard skips the sort of the (much larger) postings side.
    // Memory is bounded by ONE partition of block keys, which shrinks as
    // shuffle partitions grow — scale-safe where the driver-sized
    // broadcast is not.
    val keyedProbe =
      if (broadcastQueries) broadcast(blockKeys)
      else blockKeys.hint("shuffle_hash")
    // POSTINGS-SIDE champion list (championN > 0): candidate generation
    // probes each token's top-championN docs by tf only — the other half
    // of the WAND-family pruning. Query-side blocking (blockK) bounds how
    // many tokens probe; WITHOUT a postings cap each probe still fans out
    // to the token's FULL posting list, which grows linearly with the
    // corpus — the measured ×30 superlinearity of the uncapped path
    // (SCALE r10: 12.8 s → 112 s while output stayed linear). With the cap
    // candidates per mention are ≤ blockK·championN at ANY corpus size.
    // Scoring below is unchanged — exact BM25 over all shared terms of
    // every emitted candidate; the cap only bounds recall, and the oracle
    // encodes the identical (tf desc, doc_id asc) truncation.
    // The per-token top-N itself is built in TWO phases so a stopword's
    // corpus-sized posting list never lands in one window partition:
    // per-(token, salt) top-N first — bounded fan-in of 64·championN rows
    // per token — then the global top-N over the survivors.
    val candPostings =
      if (championN <= 0) postings
      else {
        val salted = postings
          .withColumn("salt", pmod(col("doc_id"), lit(64)).cast("int"))
          .withColumn("srn", row_number().over(
            Window.partitionBy(col("token"), col("salt"))
              .orderBy(col("tf").desc, col("doc_id").asc)))
          .filter(col("srn") <= championN)
        salted
          .withColumn("crn", row_number().over(
            Window.partitionBy(col("token"))
              .orderBy(col("tf").desc, col("doc_id").asc)))
          .filter(col("crn") <= championN)
          .select(col("token"), col("doc_id"))
      }
    val candidates = keyedProbe.join(candPostings, Seq("token"))
      .select(col("surface"), col("doc_id")).distinct()

    // Exact BM25 over every shared (mention term, candidate doc) pair.
    val scored = candidates
      .join(mentionTerms, Seq("surface"))
      .join(postings, Seq("doc_id", "token"))
      .join(docLen, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .join(tokenIdf.select(col("token"), col("idf")), Seq("token"))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      // Literal arithmetic stays UNFOLDED ((k1 + 1), (1 - b)) so the oracle
      // mirrors the exact IEEE op sequence instead of a pre-rounded literal.
      .withColumn("contrib",
        col("idf") * ((col("tf").cast("double") * (lit(k1) + lit(1.0))) /
          (col("tf").cast("double") + lit(k1) *
            ((lit(1.0) - lit(b)) + lit(b) * col("dl").cast("double") / col("avgdl")))))
      .groupBy(col("surface"), col("doc_id"))
      .agg(sum(floor(col("contrib") * lit(1e9)).cast("long")).as("score_fp"))

    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("surface"))
          .orderBy(col("score_fp").desc, col("doc_id").asc)))
      .filter(col("rn") <= topK)
      .select(col("surface"), col("doc_id"),
        (col("score_fp").cast("double") / lit(1e9)).as("score"), col("rn"))
  }

  /** TF-IDF sparse-vector COSINE similarity join over a document corpus:
    * all pairs with cosine ≥ `minCos`, computed through an inverted index —
    * the doc↔doc twin of [[bm25TopK]]'s query↔doc retrieval, and the
    * sparse-vector member of the similarity-join family (MinHash q23 /
    * SimHash q24 / embedding-LSH q27 are the other blockings).
    *
    * Scale design — never all-pairs:
    *   - tokens present in more than `maxDfFrac` of documents are dropped
    *     BEFORE the self-join (they are near-zero-idf noise and the whole
    *     quadratic cost: a token shared by f docs fans out f² pair rows);
    *   - the remaining postings self-join on token, so a pair is scored
    *     only if it shares ≥1 surviving token (the inverted-index blocking
    *     semantic) and costs Σ_token df², not |docs|²;
    *   - weights/norms are per-doc precomputed; the pair aggregation sums
    *     FIXED-POINT (floor(w_a·w_b·1e9) longs) so the dot product is
    *     shuffle-order-independent. Magnitude bound (same dial as the HITS
    *     1e15→1e12 comment in GraphOps): each term is ≤ (tf·idf)²·1e9 and a
    *     LongType sum wraps silently past ~9.2e18, so a posting list is
    *     safe while Σ_token (tf_a·idf·tf_b·idf)² < 9e9 — comfortably true
    *     for natural-language tf counts (tf·idf ≲ 10³ ⇒ term ≲ 1e12·1e9/1e9
    *     = 1e12, allowing ~9M shared tokens per pair), but a degenerate
    *     corpus (one token repeated 10⁶× in two docs) would need the 1e9
    *     scale lowered to 1e6. DuckDB's oracle sums into HUGEINT and cannot
    *     wrap, so an overflow here shows up as a hash mismatch, not silent
    *     agreement.
    *
    * Cross-engine determinism: integer-only fixed-point idf as in
    * [[bm25TopK]] (here iln(N) − iln(df)), IEEE mul/div in pinned order, sqrt is correctly
    * rounded everywhere — the result hash-compares against DuckDB.
    *
    * @return (da, db, cosine) with da < db
    */
  def tfidfCosinePairs(docs: DataFrame, idCol: String, textCol: String,
                       maxDfFrac: Double = 0.1,
                       minCos: Double = 0.3): DataFrame = {
    val (out, postings) = tfidfPairsPlan(docs, idCol, textCol, maxDfFrac, minCos)
    // materialize-then-unpersist: the postings cache (referenced by the df
    // stats, weights and both join sides) is released before returning
    try out.localCheckpoint()
    finally postings.unpersist()
  }

  /** Plan-only form of [[tfidfCosinePairs]]: returns (result plan, the
    * cached postings the caller must unpersist after materializing). Split
    * out so PlanSpec can assert on the join shape BEFORE the checkpoint
    * erases it. */
  private[graft] def tfidfPairsPlan(docs: DataFrame, idCol: String,
                                    textCol: String, maxDfFrac: Double,
                                    minCos: Double): (DataFrame, DataFrame) = {
    val postings = docs
      .select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .cache()
    val nDocs = broadcast(
      postings.select(col("doc_id")).distinct()
        .agg(count(lit(1)).as("n_docs")))
    // df prune + quantized idf; vocabulary-sized → broadcast to the probe
    val tokenIdf = broadcast(
      postings.groupBy(col("token")).agg(count(lit(1)).as("df"))
        .crossJoin(nDocs)
        .filter(col("df").cast("double") <=
          col("n_docs").cast("double") * lit(maxDfFrac))
        .withColumn("idf",
          // ln(N/df) via the integer-only fixed-point ln (see bm25TopK)
          (graft.functions.IntLn.iln1e9(col("n_docs"))
            - graft.functions.IntLn.iln1e9(col("df")))
            .cast("double") / lit(1e9))
        .select(col("token"), col("idf")))
    val weighted = postings.join(tokenIdf, Seq("token"))
      .select(col("doc_id"), col("token"),
        (col("tf").cast("double") * col("idf")).as("w"))
    // int64 bound (same discipline as hitsDeterministic / q114's ln note):
    // each term is floor(w²·1e9) with w = tf·idf, so the per-doc sum fits
    // int64 while Σ_t (tf·idf)² ≤ 9.2e9 — i.e. the doc's tf-idf L2 norm is
    // ≤ ~9.6e4. idf ≤ ln(nDocs) ≈ 21 even at 1e9 docs, so the bound only
    // strains when a single doc repeats a RARE token ~10⁴+ times. Spark's
    // LongType wraps silently past it while DuckDB promotes to HUGEINT —
    // beyond the bound the engines diverge rather than error, which is why
    // the bound is stated here rather than assumed.
    val norms = weighted.groupBy(col("doc_id"))
      .agg(sqrt(sum(floor(col("w") * col("w") * lit(1e9)).cast("long"))
        .cast("double") / lit(1e9)).as("norm"))
    val dots = weighted.as("a")
      .join(weighted.as("b"),
        col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg((sum(floor(col("a.w") * col("b.w") * lit(1e9)).cast("long"))
        .cast("double") / lit(1e9)).as("dot"))
    val out = dots
      .join(norms.select(col("doc_id").as("da"), col("norm").as("na")), Seq("da"))
      .join(norms.select(col("doc_id").as("db"), col("norm").as("nb")), Seq("db"))
      .select(col("da"), col("db"),
        (col("dot") / (col("na") * col("nb"))).as("cosine"))
      .filter(col("cosine") >= minCos)
    (out, postings)
  }
}
