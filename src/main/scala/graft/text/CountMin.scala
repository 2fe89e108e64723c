package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005) — the mergeable
  * frequency sketch a 100 TB token stream wants when exact per-token counts
  * are too wide to keep: d independent hash rows × w counters, every
  * occurrence increments one counter per row, and a token's estimate is the
  * MIN across its d counters (always ≥ the true count; over-estimate bounded
  * by ε = e/w of the stream length with probability 1 − e^−d).
  *
  * Relational form — the sketch IS an aggregation:
  *  - build: one explode(d) over the token stream → groupBy (r, idx) count.
  *    Counters are plain sums, so the build is MAP-SIDE COMBINABLE and the
  *    sketch is MERGEABLE by construction: per-source (or per-partition, or
  *    per-day) sketches sum counter-wise into the global sketch — the same
  *    distributivity contract q134's linear-counting gate establishes, here
  *    proven in-plan by building per-source and summing.
  *  - estimate: the (Heaps-law) vocabulary probes the d·w-bounded counter
  *    table — a broadcast join at ANY corpus size (the sketch never grows).
  *
  * Determinism: row hashes are the portable 60-bit md5 hash salted with the
  * row index; counters are exact int64; min/top-k are integer orderings —
  * the whole estimate table hash-matches DuckDB.
  */
object CountMin {

  /** Portable salted row hash: h_r(token) = md5_60("r|token") mod w. */
  def rowHash(r: Column, token: Column, w: Int): Column =
    pmod(conv(substring(md5(concat(r.cast("string"), lit("|"), token)), 1, 15),
      16, 10).cast("long"), lit(w.toLong))

  /** Sketch build over a (token) occurrence stream: (r, idx, c) with
    * d·w rows at most. r17: the input is fanned out
    * ([[graft.sources.Layout.fanOutScan]]) — the d salted md5 hashes per
    * occurrence ran at scan width (single-task on the narrow driver files,
    * 5.3 s measured in one q156 run); a no-op on wide scans. */
  def sketch(tokens: DataFrame, d: Int, w: Int): DataFrame =
    graft.sources.Layout.fanOutScan(tokens, col("token"))
      .select(col("token"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col("r"), rowHash(col("r"), col("token"), w).as("idx"))
      .groupBy(col("r"), col("idx")).agg(count(lit(1)).as("c"))

  /** Counter-wise merge of sketches carrying extra group columns
    * (e.g. per-source sketches → the global sketch). */
  def merge(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("r"), col("idx")).agg(sum(col("c")).as("c"))

  /** CMS JOIN-SIZE estimate (Cormode & Muthukrishnan 2005 §4.2): the size
    * of A ⋈ B on a shared key is estimated as
    * min_r Σ_idx cmsA[r][idx] · cmsB[r][idx] — the inner product of the
    * two sides' counter rows, an always-≥ overestimate whose error is
    * bounded by ε·|A|·|B| (ε = e/w) with probability 1 − e^−d.
    *
    * This is planner-grade cardinality estimation at 100 TB: each side is
    * sketched INDEPENDENTLY (map-side combinable, d·w-bounded, mergeable
    * across partitions/days/sources), and the estimate itself costs a
    * (r, idx) equi-join of two ≤ d·w-row tables — neither input is ever
    * scanned, let alone joined. Counters absent from one side contribute a
    * zero product, so the inner equi-join IS the full inner product. */
  def joinSizeEstimate(skA: DataFrame, skB: DataFrame): DataFrame =
    skA.as("a").join(skB.as("b"), Seq("r", "idx"))
      .groupBy(col("r"))
      .agg(sum(col("a.c") * col("b.c")).as("dot"))
      .agg(min(col("dot")).as("est"))

  /** CMS estimate per vocabulary token: min over the d probed counters.
    * The sketch is d·w-bounded → broadcast regardless of corpus size. */
  def estimates(vocab: DataFrame, sk: DataFrame, d: Int, w: Int): DataFrame =
    vocab
      .select(col("token"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col("token"), col("r"), rowHash(col("r"), col("token"), w).as("idx"))
      .join(broadcast(sk), Seq("r", "idx"))
      .groupBy(col("token")).agg(min(col("c")).as("est"))
}
