package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Integer-only fixed-point natural log: `iln1e9(n) ≈ ln(n)·1e9` for BIGINT
  * `n ∈ [1, 2^62)`, computed with NOTHING but 64-bit integer multiply /
  * shift / compare — no libm call on either engine, so the cross-engine
  * value is identical BY CONSTRUCTION rather than by the ≤1-ulp faithful-
  * rounding argument the `floor(ln(x)·1e9)` quantization rested on. This
  * closes the documented q114/q117 caveat (see the ULP-caveat comment at
  * the q114 site): at web-scale vocabularies (10⁸+ distinct ratios) the
  * libm form expects a handful of cross-engine floor flips; this form
  * expects exactly zero, at any scale, on any libm.
  *
  * Algorithm (both engines run the very same integer recurrence):
  *   1. normalize: one conditional halve (n ≥ 2^61 — at most one in the
  *      domain), then a 6-step CLZ-style doubling cascade (shift by
  *      32/16/8/4/2/1 while m < 2^(61−s)) brings `m` into [2^60, 2^61),
  *      tracking the power-of-two exponent `e` (n = m·2^e exactly, up to
  *      the one documented truncation bit for n ≥ 2^61). The cascade
  *      reaches the same unique fixed point as a naive 63-step
  *      double/halve loop (equivalence pinned in IntLnSpec's values) at
  *      a ninth of the per-row fold cost.
  *   2. 30 bit-extraction steps of log2's fraction: square `m` (the int128
  *      product is decomposed into int64 halves via
  *      m = a·2^31 + b ⇒ ⌊m²/2^60⌋ = 4a² + ⌊(ab + ⌊b²/2^32⌋)/2^28⌋,
  *      an exact nested-floor identity), emit one fraction bit per step.
  *   3. combine: ln(n)·1e9 = (e+60+f)·log2→ln, via the split constant
  *      C = ⌊ln2·1e9·2^30⌋ = Chi·2^30 + Clo so every partial product stays
  *      below 2^63 (`thi·Chi + ⌊(f·Chi + thi·Clo + ⌊f·Clo/2^30⌋)/2^30⌋`).
  *
  * Accuracy: |iln1e9(n) − ln(n)·1e9| < 2 for all n in domain (validated
  * exhaustively in IntLnSpec against Math.log) — the VALUE is a new,
  * deterministic definition, not a bit-reproduction of floor(libm·1e9).
  * Queries use the difference form `iln1e9(A) − iln1e9(B)` for
  * ln(A/B)·1e9.
  *
  * Spark side: one `aggregate` higher-order fold per stage — a single
  * fixed-size expression evaluated iteratively at runtime (no 63-fold
  * expression-tree blowup, no UDF). DuckDB side ([[iln1e9Sql]]): the same
  * recurrence as `list_reduce` folds with the (m, e) / (m, f) state packed
  * into one HUGEINT (the engine-internal width differs; every VALUE in the
  * recurrence fits int64 and is identical on both sides).
  */
object IntLn {

  private val Q60 = 1152921504606846976L // 2^60
  private val Q61 = 2305843009213693952L // 2^61
  private val Chi = 693147180L           // ⌊ln2·1e9⌋   = C div 2^30
  private val Clo = 601236697L           // C − Chi·2^30, C = ⌊ln2·1e9·2^30⌋

  /** Per-shift doubling constants for the CLZ cascade: 2^s and the
    * threshold 2^(61−s), selected by the fold element. */
  private def shiftConst(s: Column, f: Int => Long): Column =
    Seq(32, 16, 8, 4, 2).foldLeft(lit(f(1))) { (acc, k) =>
      when(s === lit(k.toLong), lit(f(k))).otherwise(acc)
    }

  /** `≈ ln(n)·1e9` as BIGINT; `n` must be integral in [1, 2^62). */
  def iln1e9(n: Column): Column = {
    val n0 = n.cast("long")
    val init = when(n0 >= lit(Q61),
        struct(shiftright(n0, 1).as("m"), lit(1L).as("e")))
      .otherwise(struct(n0.as("m"), lit(0L).as("e")))
    val norm = aggregate(
      array(lit(32L), lit(16L), lit(8L), lit(4L), lit(2L), lit(1L)),
      init,
      (acc, s) => {
        val m = acc.getField("m")
        val e = acc.getField("e")
        val lo = m < shiftConst(s, k => 1L << (61 - k))
        struct(
          when(lo, m * shiftConst(s, k => 1L << k)).otherwise(m).as("m"),
          when(lo, e - s).otherwise(e).as("e"))
      })
    val frac = aggregate(
      sequence(lit(1), lit(30)),
      struct(norm.getField("m").as("m"), lit(0L).as("f")),
      (acc, _) => {
        val m = acc.getField("m")
        val f = acc.getField("f")
        val a = shiftright(m, 31)
        val b = m.bitwiseAND(lit(0x7FFFFFFFL))
        // s = ⌊m²/2^60⌋ in pure int64 (identity in the scaladoc)
        val s = a * a * lit(4L) +
          shiftright(a * b + shiftright(b * b, 32), 28)
        val bit = s >= lit(Q61)
        struct(
          when(bit, shiftright(s, 1)).otherwise(s).as("m"),
          (f * lit(2L) + when(bit, lit(1L)).otherwise(lit(0L))).as("f"))
      })
    val thi = norm.getField("e") + lit(60L)
    val f = frac.getField("f")
    thi * lit(Chi) +
      shiftright(f * lit(Chi) + thi * lit(Clo) + shiftright(f * lit(Clo), 30), 30)
  }

  /** DuckDB twin of [[iln1e9]]: the same integer recurrence as two
    * `list_reduce` folds (state packed into a HUGEINT; DuckDB's int128
    * lets the fraction step square `m` directly — the VALUES match the
    * Spark decomposition exactly by the nested-floor identity). `n` is a
    * SQL expression producing the same integral value. */
  def iln1e9Sql(n: String): String = {
    // norm state: acc = m·256 + (e+64);  e ∈ [-60, 1] ⇒ e+64 ∈ [4, 65].
    // One pre-halve (n ≥ 2^61) in the init, then the 6-step CLZ doubling
    // cascade over shift list [32,16,8,4,2,1] — thresholds are 2^(61−s),
    // multipliers 2^s, mirroring the Spark shiftConst cascade exactly.
    val norm =
      s"""list_reduce(
         |  list_prepend(
         |    CASE WHEN CAST(($n) AS HUGEINT) >= $Q61
         |      THEN (CAST(($n) AS HUGEINT) // 2)*256 + 65
         |      ELSE CAST(($n) AS HUGEINT)*256 + 64 END,
         |    [CAST(32 AS HUGEINT), 16, 8, 4, 2, 1]),
         |  (acc, x) -> CASE WHEN acc // 256 <
         |      CASE x WHEN 32 THEN 536870912 WHEN 16 THEN 35184372088832
         |        WHEN 8 THEN 9007199254740992 WHEN 4 THEN 144115188075855872
         |        WHEN 2 THEN 576460752303423488 ELSE $Q60 END
         |    THEN ((acc // 256) * CASE x WHEN 32 THEN 4294967296
         |        WHEN 16 THEN 65536 WHEN 8 THEN 256 WHEN 4 THEN 16
         |        WHEN 2 THEN 4 ELSE 2 END)*256 + acc % 256 - x
         |    ELSE acc END)""".stripMargin
    // frac state: acc = m·2^31 + f;  m ∈ [2^60, 2^61), f < 2^30
    def frac(normExpr: String) =
      s"""list_reduce(
         |  list_prepend(($normExpr // 256)*2147483648,
         |    list_transform(range(30), x -> CAST(0 AS HUGEINT))),
         |  (acc, x) -> CASE
         |    WHEN (acc // 2147483648)*(acc // 2147483648)
         |         >= 2658455991569831745807614120560689152 THEN
         |      ((acc // 2147483648)*(acc // 2147483648) // $Q61)*2147483648
         |        + (acc % 2147483648)*2 + 1
         |    ELSE
         |      ((acc // 2147483648)*(acc // 2147483648) // $Q60)*2147483648
         |        + (acc % 2147483648)*2 END)""".stripMargin
    val thi = s"(($norm) % 256 - 4)" // (e+64) − 64 + 60 = e + 60
    val f = s"((${frac(norm)}) % 2147483648)"
    s"""CAST($thi*$Chi +
       |  ($f*$Chi + $thi*$Clo + ($f*$Clo // 1073741824)) // 1073741824
       |  AS BIGINT)""".stripMargin
  }
}
