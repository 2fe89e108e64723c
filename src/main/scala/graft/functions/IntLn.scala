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
  *   1. normalize: 63 conditional double/halve steps bring `m` into
  *      [2^60, 2^61), tracking the power-of-two exponent `e`
  *      (n = m·2^e exactly, up to the one documented truncation bit for
  *      n ≥ 2^61).
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

  /** `≈ ln(n)·1e9` as BIGINT; `n` must be integral in [1, 2^62). */
  def iln1e9(n: Column): Column = {
    val norm = aggregate(
      sequence(lit(1), lit(63)),
      struct(n.cast("long").as("m"), lit(0L).as("e")),
      (acc, _) => {
        val m = acc.getField("m")
        val e = acc.getField("e")
        when(m >= lit(Q61), struct(shiftright(m, 1).as("m"), (e + lit(1L)).as("e")))
          .when(m < lit(Q60), struct((m * lit(2L)).as("m"), (e - lit(1L)).as("e")))
          .otherwise(struct(m.as("m"), e.as("e")))
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
    // norm state: acc = m·256 + (e+64);  e ∈ [-60, 2] ⇒ e+64 ∈ [4, 66]
    val norm =
      s"""list_reduce(
         |  list_prepend(CAST(($n) AS HUGEINT)*256 + 64,
         |    list_transform(range(63), x -> CAST(0 AS HUGEINT))),
         |  (acc, x) -> CASE
         |    WHEN acc // 256 >= $Q61 THEN ((acc // 256) // 2)*256 + acc % 256 + 1
         |    WHEN acc // 256 < $Q60 THEN ((acc // 256) * 2)*256 + acc % 256 - 1
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
