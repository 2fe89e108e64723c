package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable HyperLogLog register sketch (Flajolet et al. 2007), the
  * cardinality member of the mergeable-sketch family ([[CountMin]] =
  * frequency, [[Bloom]] = membership, q134's linear counting = low-range
  * occupancy).
  *
  * Portability contract (the q134/q151 discipline): every stage is exact
  * integer arithmetic over the md5-derived 60-bit hash
  * ([[TextOps.tokenHash60]]), so a DuckDB oracle computes bit-identical
  * registers —
  *  - bucket  = low 8 bits of the hash (`h & 255`, m = 256 registers);
  *  - rank ρ  = leading-zero count of the remaining 52 bits + 1, computed
  *    WITHOUT floats as `53 - bitlength(v)` where bitlength = length of the
  *    minimal binary string (`bin()` is minimal-width in both Spark and
  *    DuckDB); v = 0 ⇒ ρ = 53 (all 52 bits zero);
  *  - merge   = register-wise MAX — associative/commutative/idempotent, so
  *    per-partition partial aggregation, per-source sketches, and
  *    cross-snapshot unions all combine exactly (law-tested in SketchSpec);
  *  - Z       = Σ 2^(−reg) held FIXED-POINT as Σ 2^(53−reg) (exact int64:
  *    ≤ 256·2^53 = 2^61), absent registers contributing 2^53 each;
  *  - the estimator α·m²/Z pays exactly ONE float division, correctly
  *    rounded on every IEEE-754 engine.
  *
  * At 100 TB the sketch is the point: 256 longs of state per group
  * regardless of cardinality, map-side combinable (the groupBy(MAX) plan
  * Spark compiles is partial-agg → exchange of ≤ m rows per group), and
  * re-mergeable across days/sources/snapshots without touching raw data.
  * The raw estimator is deliberately uncorrected: the low-fill regime
  * (n ≲ 2.5·m) belongs to linear counting — q134's operator.
  */
object Hll {

  /** Number of registers (fixed — the oracle mirrors it literally). */
  val m = 256

  /** 2^53 — the fixed-point scale of Z (the contribution of an empty
    * register, ρ = 0 ⇒ 2^(53-0)). */
  val zScale = 9007199254740992L

  /** Register index for a 60-bit hash: its low 8 bits. */
  def idx(h: Column): Column = h.bitwiseAND(lit(255L))

  /** Rank ρ for a 60-bit hash: leading-zero count of the remaining 52 bits
    * plus one, as `53 - bitlength(h >> 8)` (0 remainder ⇒ 53). */
  def rho(h: Column): Column = {
    val v = shiftright(h, 8)
    when(v === 0L, lit(53L)).otherwise(lit(53L) - length(bin(v)))
  }

  /** Per-group registers: (groupCols..., idx, reg) with reg = MAX ρ —
    * the canonical mergeable form (register tables for two corpora merge by
    * groupBy(idx).agg(max(reg))). `hashed` must carry a 60-bit hash column. */
  def registers(hashed: DataFrame, hCol: String, groupCols: String*): DataFrame =
    hashed
      .select(groupCols.map(col) :+ idx(col(hCol)).as("idx") :+
        rho(col(hCol)).as("rho"): _*)
      .groupBy(groupCols.map(col) :+ col("idx"): _*)
      .agg(max(col("rho")).as("reg"))

  /** Fixed-point Z from a register table aggregated per group: returns
    * (groupCols..., nonzero, z) where z = Σ 2^(53−reg) + (m − present)·2^53. */
  def zTable(regs: DataFrame, groupCols: String*): DataFrame =
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("nonzero"),
        sum(expr("shiftleft(cast(1 as bigint), cast(53 - reg as int))"))
          .as("zpart"))
      .select(groupCols.map(col) :+ col("nonzero") :+
        (col("zpart") + (lit(m.toLong) - col("nonzero")) * lit(zScale))
          .as("z"): _*)

  /** Raw HLL estimate α_m·m²·2^53 / z — one float division, mirrored
    * literally in the oracle (α_256 = 0.7213/(1 + 1.079/256)). */
  def estimate(z: Column): Column =
    (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))) *
      lit(65536.0) * lit(9007199254740992.0) / z.cast("double")
}
