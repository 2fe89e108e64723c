package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PORTABLE BLOOM FILTER as a relational artifact — the membership
  * structure a 100 TB decontamination pass wants when the benchmark's
  * n-gram set outgrows an exact broadcast set (q105's documented
  * "benchmark-sized" bound): k salted hashes set bits in an m-bit space,
  * probes are flagged when ALL k of their bits are set. False positives
  * only — a flagged doc may be clean (rate ≈ (1 − e^(−kn/m))^k), a clean
  * verdict is exact — so bloom decontam is the cheap FIRST pass and the
  * exact check runs only on the flagged survivors.
  *
  * Relational form: the filter IS the distinct set-bit table (≤ min(k·n, m)
  * rows of a single long) — m-bounded, so it broadcasts at ANY corpus size,
  * which is the whole point: the bench side stops growing the moment it
  * saturates m, where the exact q105 set grows forever.
  *
  * Spark ships engine-private Bloom machinery (`bloom_filter_agg` /
  * `might_contain`, pinned by RuntimeFilterSpec); this one is PORTABLE —
  * salted 60-bit md5 bit positions, pure integer arithmetic — so the whole
  * filter (bits, probes, per-doc counts) hash-matches a DuckDB oracle,
  * making it the oracle-gated member of the membership-sketch family the
  * way q134 is for distinct-counting and q151 for frequency.
  */
object Bloom {

  /** Bit position j of `item`: md5_60("j|item") mod m. */
  def pos(j: Column, item: Column, m: Int): Column =
    pmod(conv(substring(md5(concat(j.cast("string"), lit("|"), item)), 1, 15),
      16, 10).cast("long"), lit(m.toLong))

  /** The filter: distinct set-bit table over `items` (one column `pos`). */
  def bits(items: DataFrame, itemCol: String, k: Int, m: Int): DataFrame =
    items
      .select(col(itemCol).as("item"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .select(pos(col("j"), col("item"), m).as("pos"))
      .distinct()

  /** Keep the probe rows whose item might be in the filter (all k bits
    * set). `probe` rows must be distinct on their columns; colliding bit
    * positions are counted per-j (each of the k rows matches the unique
    * bit-table row independently), so saturation never under-counts. */
  def mightContain(probe: DataFrame, itemCol: String, bitTable: DataFrame,
                   k: Int, m: Int): DataFrame = {
    val keyCols = probe.columns.toSeq
    probe
      .withColumn("j", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("pos", pos(col("j"), col(itemCol), m))
      .join(broadcast(bitTable), Seq("pos"))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__set"))
      .filter(col("__set") === k)
      .drop("__set")
  }
}
