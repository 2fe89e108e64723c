package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) candidate generation — the reference's hybrid
  * full-text fuzzy search surface (tantivy via spacy-lancedb-linker,
  * /root/reference/dev.ipynb cells 70-72): a misspelled mention must still
  * find its alias candidates; exact-surface matching alone returns nothing
  * for "Mossack Fonseka" vs "Mossack Fonseca".
  *
  * Scale design: NEVER an all-pairs levenshtein. Character-bigram BLOCKING:
  * each probe reaches the alias index only through its `blockK` RAREST
  * bigrams (rarity measured on the alias side; ties broken by bigram asc, so
  * key selection is deterministic and oracle-reproducible). Per-probe
  * candidate count is bounded by its rarest buckets' sizes instead of
  * |aliases|, and the exact `levenshtein` verify runs on candidates only —
  * after a length pre-filter (edit distance is bounded below by the length
  * difference). Blocking is approximate-recall by construction, like the
  * reference's tantivy fuzzy index: a pair is found iff it shares one of the
  * probe's selected rare bigrams (FuzzySpec pins the recall behavior).
  */
object FuzzyMatch {

  /** Deduplicated character bigrams of `c`: "abc" → ["ab","bc"]; empty below
    * length 2. The sequence bound is GUARDED — `sequence(1, len-1)` would
    * descend for len < 2 (Spark auto-negates the step). */
  def bigrams(c: Column): Column =
    when(length(c) >= 2,
      array_distinct(transform(sequence(lit(1), length(c) - 1),
        i => c.substr(i, lit(2)))))
      .otherwise(array().cast("array<string>"))

  /** Fuzzy candidates: for each distinct probe token, the aliases within
    * `maxDist` edits, top `topK` per probe by (distance asc, alias asc).
    *
    * @param probes  DataFrame with a string column `token` (deduplicated here)
    * @param aliases DataFrame with a string column `alias` (deduplicated here)
    * @return (token, alias, dist, rn)
    */
  def fuzzyCandidates(probes: DataFrame, aliases: DataFrame,
                      maxDist: Int, blockK: Int, topK: Int): DataFrame = {
    val aliasBg = aliases.select(col("alias")).distinct()
      .select(col("alias"), explode(bigrams(col("alias"))).as("bg"))
    // Bigram document frequency over the alias index — bounded by the alias
    // vocabulary's bigram inventory, tiny relative to the corpus → broadcast.
    val bgFreq = broadcast(aliasBg.groupBy(col("bg")).agg(count(lit(1)).as("freq")))
    val probeBg = probes.select(col("token")).distinct()
      .select(col("token"), explode(bigrams(col("token"))).as("bg"))
    // Rarest-K present bigrams per probe. Restricting to bigrams PRESENT in
    // the index loses nothing: an absent bigram can't produce a join match.
    val keys = probeBg.join(bgFreq, Seq("bg"))
      .withColumn("krn", row_number().over(
        Window.partitionBy(col("token")).orderBy(col("freq").asc, col("bg").asc)))
      .filter(col("krn") <= blockK)
      .select(col("token"), col("bg"))
    val cand = keys.join(aliasBg, Seq("bg"))
      .select(col("token"), col("alias")).distinct()
    cand
      .filter(abs(length(col("token")) - length(col("alias"))) <= maxDist)
      .withColumn("dist", levenshtein(col("token"), col("alias")))
      .filter(col("dist") <= maxDist)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("token")).orderBy(col("dist").asc, col("alias").asc)))
      .filter(col("rn") <= topK)
      .select(col("token"), col("alias"), col("dist"), col("rn"))
  }
}
