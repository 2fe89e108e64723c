package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer INDUCTION — the training-pipeline stage the
  * engine's other text ops assume already happened (every real corpus run
  * trains or refreshes a tokenizer on the corpus it just cleaned). Classic
  * word-level BPE: the corpus compresses to a (word, freq) vocabulary,
  * words split to character symbols, and each round merges the globally
  * most frequent adjacent symbol pair.
  *
  * Determinism, pinned so an unrolled SQL twin reproduces every round:
  * - pair counts are integer sums of word frequencies;
  * - the winning pair is the total order (count DESC, left ASC, right ASC)
  *   — no hash-order or arrival-order tie-breaks;
  * - the merge applies GREEDY LEFT-TO-RIGHT, expressed as a left fold that
  *   replaces the accumulator's last element when it completes the pair.
  *   The fold IS the classic scan rule: after a merge the new last symbol
  *   is `left||right`, which can never equal `left` again (right is
  *   non-empty), so overlapping occurrences ("aaa" under a+a) merge
  *   exactly like the sequential algorithm ("aa","a").
  *
  * Scale shape: everything after [[wordTable]] runs on the VOCABULARY
  * (Heaps' law: ~N^0.7 distinct words, crucially not N), the corpus itself
  * is scanned exactly once for frequencies. Each round is one vocab-sized
  * pair-count shuffle plus a 1-row argmax broadcast back onto the vocab;
  * rounds never rescan documents. A 100 TB corpus trains on a few-GB word
  * table — which is why production BPE trainers do exactly this
  * compression first.
  */
object Bpe {

  /** (word, freq) vocabulary — the corpus's only full scan. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Character split: "abc" → ["a","b","c"]; 1-based substr keeps the
    * construction identical to the SQL twin's `word[i:i]`. */
  def charSyms(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** Adjacent symbol pairs of one round's vocabulary, frequency-weighted.
    * Single-symbol words contribute nothing — guarded explicitly, because
    * `sequence(1, 0)` counts DOWN (the TextOps.bigramsOf hazard).
    * Output: (lhs, rhs, pair_freq). */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("freq"),
        explode(when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("lhs"),
              element_at(col("syms"), i + 1).as("rhs"))))
          .otherwise(array().cast("array<struct<lhs:string,rhs:string>>"))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("freq")).as("pair_freq"))

  /** Greedy left-to-right merge of (lhs, rhs) in a symbol array — the fold
    * described in the class doc. `get` (0-based, null out of range) keeps
    * the empty-accumulator probe ANSI-safe; null comparisons collapse the
    * condition to false exactly like the SQL twin's NULL semantics. */
  private def mergeFold(syms: Column, lhs: Column, rhs: Column): Column =
    aggregate(syms, array().cast("array<string>"), (out, s) =>
      when(get(out, size(out) - 1) === lhs && s === rhs,
        concat(slice(out, lit(1), size(out) - 1), array(concat(lhs, rhs))))
        .otherwise(concat(out, array(s))))

  /** Train `rounds` merges. Returns (final vocabulary with merged `syms`,
    * merge table (merge_rank, lhs, rhs, pair_freq) — one row per round
    * that found a pair). Each round's winner rides a 1-row broadcast;
    * nothing is collected. An EXHAUSTED round (no adjacent pairs left —
    * every word a single symbol) is a no-op: the winner join is LEFT on
    * true, so a missing winner leaves `syms` untouched instead of wiping
    * the vocabulary, and contributes no merge row. */
  def learn(words: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    var vocab = words.withColumn("syms", charSyms(col("word")))
    var merges: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      val top = pairCounts(vocab)
        .orderBy(col("pair_freq").desc, col("lhs").asc, col("rhs").asc)
        .limit(1)
        .withColumn("merge_rank", lit(r))
      merges = Some(merges.map(_.unionByName(top)).getOrElse(top))
      vocab = vocab
        .join(broadcast(top.select(col("lhs").as("m_lhs"), col("rhs").as("m_rhs"))),
          lit(true), "left")
        .withColumn("syms", mergeFold(col("syms"), col("m_lhs"), col("m_rhs")))
        .drop("m_lhs", "m_rhs")
    }
    (vocab, merges.get.select(col("merge_rank"), col("lhs"), col("rhs"), col("pair_freq")))
  }
}
