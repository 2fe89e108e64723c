package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion — the reference's ann_linker is a HYBRID search:
  * vector similarity + full-text candidates fused into one ranked list per
  * mention (spacy-lancedb-linker, /root/reference/dev.ipynb cells 70-83:
  * lancedb ANN + tantivy text search feed one candidate set). The individual
  * signals exist here as prior×cosine (q34), fuzzy edit-distance (q46) and
  * BM25 (q66); this operator supplies the fusion step.
  *
  * Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09): a candidate's
  * fused score is Σ_s 1/(k + rank_s) over the signals that returned it —
  * rank-based, so incomparable score scales (cosine vs edit distance vs BM25)
  * need no calibration, and k=60 damps any single signal's top rank.
  *
  * Scale design: pure window arithmetic over the already-bounded per-signal
  * top-k lists — candidate keys are unioned (distinct), each signal is
  * LEFT-joined back by (key, candidate), and the fused rank is one window.
  * No all-pairs step; the fused table is at most Σ_s |signal_s| rows.
  *
  * Determinism (DuckDB hash gate): the RRF sum is a FIXED left-to-right
  * chain of 1.0/(k + rn) terms — identical IEEE operand order on both
  * engines — and ranking tie-breaks on the candidate id.
  */
object HybridRetrieval {

  /** Fuse ranked candidate lists. Every signal DataFrame must carry
    * `keyCols`, `candCol`, and an integer rank column `rn` (1-based, dense
    * within key — the per-signal top-k shape produced by a ranking window).
    *
    * @return keyCols ++ (candCol, rrf double, rn int) — top `topK` fused
    *         candidates per key, ranked by (rrf desc, candidate asc).
    */
  def rrfFuse(signals: Seq[DataFrame], keyCols: Seq[String], candCol: String,
              k: Int = 60, topK: Int = 3): DataFrame = {
    require(signals.nonEmpty, "rrfFuse needs at least one signal")
    val keyAndCand = keyCols :+ candCol
    val keyed = signals.zipWithIndex.map { case (df, i) =>
      df.select(keyAndCand.map(col) :+ col("rn").as(s"rn_$i"): _*)
    }
    // union-distinct of candidate keys, then one left join per signal: a
    // candidate missing from a signal contributes 0 to the sum
    val cands = keyed.map(_.select(keyAndCand.map(col): _*))
      .reduce(_ union _).distinct()
    val joined = keyed.foldLeft(cands)((acc, sig) => acc.join(sig, keyAndCand, "left"))
    val rrf = keyed.indices
      .map(i => coalesce(lit(1.0) / (lit(k) + col(s"rn_$i")), lit(0.0)))
      .reduce(_ + _) // left-to-right: fixed IEEE summation order
    joined.withColumn("rrf", rrf)
      .withColumn("rn", row_number().over(
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("rrf").desc, col(candCol).asc)))
      .filter(col("rn") <= topK)
      .select(keyAndCand.map(col) :+ col("rrf") :+ col("rn"): _*)
  }
}
