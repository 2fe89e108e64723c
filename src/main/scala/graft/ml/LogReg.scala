package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IN-ENGINE deterministic logistic-regression training — the quality /
  * domain classifier stage of a training-data pipeline (fastText-style
  * linear scorer over handcrafted features), expressed so the SAME bits
  * come out of Spark and DuckDB on any cluster layout:
  *
  *  - Full-batch gradient descent: each iteration is ONE aggregate over the
  *    (cached) feature table; the model (d+1 doubles) rides the closure as
  *    literals — the standard tiny-model/big-data shape (cf. the
  *    deterministic k-means in [[graft.vector.VectorOps]]).
  *  - Gradient sums are FIXED-POINT: each row contributes
  *    floor(((s−y)·f_j)·1e9) as a long, so the cross-partition sum is
  *    integer — no partition-order-dependent double addition. |row| ≤ 1e9,
  *    so int64 holds exact sums for up to ~9.2e9 rows (document the bound
  *    at the call site — same discipline as BM25's idf / q114's ln note).
  *  - The link is the FAST SIGMOID σ̂(z) = 0.5 + z / (2·(1+|z|)), not
  *    exp-based σ: +, ·, /, abs are correctly-rounded IEEE ops in both
  *    engines, so σ̂ is bit-portable where exp() differs at ULP level
  *    between libm implementations (the q114 ln caveat, designed out).
  *  - z and the weight update keep a FIXED association order (foldLeft) so
  *    the double arithmetic is the same expression tree on both engines.
  */
object LogReg {

  /** Fast-sigmoid link — bit-portable across engines (no exp). */
  def fastSigmoid(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** z = ((0 + w0·f0) + w1·f1) + … — fixed left association. */
  def margin(weights: Array[Double], fCols: Seq[Column]): Column =
    weights.zip(fCols).foldLeft(lit(0.0): Column) {
      case (acc, (wj, fj)) => acc + lit(wj) * fj
    }

  /** Train on `feats` (must contain `yCol` ∈ {0.0, 1.0} and `fCols`;
    * caller caches it — the loop scans it `iters` times). Returns the
    * weight vector, one per feature column, bias included if the caller
    * passed a constant-1 feature. Update rule (mirrored literally in the
    * DuckDB oracle): w_j ← w_j − lr · ((G_j / 1e9) / n), G_j the exact
    * fixed-point gradient sum. */
  def train(feats: DataFrame, fCols: Seq[String], yCol: String,
            iters: Int, lr: Double): Array[Double] = {
    val n = feats.count().toDouble
    var w = Array.fill(fCols.length)(0.0)
    for (_ <- 0 until iters) {
      val s = fastSigmoid(margin(w, fCols.map(col)))
      val aggCols = fCols.map(fc =>
        sum(floor(((s - col(yCol)) * col(fc)) * lit(1e9)).cast("long"))
          .as(s"g_$fc"))
      val row = feats.agg(aggCols.head, aggCols.tail: _*).first()
      w = w.indices.map { j =>
        w(j) - lr * ((row.getLong(j).toDouble / 1e9) / n)
      }.toArray
    }
    w
  }
}
