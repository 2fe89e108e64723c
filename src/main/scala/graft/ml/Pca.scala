package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IN-ENGINE deterministic PCA (top principal component by fixed-iteration
  * power method) — the preprocessing stage SemDeDup-style pipelines run
  * before clustering/dedup (project embeddings onto their dominant
  * directions), expressed so the SAME bits come out of Spark and DuckDB on
  * any cluster layout (the [[LogReg]] discipline applied to second
  * moments):
  *
  *  - Moment sums are FIXED-POINT: each row contributes
  *    floor(x_i·x_j·1e9) (and floor(x_i·1e9) for the means) as a long, so
  *    the cross-partition sums are integer — no partition-order-dependent
  *    double addition. |x| ≤ 1 ⇒ |row term| ≤ 1e9 ⇒ int64 holds exact
  *    sums to ~9.2e9 rows (the LogReg bound, same documentation duty).
  *  - The covariance entry is PURE double arithmetic from int64 factors:
  *    (n·S_ij·1e9 − m_i·m_j) / (n·n·1e18) with every factor one
  *    exact-or-correctly-rounded long→double conversion and every op the
  *    identical IEEE sequence on both engines. Deliberately NOT widened
  *    through decimal/HUGEINT: DuckDB's HUGEINT→DOUBLE cast rounds its two
  *    64-bit halves separately (measured 1–3 ULP off), so an exact-integer
  *    numerator would BREAK cross-engine bit-identity — see [[covMatrix]].
  *  - Power iteration runs UN-normalized for a FIXED iteration count from
  *    the all-ones start vector: normalizing needs sqrt (libm, the q114
  *    caveat), while C^k·1 is pure +/· in a fixed fold order — both
  *    engines execute the same expression sequence, so the direction (and
  *    every projection) is bit-identical. The uniform scale factor λ^k is
  *    irrelevant to ordering/whitening consumers and documented in the
  *    query output contract.
  *  - Model state is BOUNDED driver state at any corpus size: d² moment
  *    longs collected once (d = 64 ⇒ 4096 longs — the LogReg "model = a
  *    few driver doubles" shape, not a data collect), iterations are
  *    driver-local arithmetic on a d×d array.
  */
object Pca {

  /** Exact fixed-point second-moment and mean sums of `embCol` (array of
    * d floats): returns (n, S, m) where S(i)(j) = Σ floor(x_i·x_j·1e9),
    * m(i) = Σ floor(x_i·1e9). ONE corpus pass for S (the double explode
    * is map-side combined: each partition emits ≤ d² partial rows), one
    * narrow pass for (n, m). */
  def momentSums(emb: DataFrame, embCol: String,
                 d: Int): (Long, Array[Array[Long]], Array[Long]) = {
    val x = emb.select(col(embCol).as("e"))
    val mom = x
      .select(posexplode(col("e")).as(Seq("i", "xi")), col("e"))
      .select(col("i"), col("xi"), posexplode(col("e")).as(Seq("j", "xj")))
      .groupBy(col("i"), col("j"))
      .agg(sum(floor(col("xi").cast("double") * col("xj").cast("double")
        * lit(1e9)).cast("long")).as("s"))
      .collect()
    val s = Array.ofDim[Long](d, d)
    mom.foreach(r => s(r.getAs[Int]("i"))(r.getAs[Int]("j")) =
      r.getAs[Long]("s"))
    val mRows = x.select(posexplode(col("e")).as(Seq("i", "xi")))
      .groupBy(col("i"))
      .agg(count(lit(1)).as("c"),
        sum(floor(col("xi").cast("double") * lit(1e9)).cast("long")).as("m"))
      .collect()
    val m = Array.ofDim[Long](d)
    var n = 0L
    mRows.foreach { r =>
      m(r.getAs[Int]("i")) = r.getAs[Long]("m")
      n = r.getAs[Long]("c")
    }
    (n, s, m)
  }

  /** Covariance entry as a double, in PURE double arithmetic from int64
    * factors: ((n·S_ij)·1e9 − m_i·m_j) / (n·n·1e18), every factor one
    * correctly-rounded long→double conversion and every op the identical
    * IEEE sequence on both engines. (An exact-integer numerator through
    * BigInt/HUGEINT is NOT portable: DuckDB's HUGEINT→DOUBLE cast rounds
    * its two 64-bit halves separately — measured 1–3 ULP off the
    * correctly-rounded value — while int64→double is exact-or-correctly-
    * rounded everywhere.) */
  def covMatrix(n: Long, s: Array[Array[Long]],
                m: Array[Long]): Array[Array[Double]] = {
    val den = n.toDouble * n.toDouble * 1e18
    Array.tabulate(s.length, s.length) { (i, j) =>
      (n.toDouble * s(i)(j).toDouble * 1e9
        - m(i).toDouble * m(j).toDouble) / den
    }
  }

  /** `iters` un-normalized power steps from the all-ones vector, fixed
    * ascending-j fold order (the DuckDB mirror folds the identical
    * sequence). */
  def powerIterate(c: Array[Array[Double]], iters: Int): Array[Double] = {
    val d = c.length
    var v = Array.fill(d)(1.0)
    for (_ <- 0 until iters) {
      val nv = Array.ofDim[Double](d)
      var i = 0
      while (i < d) {
        var acc = 0.0
        var j = 0
        while (j < d) { acc += c(i)(j) * v(j); j += 1 }
        nv(i) = acc
        i += 1
      }
      v = nv
    }
    v
  }

  /** Per-row projection Σ_i x_i·w_i as an ascending-index fold (aggregate
    * over zip_with — the same left-to-right sequence as the oracle's
    * list_reduce). */
  def projection(embCol: Column, w: Array[Double]): Column =
    aggregate(
      zip_with(embCol, array(w.map(lit).toSeq: _*),
        (a, b) => a.cast("double") * b),
      lit(0.0), (acc, y) => acc + y)
}
