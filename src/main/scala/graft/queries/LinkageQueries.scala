package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.IntLn
import graft.Tables

/** Probabilistic record linkage — the Fellegi–Sunter layer the reference
  * delegates to Senzing (/root/reference/dagster_icij/assets.py:50-63 ships
  * records OUT to the ER engine and reads resolved entities back; these
  * queries are the engine-internal share of that boundary: blocked pairwise
  * comparison, frequency-calibrated agreement weights, and the
  * blocking-scheme planning report).
  *
  * Fixture: a deterministic dirty-duplicate corpus derived from `customer`
  * in-query (the q154/q155 discipline — the perturbations are arithmetic in
  * c_custkey, so the oracle re-derives every record, every candidate pair,
  * and every weight from the same parquet). Source-A records are the
  * customers verbatim; every custkey ≡ 0 (mod 3) also emits a source-B
  * duplicate with field noise:
  *   - name: custkey ≡ 0 (mod 6) → last digit d flips to (d+5) % 10
  *   - nation: custkey ≡ 0 (mod 15) → (nation+1) % 25
  *   - segment: custkey ≡ 0 (mod 12) → next segment in the fixed ring
  *   - balance: + (custkey % 5) · 0.37  (within the ±1.00 comparator tol
  *     iff custkey % 5 ≤ 2)
  * The ±5 name-digit flip never crosses a ⌊digits/200⌋ boundary (custkey ≡
  * 0 mod 6 ⇒ even ⇒ the crossing residues 195..199/0..4 are unreachable),
  * so the name-block key captures every true pair BY CONSTRUCTION while
  * the nation key misses exactly the mod-15 set — the two schemes q182
  * prices against each other.
  */
object LinkageQueries {

  /** A-side records: the customers verbatim. */
  private[queries] def aRecords(c: DataFrame): DataFrame =
    c.select(
      (col("c_custkey") * 2).as("rec_id"), lit("A").as("src"),
      col("c_name").as("name"), col("c_nationkey").as("nat"),
      col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"))

  /** B-side dirty duplicates — field noise all arithmetic in custkey.
    * Works on a batch OR streaming customer frame (pure projections), so
    * q186 streams the same fixture the oracle re-derives. */
  private[queries] def bRecords(c: DataFrame): DataFrame = {
    val k = col("c_custkey")
    val dLast = k % 10
    val nameNum = when(k % 6 === 0, k - dLast + (dLast + 5) % 10).otherwise(k)
    val segRing = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    val segNext = segRing.zipWithIndex.foldLeft(col("c_mktsegment")) {
      case (acc, (sg, i)) =>
        when(col("c_mktsegment") === sg,
          lit(segRing((i + 1) % segRing.length))).otherwise(acc)
    }
    c.filter(k % 3 === 0).select(
      (k * 2 + 1).as("rec_id"), lit("B").as("src"),
      concat(lit("Customer#"),
        lpad(nameNum.cast("string"), 9, "0")).as("name"),
      when(k % 15 === 0, (col("c_nationkey") + 1) % 25)
        .otherwise(col("c_nationkey")).as("nat"),
      when(k % 12 === 0, segNext).otherwise(col("c_mktsegment")).as("seg"),
      (col("c_acctbal") + (k % 5).cast("double") * 0.37).as("bal"))
  }

  /** Blocking keys: `digits` parsed back OUT of the name string (the
    * blocking key must derive from the observed field, not the hidden
    * key), `blk` = ⌊digits/200⌋. */
  private[queries] def withKeys(r: DataFrame): DataFrame =
    r.withColumn("digits", substring(col("name"), 10, 9).cast("long"))
      .withColumn("blk", (col("digits") / 200).cast("long"))

  /** Dirty-duplicate record table: (rec_id, src, name, nat, seg, bal,
    * digits, blk). rec_id = 2·custkey (+1 for the B duplicate) keeps A/B
    * ids disjoint and order-stable. */
  private def records(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    withKeys(aRecords(c).unionByName(bRecords(c)))
  }

  /** Agreement projection for a blocked pair join: (ra, rb, name_eq,
    * seg_eq, bal_close) from `a`-prefixed × `b`-prefixed field columns. */
  private[queries] def agreementCols(df: DataFrame): DataFrame =
    df.select(col("ra"), col("rb"),
      (col("name_a") === col("name_b")).as("name_eq"),
      (col("seg_a") === col("seg_b")).as("seg_eq"),
      (abs(col("bal_a") - col("bal_b")) <= 1.0).as("bal_close"))

  /** The six FS weights as a 1-row frame from a candidate comparison
    * space: u_f counted from `cand` itself, m constants 9/10 (name),
    * 19/20 (segment), 9/10 (balance); every ln an IntLn of a pair count. */
  private[queries] def fsWeights(cand: DataFrame): DataFrame = {
    val agg = cand.agg(
      count(lit(1)).as("p"),
      sum(when(col("name_eq"), 1L).otherwise(0L)).as("a_name"),
      sum(when(col("seg_eq"), 1L).otherwise(0L)).as("a_seg"),
      sum(when(col("bal_close"), 1L).otherwise(0L)).as("a_bal"))
    def w(mNum: Long, mDen: Long, a: org.apache.spark.sql.Column) = (
      IntLn.iln1e9(lit(mNum)) - IntLn.iln1e9(lit(mDen))
        + IntLn.iln1e9(col("p")) - IntLn.iln1e9(greatest(a, lit(1L))),
      IntLn.iln1e9(lit(mDen - mNum)) - IntLn.iln1e9(lit(mDen))
        + IntLn.iln1e9(col("p"))
        - IntLn.iln1e9(greatest(col("p") - a, lit(1L))))
    val (wNameA, wNameD) = w(9, 10, col("a_name"))
    val (wSegA, wSegD) = w(19, 20, col("a_seg"))
    val (wBalA, wBalD) = w(9, 10, col("a_bal"))
    agg.select(
      wNameA.as("w_name_a"), wNameD.as("w_name_d"),
      wSegA.as("w_seg_a"), wSegD.as("w_seg_d"),
      wBalA.as("w_bal_a"), wBalD.as("w_bal_d"))
  }

  /** The records fixture as a DuckDB CTE (`rec`) — field-for-field the twin
    * of [[records]]. */
  private val recordsSql =
    """rec AS (
      |  SELECT c_custkey * 2 AS rec_id, 'A' AS src, c_name AS name,
      |    c_nationkey AS nat, c_mktsegment AS seg, c_acctbal AS bal
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey * 2 + 1, 'B',
      |    'Customer#' || lpad(CAST(
      |      CASE WHEN c_custkey % 6 = 0
      |        THEN c_custkey - c_custkey % 10 + (c_custkey % 10 + 5) % 10
      |        ELSE c_custkey END AS VARCHAR), 9, '0'),
      |    CASE WHEN c_custkey % 15 = 0 THEN (c_nationkey + 1) % 25
      |      ELSE c_nationkey END,
      |    CASE WHEN c_custkey % 12 = 0 THEN
      |      CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 'BUILDING'
      |        WHEN 'BUILDING' THEN 'FURNITURE'
      |        WHEN 'FURNITURE' THEN 'HOUSEHOLD'
      |        WHEN 'HOUSEHOLD' THEN 'MACHINERY' ELSE 'AUTOMOBILE' END
      |      ELSE c_mktsegment END,
      |    c_acctbal + (c_custkey % 5) * 0.37
      |  FROM customer WHERE c_custkey % 3 = 0),
      |recd AS (SELECT *, CAST(substr(name, 10, 9) AS BIGINT) AS digits
      |  FROM rec)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // FELLEGI–SUNTER SCORED LINKAGE: blocked candidate pairs, one
    // agreement vector per pair (name exact / segment exact / balance
    // within ±1.00), log-likelihood match weights, positive-score pairs
    // out. The weights are FREQUENCY-CALIBRATED ON THE COMPARISON SPACE —
    // u_f (chance agreement among candidate pairs) is counted from the
    // candidates themselves, the standard estimator when labeled
    // non-matches don't exist — and every ln is the integer-only
    // fixed-point ln (functions.IntLn) of a pair COUNT, so the score is
    // cross-engine identical by construction (the q114/q117 discipline):
    //   agree(f):    iln(m_num) − iln(m_den) + iln(P) − iln(A_f)
    //   disagree(f): iln(m_den−m_num) − iln(m_den) + iln(P) − iln(P−A_f)
    // with m = 9/10 (name), 19/20 (segment), 9/10 (balance) the assumed
    // within-match agreement rates (documented constants, the tunable of
    // the method). Scale shape: the self-join blocks on (⌊digits/200⌋,
    // nation) — block sizes are CONSTANT by construction (~200/25·4/3
    // records), so candidates grow linearly in the corpus, never N²; the
    // agreement counts are ONE map-side-combinable aggregate over the
    // candidate pass (4 longs), broadcast back as the six weight
    // constants; the iln folds run on that 1-row aggregate only. P < 2^62
    // bounds the iln domain at ~10^17 records — document-scale safe.
    "q181_fs_linkage" -> ((s, d) => {
      val r = records(s, d)
      val left = r.select(col("rec_id").as("ra"), col("blk"), col("nat"),
        col("name").as("name_a"), col("seg").as("seg_a"),
        col("bal").as("bal_a"))
      val right = r.select(col("rec_id").as("rb"), col("blk"), col("nat"),
        col("name").as("name_b"), col("seg").as("seg_b"),
        col("bal").as("bal_b"))
      val cand = agreementCols(
        left.join(right, Seq("blk", "nat")).filter(col("ra") < col("rb")))
        .localCheckpoint() // scanned twice: u-estimation + scoring
      cand.crossJoin(broadcast(fsWeights(cand)))
        .withColumn("score_fp",
          when(col("name_eq"), col("w_name_a")).otherwise(col("w_name_d"))
            + when(col("seg_eq"), col("w_seg_a")).otherwise(col("w_seg_d"))
            + when(col("bal_close"), col("w_bal_a")).otherwise(col("w_bal_d")))
        .filter(col("score_fp") > 0)
        .select(col("ra"), col("rb"), col("name_eq"), col("seg_eq"),
          col("bal_close"),
          (col("score_fp").cast("double") / 1e9).as("score"))
        .orderBy(col("ra"), col("rb"))
    }),

    // BLOCKING-SCHEME QUALITY REPORT — the planning table every linkage /
    // dedup pipeline reads before committing to a candidate generator:
    // for each scheme (nation key / ⌊name digits/200⌋ / their composite),
    // the candidate-pair mass it admits (reduction ratio vs the N² it
    // avoids) and the true-duplicate pairs it retains (pair completeness
    // against the custkey ground truth). Candidates are counted from
    // block SIZES (Σ n·(n−1)/2 off a groupBy count — the pairs are never
    // materialized, so the report is one narrow aggregate per scheme even
    // where a scheme is quadratic), widened through decimal before the
    // n·(n−1) product (the q164 wrap discipline); completeness joins the
    // A/B sides of each true pair and compares keys directly. The three
    // schemes land as three rows of one unioned plan over a shared
    // localCheckpointed record set.
    "q182_blocking_quality" -> ((s, d) => {
      val r = records(s, d)
        .localCheckpoint() // shared by 3 block counts + the truth join
      val n = r.count()
      val totalPairs = java.math.BigDecimal.valueOf(n)
        .multiply(java.math.BigDecimal.valueOf(n - 1))
        .divide(java.math.BigDecimal.valueOf(2))
      // true pairs: custkey ≡ 0 (mod 3) ⇒ (2k, 2k+1); key agreement per
      // scheme read off the A/B rows
      val truth = r.filter(col("rec_id") % 2 === 0)
        .select((col("rec_id") / 2).cast("long").as("ck"),
          col("blk").as("blk_a"), col("nat").as("nat_a"))
        .join(r.filter(col("rec_id") % 2 === 1)
            .select(((col("rec_id") - 1) / 2).cast("long").as("ck"),
              col("blk").as("blk_b"), col("nat").as("nat_b")),
          Seq("ck"))
        .agg(count(lit(1)).as("true_pairs"),
          sum(when(col("nat_a") === col("nat_b"), 1L).otherwise(0L))
            .as("cap_nat"),
          sum(when(col("blk_a") === col("blk_b"), 1L).otherwise(0L))
            .as("cap_blk"),
          sum(when(col("nat_a") === col("nat_b") &&
              col("blk_a") === col("blk_b"), 1L).otherwise(0L))
            .as("cap_comp"))
      def candCount(keys: Seq[String], scheme: String,
                    cap: org.apache.spark.sql.Column) =
        r.groupBy(keys.map(col): _*).count()
          .agg(sum((col("count").cast("decimal(38,0)") *
            (col("count") - 1).cast("decimal(38,0)")) / 2).as("cands"))
          .crossJoin(broadcast(truth))
          .select(lit(scheme).as("scheme"), lit(n).as("n_records"),
            col("cands").cast("long").as("candidate_pairs"),
            (lit(1.0) - col("cands").cast("double")
              / lit(totalPairs).cast("double")).as("reduction_ratio"),
            col("true_pairs"), cap.as("captured"),
            (cap.cast("double") / col("true_pairs").cast("double"))
              .as("pair_completeness"))
      candCount(Seq("nat"), "nation", col("cap_nat"))
        .unionByName(candCount(Seq("blk"), "name_block", col("cap_blk")))
        .unionByName(
          candCount(Seq("blk", "nat"), "composite", col("cap_comp")))
        .orderBy(col("scheme"))
    }),

    // EM-ESTIMATED FELLEGI–SUNTER PARAMETERS — q181 ASSUMES its m
    // probabilities (9/10, 19/20, 9/10: documented constants, the
    // method's tunable); this query LEARNS (λ, m_f, u_f) from the
    // UNLABELED candidate space with the expectation–maximization scheme
    // of Winkler 1988 (the Splink-family estimator). The ≤ 2³ agreement
    // PATTERNS are a sufficient statistic for the E-step, so after one
    // corpus-scale aggregation (the same blocked-candidate pass as q181,
    // map-side combinable) EVERY EM iteration runs on an ≤ 8-row frame —
    // five unrolled iterations live IN THE PLAN as 8×1 crossJoins, no
    // driver state at all. Cross-engine exactness: parameters are 1e6
    // fixed-point longs (every M-step division a long `div`, clamped to
    // [1, 999999]), and the per-pattern posterior w = p_m/(p_m+p_u) is a
    // pinned-order IEEE chain over doubles derived from those longs,
    // floor-quantized back to 1e6 before the (order-independent) integer
    // sums — both engines replay identical arithmetic, bit for bit. The
    // output is the 3-field parameter table with the learned log-weights
    // (iln of the fixed-point values, the q181 discipline).
    "q218_em_linkage" -> ((s, d) => {
      import org.apache.spark.sql.Column
      val r = records(s, d)
      val left = r.select(col("rec_id").as("ra"), col("blk"), col("nat"),
        col("name").as("name_a"), col("seg").as("seg_a"),
        col("bal").as("bal_a"))
      val right = r.select(col("rec_id").as("rb"), col("blk"), col("nat"),
        col("name").as("name_b"), col("seg").as("seg_b"),
        col("bal").as("bal_b"))
      // EM consumes the pattern table as 1e6-FIXED FREQUENCIES, not raw
      // pair counts: with raw counts the M-step's (s·1e6) div snw chain
      // crosses int64 at ~10⁷ candidate pairs (SCALE_r15 measured the
      // overflow at ×100 — ARITHMETIC_OVERFLOW under ANSI mode), while
      // normalized shares bound every EM sum at ANY corpus size
      // (sn ≤ 1e6 ⇒ snw ≤ 1e12 ⇒ s·1e6 ≤ 1e18 < 2⁶³). EM is scale-free in
      // the pattern distribution, so the only effect is the ≤ 8-way
      // quantization, mirrored exactly in the oracle. A pattern whose
      // share floors to 0 drops out — the estimator's resolution floor,
      // 1e-6 of the candidate mass.
      val pat0 = agreementCols(
        left.join(right, Seq("blk", "nat")).filter(col("ra") < col("rb")))
        .groupBy(col("name_eq"), col("seg_eq"), col("bal_close"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint() // ≤ 8 rows feeding BOTH the total and the
                           // normalize — without this the corpus-scale
                           // candidate pass runs twice
      val pat = pat0
        .crossJoin(broadcast(pat0.agg(sum(col("n")).as("sn_tot"))))
        .select(col("name_eq"), col("seg_eq"), col("bal_close"),
          expr("(n * 1000000) div sn_tot").as("n"))
        .localCheckpoint() // ≤ 8 rows, scanned once per EM iteration
      val init = s.range(1).select(
        lit(100000L).as("lam"),
        lit(900000L).as("m1"), lit(900000L).as("m2"), lit(900000L).as("m3"),
        lit(100000L).as("u1"), lit(100000L).as("u2"), lit(100000L).as("u3"))
      def clamp(c: Column) = greatest(least(c, lit(999999L)), lit(1L))
      def step(p: DataFrame): DataFrame = {
        def f(mc: String, g: Column) =
          when(g, col(mc).cast("double") / 1e6)
            .otherwise(lit(1.0) - col(mc).cast("double") / 1e6)
        val pm = (col("lam").cast("double") / 1e6) *
          f("m1", col("name_eq")) * f("m2", col("seg_eq")) *
          f("m3", col("bal_close"))
        val pu = (lit(1.0) - col("lam").cast("double") / 1e6) *
          f("u1", col("name_eq")) * f("u2", col("seg_eq")) *
          f("u3", col("bal_close"))
        def s1(g: Column) = sum(when(g, col("n") * col("w")).otherwise(0L))
        def t1(g: Column) =
          sum(when(g, col("n") * (lit(1000000L) - col("w"))).otherwise(0L))
        pat.crossJoin(broadcast(p))
          .withColumn("w",
            floor(pm / (pm + pu) * lit(1000000.0)).cast("long"))
          .agg(sum(col("n")).as("sn"),
            sum(col("n") * col("w")).as("snw"),
            sum(col("n") * (lit(1000000L) - col("w"))).as("snu"),
            s1(col("name_eq")).as("s1"), s1(col("seg_eq")).as("s2"),
            s1(col("bal_close")).as("s3"),
            t1(col("name_eq")).as("t1"), t1(col("seg_eq")).as("t2"),
            t1(col("bal_close")).as("t3"))
          // snw/snu are clamped ≥ 1 (mirrored in emOracleSql): in a
          // degenerate corpus where every posterior quantizes to 0 or 1e6
          // one side's mass is exactly 0, and Spark's `div` would return
          // NULL (silently poisoning later iterations) while DuckDB's `//`
          // raises — the clamp makes both engines degrade identically
          // (the starved side's parameters pin to the 999999 ceiling).
          .select(
            clamp(expr("snw div sn")).as("lam"),
            clamp(expr("(s1 * 1000000) div greatest(snw, 1)")).as("m1"),
            clamp(expr("(s2 * 1000000) div greatest(snw, 1)")).as("m2"),
            clamp(expr("(s3 * 1000000) div greatest(snw, 1)")).as("m3"),
            clamp(expr("(t1 * 1000000) div greatest(snu, 1)")).as("u1"),
            clamp(expr("(t2 * 1000000) div greatest(snu, 1)")).as("u2"),
            clamp(expr("(t3 * 1000000) div greatest(snu, 1)")).as("u3"))
      }
      val p5 = (1 to 5).foldLeft(init)((p, _) => step(p))
        .localCheckpoint() // 1 row, projected three times below
      def fieldRow(name: String, m: String, u: String) =
        p5.select(lit(name).as("field"),
          (col(m).cast("double") / 1e6).as("m"),
          (col(u).cast("double") / 1e6).as("u"),
          ((IntLn.iln1e9(col(m)) - IntLn.iln1e9(col(u)))
            .cast("double") / 1e9).as("w_agree"),
          ((IntLn.iln1e9(lit(1000000L) - col(m))
            - IntLn.iln1e9(lit(1000000L) - col(u)))
            .cast("double") / 1e9).as("w_disagree"),
          (col("lam").cast("double") / 1e6).as("lambda_match"))
      fieldRow("bal", "m3", "u3")
        .unionByName(fieldRow("name", "m1", "u1"))
        .unionByName(fieldRow("seg", "m2", "u2"))
        .orderBy(col("field"))
    }))

  /** Agreement-count aggregate body (caller appends the source relation). */
  private[queries] val aggFromSql =
    """
      |  SELECT COUNT(*) AS p,
      |    SUM(CASE WHEN name_eq THEN 1 ELSE 0 END) AS a_name,
      |    SUM(CASE WHEN seg_eq THEN 1 ELSE 0 END) AS a_seg,
      |    SUM(CASE WHEN bal_close THEN 1 ELSE 0 END) AS a_bal
      |  FROM""".stripMargin

  /** The six-weight CTE over `agg` — the SQL twin of [[fsWeights]],
    * shared by q181 (weights from the full candidate space) and q186
    * (weights calibrated on the static A–A reference pairs). */
  private[queries] val wCteSql =
    s"""w AS (
       |  SELECT
       |    ${IntLn.iln1e9Sql("9")} - ${IntLn.iln1e9Sql("10")}
       |      + ${IntLn.iln1e9Sql("p")}
       |      - ${IntLn.iln1e9Sql("greatest(a_name, 1)")} AS w_name_a,
       |    ${IntLn.iln1e9Sql("1")} - ${IntLn.iln1e9Sql("10")}
       |      + ${IntLn.iln1e9Sql("p")}
       |      - ${IntLn.iln1e9Sql("greatest(p - a_name, 1)")} AS w_name_d,
       |    ${IntLn.iln1e9Sql("19")} - ${IntLn.iln1e9Sql("20")}
       |      + ${IntLn.iln1e9Sql("p")}
       |      - ${IntLn.iln1e9Sql("greatest(a_seg, 1)")} AS w_seg_a,
       |    ${IntLn.iln1e9Sql("1")} - ${IntLn.iln1e9Sql("20")}
       |      + ${IntLn.iln1e9Sql("p")}
       |      - ${IntLn.iln1e9Sql("greatest(p - a_seg, 1)")} AS w_seg_d,
       |    ${IntLn.iln1e9Sql("9")} - ${IntLn.iln1e9Sql("10")}
       |      + ${IntLn.iln1e9Sql("p")}
       |      - ${IntLn.iln1e9Sql("greatest(a_bal, 1)")} AS w_bal_a,
       |    ${IntLn.iln1e9Sql("1")} - ${IntLn.iln1e9Sql("10")}
       |      + ${IntLn.iln1e9Sql("p")}
       |      - ${IntLn.iln1e9Sql("greatest(p - a_bal, 1)")} AS w_bal_d
       |  FROM agg)""".stripMargin

  /** FS score in 1e9 fixed point (the CASE sum both oracles filter and
    * emit). */
  private[queries] val scoreExprSql =
    """CASE WHEN name_eq THEN w_name_a ELSE w_name_d END
      |     + CASE WHEN seg_eq THEN w_seg_a ELSE w_seg_d END
      |     + CASE WHEN bal_close THEN w_bal_a ELSE w_bal_d END""".stripMargin

  /** The records CTE re-exported for the streaming twin's oracle. */
  private[queries] def recordsCteSql: String = recordsSql

  /** The unrolled 5-iteration EM chain — the SQL twin of q218's in-plan
    * fold, generated so the two unrollings cannot drift. */
  private def emOracleSql: String = {
    def f(m: String, g: String) =
      s"CASE WHEN $g THEN CAST($m AS DOUBLE) / 1000000.0" +
        s" ELSE 1.0 - CAST($m AS DOUBLE) / 1000000.0 END"
    val pm = s"(((CAST(lam AS DOUBLE) / 1000000.0 * ${f("m1", "name_eq")})" +
      s" * ${f("m2", "seg_eq")}) * ${f("m3", "bal_close")})"
    val pu = s"((((1.0 - CAST(lam AS DOUBLE) / 1000000.0)" +
      s" * ${f("u1", "name_eq")}) * ${f("u2", "seg_eq")})" +
      s" * ${f("u3", "bal_close")})"
    val steps = (1 to 5).map { i =>
      s"""w$i AS (
         |  SELECT pat.*,
         |    CAST(FLOOR($pm / ($pm + $pu) * 1000000.0) AS BIGINT) AS w
         |  FROM pat CROSS JOIN p${i - 1}),
         |p$i AS (
         |  SELECT
         |    greatest(least(snw // sn, 999999), 1) AS lam,
         |    greatest(least((s1 * 1000000) // greatest(snw, 1), 999999), 1) AS m1,
         |    greatest(least((s2 * 1000000) // greatest(snw, 1), 999999), 1) AS m2,
         |    greatest(least((s3 * 1000000) // greatest(snw, 1), 999999), 1) AS m3,
         |    greatest(least((t1 * 1000000) // greatest(snu, 1), 999999), 1) AS u1,
         |    greatest(least((t2 * 1000000) // greatest(snu, 1), 999999), 1) AS u2,
         |    greatest(least((t3 * 1000000) // greatest(snu, 1), 999999), 1) AS u3
         |  FROM (SELECT
         |      CAST(SUM(n) AS BIGINT) AS sn,
         |      CAST(SUM(n * w) AS BIGINT) AS snw,
         |      CAST(SUM(n * (1000000 - w)) AS BIGINT) AS snu,
         |      CAST(SUM(CASE WHEN name_eq THEN n * w ELSE 0 END) AS BIGINT) AS s1,
         |      CAST(SUM(CASE WHEN seg_eq THEN n * w ELSE 0 END) AS BIGINT) AS s2,
         |      CAST(SUM(CASE WHEN bal_close THEN n * w ELSE 0 END) AS BIGINT) AS s3,
         |      CAST(SUM(CASE WHEN name_eq THEN n * (1000000 - w) ELSE 0 END) AS BIGINT) AS t1,
         |      CAST(SUM(CASE WHEN seg_eq THEN n * (1000000 - w) ELSE 0 END) AS BIGINT) AS t2,
         |      CAST(SUM(CASE WHEN bal_close THEN n * (1000000 - w) ELSE 0 END) AS BIGINT) AS t3
         |    FROM w$i) a)""".stripMargin
    }.mkString(",\n")
    def fieldRow(name: String, m: String, u: String) =
      s"""SELECT '$name' AS field,
         |  CAST($m AS DOUBLE) / 1000000.0 AS m,
         |  CAST($u AS DOUBLE) / 1000000.0 AS u,
         |  CAST(${IntLn.iln1e9Sql(m)} - ${IntLn.iln1e9Sql(u)} AS DOUBLE)
         |    / 1e9 AS w_agree,
         |  CAST(${IntLn.iln1e9Sql(s"1000000 - $m")}
         |    - ${IntLn.iln1e9Sql(s"1000000 - $u")} AS DOUBLE)
         |    / 1e9 AS w_disagree,
         |  CAST(lam AS DOUBLE) / 1000000.0 AS lambda_match
         |FROM p5""".stripMargin
    s"""WITH $recordsSql,
       |r AS (SELECT rec_id, name, nat, seg, bal, digits // 200 AS blk
       |  FROM recd),
       |cand AS (
       |  SELECT a.rec_id AS ra, b.rec_id AS rb,
       |    a.name = b.name AS name_eq, a.seg = b.seg AS seg_eq,
       |    abs(a.bal - b.bal) <= 1.0 AS bal_close
       |  FROM r a JOIN r b ON a.blk = b.blk AND a.nat = b.nat
       |    AND a.rec_id < b.rec_id),
       |pat0 AS (
       |  SELECT name_eq, seg_eq, bal_close, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM cand GROUP BY 1, 2, 3),
       |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS sn_tot FROM pat0),
       |pat AS (
       |  SELECT name_eq, seg_eq, bal_close,
       |    (n * 1000000) // sn_tot AS n
       |  FROM pat0 CROSS JOIN tot),
       |p0 AS (SELECT
       |  CAST(100000 AS BIGINT) AS lam,
       |  CAST(900000 AS BIGINT) AS m1, CAST(900000 AS BIGINT) AS m2,
       |  CAST(900000 AS BIGINT) AS m3,
       |  CAST(100000 AS BIGINT) AS u1, CAST(100000 AS BIGINT) AS u2,
       |  CAST(100000 AS BIGINT) AS u3),
       |$steps
       |${fieldRow("bal", "m3", "u3")}
       |UNION ALL
       |${fieldRow("name", "m1", "u1")}
       |UNION ALL
       |${fieldRow("seg", "m2", "u2")}
       |ORDER BY field""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    // EM parameter estimation: the generated unrolled twin of the in-plan
    // fold — pattern counts, five E+M rounds at 1e6 fixed point, the
    // learned weight table.
    "q218_em_linkage" -> emOracleSql,
    "q181_fs_linkage" ->
      s"""WITH $recordsSql,
         |r AS (SELECT rec_id, name, nat, seg, bal, digits // 200 AS blk
         |  FROM recd),
         |cand AS (
         |  SELECT a.rec_id AS ra, b.rec_id AS rb,
         |    a.name = b.name AS name_eq, a.seg = b.seg AS seg_eq,
         |    abs(a.bal - b.bal) <= 1.0 AS bal_close
         |  FROM r a JOIN r b ON a.blk = b.blk AND a.nat = b.nat
         |    AND a.rec_id < b.rec_id),
         |agg AS ($aggFromSql cand),
         |$wCteSql
         |SELECT ra, rb, name_eq, seg_eq, bal_close,
         |  CAST(($scoreExprSql) AS DOUBLE) / 1e9 AS score
         |FROM cand, w
         |WHERE ($scoreExprSql) > 0
         |ORDER BY ra, rb""".stripMargin,
    "q182_blocking_quality" ->
      s"""WITH $recordsSql,
         |r AS (SELECT rec_id, nat, digits // 200 AS blk FROM recd),
         |n AS (SELECT COUNT(*) AS n_records,
         |  CAST(COUNT(*) AS HUGEINT) * (COUNT(*) - 1) / 2 AS total FROM r),
         |truth AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS true_pairs,
         |    CAST(SUM(CASE WHEN a.nat = b.nat THEN 1 ELSE 0 END)
         |      AS BIGINT) AS cap_nat,
         |    CAST(SUM(CASE WHEN a.blk = b.blk THEN 1 ELSE 0 END)
         |      AS BIGINT) AS cap_blk,
         |    CAST(SUM(CASE WHEN a.nat = b.nat AND a.blk = b.blk
         |      THEN 1 ELSE 0 END) AS BIGINT) AS cap_comp
         |  FROM r a JOIN r b ON a.rec_id // 2 = b.rec_id // 2
         |    AND a.rec_id % 2 = 0 AND b.rec_id % 2 = 1),
         |c_nat AS (SELECT SUM(CAST(c AS HUGEINT) * (c - 1) / 2) AS cands
         |  FROM (SELECT COUNT(*) AS c FROM r GROUP BY nat)),
         |c_blk AS (SELECT SUM(CAST(c AS HUGEINT) * (c - 1) / 2) AS cands
         |  FROM (SELECT COUNT(*) AS c FROM r GROUP BY blk)),
         |c_comp AS (SELECT SUM(CAST(c AS HUGEINT) * (c - 1) / 2) AS cands
         |  FROM (SELECT COUNT(*) AS c FROM r GROUP BY blk, nat))
         |SELECT * FROM (
         |  SELECT 'nation' AS scheme, n_records,
         |    CAST(c_nat.cands AS BIGINT) AS candidate_pairs,
         |    1.0 - CAST(c_nat.cands AS DOUBLE) / CAST(total AS DOUBLE)
         |      AS reduction_ratio,
         |    true_pairs, cap_nat AS captured,
         |    CAST(cap_nat AS DOUBLE) / true_pairs AS pair_completeness
         |  FROM n, truth, c_nat
         |  UNION ALL
         |  SELECT 'name_block', n_records, CAST(c_blk.cands AS BIGINT),
         |    1.0 - CAST(c_blk.cands AS DOUBLE) / CAST(total AS DOUBLE),
         |    true_pairs, cap_blk,
         |    CAST(cap_blk AS DOUBLE) / true_pairs
         |  FROM n, truth, c_blk
         |  UNION ALL
         |  SELECT 'composite', n_records, CAST(c_comp.cands AS BIGINT),
         |    1.0 - CAST(c_comp.cands AS DOUBLE) / CAST(total AS DOUBLE),
         |    true_pairs, cap_comp,
         |    CAST(cap_comp AS DOUBLE) / true_pairs
         |  FROM n, truth, c_comp)
         |ORDER BY scheme""".stripMargin)
}
