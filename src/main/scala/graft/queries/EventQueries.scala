package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.events.EventOps

/** Event-time analytics over `events` (SURVEY.md §2 X3): tumbling / sliding /
  * session windows and the as-of join — each with a DuckDB oracle
  * (`time_bucket`, gaps-and-islands, native `ASOF JOIN`).
  */
object EventQueries {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling 1h windows per event_type.
    "q29_tumbling_window" -> ((s, d) =>
      EventOps.tumblingAgg(ev(s, d), "1 hour")
        .orderBy(col("w_start"), col("event_type"))),

    // Sliding 1h windows every 30 min per event_type.
    "q30_sliding_window" -> ((s, d) =>
      EventOps.slidingAgg(ev(s, d), "1 hour", "30 minutes")
        .orderBy(col("w_start"), col("event_type"))),

    // Session windows: 30-minute inactivity gap per user.
    "q31_session_window" -> ((s, d) =>
      EventOps.sessionAgg(ev(s, d), "30 minutes")
        .orderBy(col("user_id"), col("s_start"))),

    // Semi-structured JSON column: extract props.k, bucket it, aggregate —
    // the 100 TB pipeline's "JSON sidecar column" pattern (schema-on-read
    // extraction stays in the scan stage, aggregation on the typed value).
    "q41_json_props" -> ((s, d) =>
      ev(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k").isNotNull)
        .groupBy(col("event_type"), (col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy(col("event_type"), col("k_bucket"))),

    // Pivot: events per type × hour-of-day, expressed as conditional
    // aggregation (the portable form of `groupBy.pivot` with fixed keys).
    "q42_pivot_hours" -> ((s, d) => {
      val typed = ev(s, d).select(col("event_type"), hour(col("ts")).as("h"))
      val cols = Seq("click", "view", "purchase", "signup", "error").map(t =>
        sum(when(col("event_type") === t, 1).otherwise(0)).as(s"n_$t"))
      typed.groupBy(col("h")).agg(cols.head, cols.tail: _*).orderBy(col("h"))
    }),

    // Range (interval) join, bucketed: clicks of the same user within one
    // hour after each error.
    "q43_range_join" -> ((s, d) => {
      val e = ev(s, d)
      EventOps.rangeCountJoin(
          e.filter(col("event_type") === "error")
            .select(col("user_id"), col("event_id"), col("ts")),
          e.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts")),
          keyCol = "user_id", idCol = "event_id", windowMs = 3600 * 1000L)
        .select(col("event_id"), col("user_id"), col("n").as("n_clicks_1h"))
        .orderBy(col("event_id"))
    }),

    // Running (cumulative) per-user total — the frame-based window shape
    // (ROWS UNBOUNDED PRECEDING..CURRENT). The sum runs over DECIMAL so
    // every prefix is exact; (ts, event_id) makes the order total.
    "q58_running_total" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      ev(s, d).select(col("user_id"), col("ts"), col("event_id"),
          sum(col("value").cast("decimal(18,2)")).over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("ts"), col("event_id"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_value"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),

    // Exact discrete quantiles per group — the ops-dashboard shape (p50/p95
    // latency per type). percentile_disc picks an ACTUAL element (no
    // interpolation arithmetic), verified to agree with DuckDB's
    // quantile_disc; at 100 TB the approx_percentile sketch is the scale
    // path, but a sketch has no cross-engine oracle — the exact form is the
    // gated baseline.
    "q70_quantiles" -> ((s, d) =>
      ev(s, d).groupBy(col("event_type"))
        .agg(
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("p50"),
          expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").as("p95"),
          min(col("value")).as("vmin"), max(col("value")).as("vmax"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    // LAG/LEAD analytics: inter-event gap (exact integer µs — no float
    // interval arithmetic) and the next event's type, per user.
    "q71_lag_lead" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, d).select(col("user_id"), col("event_id"), col("ts"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
            .as("gap_us"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),

    // Ranking-window family: quartile bucket, percent_rank, cume_dist per
    // event_type over value. All three are integer-derived ((rank-1)/(n-1),
    // rows<=current/n — exact-rounded IEEE division of integers on both
    // engines), so the gate holds bit-for-bit. (ts, event_id) tie-break
    // makes the order total.
    "q73_rank_windows" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      ev(s, d).select(col("event_type"), col("event_id"), col("value"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy(col("event_type"), col("value"), col("event_id"))
    }),

    // FUNNEL sequence analysis (the MATCH_RECOGNIZE shape): per user, the
    // deepest prefix of view → click → purchase reachable as an ORDERED
    // subsequence of their event stream. One shuffle (groupBy user), then
    // pure expression work: sort_array over (ts, event_id, type) structs
    // makes the collected order total regardless of partitioning, and the
    // stage is a sequential integer fold — deterministic on both engines.
    "q75_funnel" -> ((s, d) =>
      ev(s, d)
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
        .withColumn("stage", aggregate(col("evs"), lit(0),
          (st, e) => when(st === 0 && e.getField("event_type") === "view", 1)
            .when(st === 1 && e.getField("event_type") === "click", 2)
            .when(st === 2 && e.getField("event_type") === "purchase", 3)
            .otherwise(st)))
        .select(col("user_id"), col("stage"))
        .orderBy(col("user_id"))),

    // As-of join: each click picks up the latest prior error of its user.
    // Time-series gap fill + LOCF resample to a daily grid per user.
    "q82_gapfill_locf" -> ((s, d) =>
      EventOps.gapFillDaily(ev(s, d))
        .orderBy(col("user_id"), col("day"))),

    // ROLLING 7-day distinct actives per event_type: an event contributes
    // to the window ENDING on each of the next 7 days, turning the rolling
    // range join into a 7× fan-out equi-join — exact distinct counts with
    // one shuffle, no per-day range scan. (At 100 TB the same plan holds:
    // fan-out is a constant 7 on the already-deduped daily grain.)
    "q87_rolling_actives" -> ((s, d) => {
      val daily = ev(s, d).select(col("event_type"),
          date_trunc("day", col("ts")).as("day"), col("user_id"))
        .distinct()
      daily.select(col("event_type"), col("user_id"),
          explode(sequence(col("day"),
            col("day") + expr("interval 6 days"),
            expr("interval 1 day"))).as("w_day"))
        .groupBy(col("event_type"), col("w_day"))
        .agg(count_distinct(col("user_id")).as("active_users"))
        .orderBy(col("event_type"), col("w_day"))
    }),

    // SCD2 interval compaction: each user's event_type change-points become
    // validity intervals [valid_from, valid_to) — the slowly-changing-
    // dimension history build (one lag to detect changes, one lead to close
    // intervals; single shuffle on the user key).
    "q88_scd2_intervals" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val ch = ev(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .select(col("user_id"), col("event_type"),
          col("ts").as("valid_from"), col("event_id"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("valid_from"), col("event_id"))
      ch.withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))
    }),

    // CDC CHANGELOG MERGE (latest-wins upsert + tombstone deletes): treat
    // the event stream as a changelog keyed on user_id — every event
    // upserts (key → value), except 'error' events which are DELETE
    // tombstones. The merged snapshot keeps each key's latest op (by
    // (ts, event_id), a total order) unless that op is a tombstone — the
    // MERGE INTO / compaction semantics every lakehouse table maintenance
    // job runs. One window shuffle on the key; at 100 TB the changelog
    // side shuffles once and the snapshot is key-sized.
    "q107_cdc_merge" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      ev(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n_ops", count(lit(1)).over(
          Window.partitionBy(col("user_id"))))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("value").as("last_value"),
          col("ts").as("last_ts"), col("n_ops"))
        .orderBy(col("user_id"))
    }),

    // RETENTION COHORTS: users grouped by first-seen day, distinct actives
    // per (cohort, whole-week offset) — the product-analytics matrix. Two
    // shuffles total: one min-per-user, one distinct-count. firstSeen is
    // one row PER USER — cardinality grows with the data, so it gets NO
    // broadcast hint: AQE sizes the join at runtime (same opt-in-broadcast
    // discipline as GraphOps.bfsDistances; a forced BHJ here is a driver
    // OOM at 100×). Both sides hash on user_id, so the sort-merge path
    // co-partitions with the min() aggregate's shuffle and reuses it.
    "q108_retention_cohorts" -> ((s, d) => {
      val e = ev(s, d)
      val firstSeen = e.groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("cohort_day"))
      e.select(col("user_id"), to_date(col("ts")).as("day"))
        .join(firstSeen, Seq("user_id"))
        .select(col("user_id"), col("cohort_day"),
          (datediff(col("day"), col("cohort_day"))
            .cast("long") / lit(7L)).cast("int").as("week_offset"))
        .groupBy(col("cohort_day"), col("week_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_day"), col("week_offset"))
    }),

    // ROLLING Z-SCORE ANOMALY FLAGS, overflow-safe fixed-point: per
    // event_type, each event is scored against the previous 20 events'
    // mean/variance; |z| > 3 flags it. All arithmetic is INTEGER on
    // milli-scaled values — the z²>9 test is cross-multiplied to
    //   (n·v − Σv)²·(n−1) > 9·n·(n·Σv² − (Σv)²)
    // so neither engine ever divides or takes a square root, and the
    // magnitude bound fits comfortably in int64 (v ≤ 5·10⁵ milli-units ⇒
    // LHS ≤ (20·5e5)²·19 ≈ 2e15, RHS ≤ 9·20·20·20·(5e5)² ≈ 2e16 — same
    // overflow discipline as the RankedSearch fixed-point note). Rows
    // without a full 20-event history are emitted unflagged: the rule is
    // total, not partial-window-dependent.
    "q109_anomaly_zscore" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val order = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val w = order.rowsBetween(-20, -1)
      ev(s, d)
        .select(col("event_type"), col("ts"), col("event_id"),
          floor(col("value") * lit(1000)).cast("long").as("v"))
        .withColumn("cnt", count(lit(1)).over(w))
        .withColumn("s1", sum(col("v")).over(w))
        .withColumn("s2", sum(col("v") * col("v")).over(w))
        .withColumn("is_anomaly",
          col("cnt") === 20 &&
            (col("cnt") * col("v") - col("s1")) *
              (col("cnt") * col("v") - col("s1")) * (col("cnt") - 1) >
            lit(9L) * col("cnt") *
              (col("cnt") * col("s2") - col("s1") * col("s1")))
        .select(col("event_type"), col("event_id"), col("v"),
          col("cnt").as("n_window"), col("is_anomaly"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    // Behavioral MARKOV TRANSITIONS: P(next event_type | event_type) from
    // per-user (ts, event_id)-ordered successor pairs — transition counts
    // are exact int64, the probability is q07's single-division discipline
    // (cnt / window-sum, both integer-derived), so the matrix hash-matches
    // cross-engine. Scale shape: one window shuffle on user_id, then a
    // |types|²-bounded aggregate — the output is model-sized regardless of
    // corpus size.
    "q140_transition_probs" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val trans = ev(s, d).select(col("event_type"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .filter(col("next_type").isNotNull)
      val counts = trans.groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("cnt"))
      val w2 = Window.partitionBy(col("event_type"))
      counts.select(col("event_type"), col("next_type"), col("cnt"),
          (col("cnt").cast("double") / sum(col("cnt")).over(w2)).as("prob"))
        .orderBy(col("event_type"), col("next_type"))
    }),

    "q32_asof_join" -> ((s, d) => {
      val e = ev(s, d)
      EventOps.asofJoin(
          e.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts"), col("event_id"), col("value")),
          e.filter(col("event_type") === "error")
            .select(col("user_id"), col("ts").as("err_ts"), col("event_id"),
              col("value"))
            .withColumnRenamed("err_ts", "ts"),
          keyCol = "user_id", tsCol = "ts",
          payload = Seq("value", "event_id"), tiebreak = "event_id")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_value").as("err_value"),
          col("asof_event_id").as("err_event_id"))
        .orderBy(col("event_id"))
    }))

  def oracles: Map[String, String] = Map(
    "q107_cdc_merge" ->
      """WITH ranked AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_ops
        |  FROM events)
        |SELECT user_id, value AS last_value, ts AS last_ts,
        |  CAST(n_ops AS BIGINT) AS n_ops
        |FROM ranked WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,
    "q108_retention_cohorts" ->
      """WITH fs AS (
        |  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        |  FROM events GROUP BY 1)
        |SELECT f.cohort_day,
        |  CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) // 7
        |    AS INTEGER) AS week_offset,
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN fs f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Same cross-multiplied integer z² test as the Spark plan — no sqrt,
    // no division, so the boolean agrees bit-for-bit.
    "q109_anomaly_zscore" ->
      """WITH v AS (
        |  SELECT event_type, ts, event_id,
        |    CAST(floor(value * 1000) AS BIGINT) AS v
        |  FROM events),
        |w AS (
        |  SELECT event_type, event_id, v,
        |    COUNT(*) OVER win AS cnt,
        |    SUM(v) OVER win AS s1,
        |    SUM(v * v) OVER win AS s2
        |  FROM v
        |  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, event_id, v,
        |  CAST(cnt AS BIGINT) AS n_window,
        |  (cnt = 20 AND
        |   (cnt * v - s1) * (cnt * v - s1) * (cnt - 1) >
        |     9 * cnt * (cnt * s2 - s1 * s1)) AS is_anomaly
        |FROM w ORDER BY event_type, event_id""".stripMargin,
    "q87_rolling_actives" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT DISTINCT event_type, date_trunc('day', ts) AS day, user_id
        |  FROM events),
        |contrib AS (
        |  SELECT event_type, user_id,
        |    unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY))
        |      AS w_day
        |  FROM daily)
        |SELECT event_type, w_day, COUNT(DISTINCT user_id) AS active_users
        |FROM contrib GROUP BY 1, 2 ORDER BY event_type, w_day""".stripMargin,
    "q88_scd2_intervals" ->
      """WITH o AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM events),
        |ch AS (
        |  SELECT user_id, event_type, ts AS valid_from, event_id
        |  FROM o WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type, valid_from, event_id,
        |  LEAD(valid_from) OVER (PARTITION BY user_id
        |    ORDER BY valid_from, event_id) AS valid_to
        |FROM ch ORDER BY user_id, valid_from, event_id""".stripMargin,
    // generate_series over each user's day span; LOCF via IGNORE NULLS
    // last_value over the same DECIMAL the Spark window carries.
    "q82_gapfill_locf" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n_events,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS dv
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        |  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
        |        FROM daily GROUP BY user_id) s)
        |SELECT g.user_id, g.day,
        |  COALESCE(d.n_events, 0) AS n_events,
        |  CAST(d.dv AS DOUBLE) AS day_value,
        |  CAST(last_value(d.dv IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS locf_value
        |FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
        |ORDER BY g.user_id, g.day""".stripMargin,
    // Stage codes 1/2/3 = view/click/purchase; the fold advances the stage
    // exactly like the Spark aggregate lambda, over the same total order.
    "q75_funnel" ->
      """SELECT user_id,
        |  CAST(list_reduce(list_prepend(0,
        |    list(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |              WHEN 'purchase' THEN 3 ELSE 0 END
        |         ORDER BY ts, event_id)),
        |    (st, t) -> CASE WHEN st = 0 AND t = 1 THEN 1
        |                    WHEN st = 1 AND t = 2 THEN 2
        |                    WHEN st = 2 AND t = 3 THEN 3
        |                    ELSE st END) AS INTEGER) AS stage
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q73_rank_windows" ->
      """SELECT event_type, event_id, value,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_type, value, event_id""".stripMargin,
    "q29_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "q30_sliding_window" ->
      """SELECT w_start, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
        |                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
        |           AS w_start,
        |         event_type, value
        |  FROM events) t
        |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    // Boundary semantics: Spark's session_window MERGES an event landing
    // EXACTLY gap after its predecessor (the [ts, ts+gap) window's end is
    // treated as inclusive for merging) — so the oracle's new-session
    // predicate is strictly >, and EventSpec "session window boundary" pins
    // this with 30:00-spaced rows.
    "q31_session_window" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL '30 minutes'
        |         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM o)
        |SELECT user_id, MIN(ts) AS s_start,
        |  MAX(ts) + INTERVAL '30 minutes' AS s_end,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sess ORDER BY user_id, s_start""".stripMargin,
    "q58_running_total" ->
      """SELECT user_id, ts, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_value
        |FROM events ORDER BY user_id, ts, event_id""".stripMargin,
    "q41_json_props" ->
      """SELECT event_type, k % 10 AS k_bucket, COUNT(*) AS n,
        |  CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |      FROM events) t
        |WHERE k IS NOT NULL
        |GROUP BY 1, 2 ORDER BY event_type, k_bucket""".stripMargin,
    "q42_pivot_hours" ->
      """SELECT CAST(hour(ts) AS INTEGER) AS h,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        |FROM events GROUP BY 1 ORDER BY h""".stripMargin,
    "q43_range_join" ->
      """SELECT e.event_id, e.user_id, COUNT(c.ts) AS n_clicks_1h
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = e.user_id AND c.ts >= e.ts
        | AND c.ts < e.ts + INTERVAL '1 hour'
        |GROUP BY 1, 2 ORDER BY e.event_id""".stripMargin,
    "q70_quantiles" ->
      """SELECT event_type,
        |  quantile_disc(value, 0.5) AS p50,
        |  quantile_disc(value, 0.95) AS p95,
        |  MIN(value) AS vmin, MAX(value) AS vmax, COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q71_lag_lead" ->
      """SELECT user_id, event_id, ts,
        |  epoch_us(ts) - LAG(epoch_us(ts)) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
        |  LEAD(event_type) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |FROM events ORDER BY user_id, ts, event_id""".stripMargin,
    "q140_transition_probs" ->
      """WITH tr AS (
        |  SELECT event_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |c AS (
        |  SELECT event_type, next_type, COUNT(*) AS cnt
        |  FROM tr WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_type, cnt,
        |  CAST(cnt AS DOUBLE)
        |    / CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS prob
        |FROM c ORDER BY event_type, next_type""".stripMargin,
    "q32_asof_join" ->
      """SELECT c.event_id, c.user_id, c.ts,
        |  e.value AS err_value, e.event_id AS err_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON c.user_id = e.user_id AND c.ts >= e.ts
        |ORDER BY c.event_id""".stripMargin
  )
}
