package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the `events` stream table (SURVEY.md §2 X3 —
  * the streaming surface the north star adds beyond the batch-only
  * reference). Each operator is written against the BATCH DataFrame API in a
  * form that transfers 1:1 to Structured Streaming (`window`,
  * `session_window` and watermark-compatible aggregations); the streaming
  * twins live in [[graft.streaming.StreamOps]].
  *
  * Scale design: windowed aggregation shuffles once on (window, key) with
  * map-side partial aggregation; the as-of join is the union+window plan —
  * one shuffle on the join key, no time-range explosion, skew-safe because
  * the carried state per key is a single running struct (vs. a
  * range-condition join's O(|L|·|R|) per-key blowup).
  */
object EventOps {

  private def decSum(c: Column) = sum(c.cast("decimal(18,2)")).cast("double")

  /** Tumbling-window aggregation: count + decimal-exact value sum per
    * (window start, event_type). */
  def tumblingAgg(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), decSum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding (hopping) window aggregation: `width` windows every `slide`. */
  def slidingAgg(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), decSum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows per user: events closer than `gap` chain into one
    * session; window end = last event + gap (Spark `session_window`
    * semantics). */
  def sessionAgg(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), decSum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("s_start"),
        col("w.end").as("s_end"), col("n"), col("sum_value"))

  /** Bucketed range join: for each left row, count right rows with the same
    * key and `right.ts ∈ [left.ts, left.ts + windowMs)`.
    *
    * A naive range join degenerates to a per-key nested loop (Spark plans
    * range-only conditions as SMJ-with-filter or BNLJ). Bucketing by
    * `windowMs`-wide time buckets turns it into an EQUI-join: a left row can
    * only match rights in its own or the next bucket, so the left side
    * explodes into 2 bucket keys, the join runs on (key, bucket), and the
    * exact range predicate filters the ~2× candidates. Scales as a hash join
    * on (key, bucket) regardless of time span. Left rows with no matches
    * are kept with n = 0.
    */
  def rangeCountJoin(left: DataFrame, right: DataFrame, keyCol: String,
                     idCol: String, windowMs: Long): DataFrame = {
    val w = windowMs * 1000L // µs
    val lb = left.select(col(keyCol), col(idCol), col("ts"),
        explode(array((unix_micros(col("ts")) / w).cast("long"),
          (unix_micros(col("ts")) / w).cast("long") + 1)).as("__b"))
    val rb = right.select(col(keyCol), col("ts").as("__rts"),
      (unix_micros(col("ts")) / w).cast("long").as("__b"))
    val counts = lb.join(rb, Seq(keyCol, "__b"))
      .filter(unix_micros(col("__rts")) >= unix_micros(col("ts")) &&
        unix_micros(col("__rts")) < unix_micros(col("ts")) + w)
      .groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    left.join(counts, Seq(idCol), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }

  /** Time-series GAP FILL + LOCF resample: one row per (user, day) over
    * each user's [first-day, last-day] span, zero-filled event counts, and
    * the day's decimal-exact value sum carried forward over gap days
    * (last-observation-carried-forward — the standard resample before
    * joining feeds with different cadences). Day grid stays TIMESTAMP on
    * both engines (`date_trunc` semantics shared with the DuckDB oracle).
    *
    * Scale shape: one aggregation to daily grain, one tiny per-user span
    * aggregate whose `sequence` explode generates days-per-user rows (grid
    * is output-sized, never a cross join), one left join back on
    * (user, day), one LOCF window per user. Skewed users cost days, not
    * events, after the first aggregation.
    */
  def gapFillDaily(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("dv"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("dv").cast("double").as("day_value"),
        // LOCF stays DECIMAL through the window; one cast at the end
        last(col("dv"), ignoreNulls = true).over(w).cast("double").as("locf_value"))
  }

  /** As-of join (inclusive): for each left row, the latest right row with
    * `right.ts <= left.ts` and equal keys — DuckDB `ASOF JOIN` semantics,
    * "latest" broken by greatest `tiebreak` among equal timestamps.
    *
    * Plan: tag both sides, union, one window per key ordered by
    * (ts, right-first, tiebreak), carry the right payload forward as a single
    * struct with `last(_, ignoreNulls)` — all `asof_*` fields are guaranteed
    * to come from the SAME right row. One shuffle on the key; O(1) running
    * state per key.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payload: Seq[String], tiebreak: String): DataFrame = {
    val payloadT = org.apache.spark.sql.types.StructType(
      payload.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val leftRest = left.columns.filterNot(Seq(keyCol, tsCol).contains).toSeq
    val lTagged = left.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__is_right"),
        lit(null).cast("long").as("__rord"),
        lit(null).cast(payloadT).as("__r")) ++ leftRest.map(col): _*)
    val rTagged = right.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__is_right"),
        col(tiebreak).cast("long").as("__rord"),
        struct(payload.map(col): _*).as("__r")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // right rows sort BEFORE left rows at equal ts => inclusive (<=) as-of
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__is_right").desc, col("__rord").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select(Seq(col(keyCol), col(tsCol)) ++ leftRest.map(col) ++
        payload.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
