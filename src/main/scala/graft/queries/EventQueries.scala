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

    // As-of join: each click picks up the latest prior error of its user.
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
    "q32_asof_join" ->
      """SELECT c.event_id, c.user_id, c.ts,
        |  e.value AS err_value, e.event_id AS err_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON c.user_id = e.user_id AND c.ts >= e.ts
        |ORDER BY c.event_id""".stripMargin
  )
}
