package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch twins of the streaming operators (SURVEY.md §2B "Streaming").
  * Each windowing query here uses the exact `window()` / `session_window()`
  * expressions that the Structured Streaming versions in
  * [[graft.streaming.Streams]] use — same grouping logic, same results —
  * which is what makes them DuckDB-oracle-checkable while the streaming
  * semantics (watermarks, late data, state) are pinned by ScalaTest specs.
  */
object StreamTwin {
  import Tables._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), moneySum(col("value")).as("sum_val"))
        .select(col("window.start").as("wstart"), col("event_type"),
          col("cnt"), col("sum_val"))
        .orderBy("wstart", "event_type")),

    "stream_sliding" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("cnt"), moneySum(col("value")).as("sum_val"))
        .select(col("window.start").as("wstart"), col("cnt"), col("sum_val"))
        .orderBy("wstart")),

    "stream_session" -> ((s, d) =>
      events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"), col("n_events"))
        .orderBy("user_id", "session_start")),

    // twin of dropDuplicatesWithinWatermark: deterministic first-event pick
    "stream_dedup" -> ((s, d) =>
      events(s, d)
        .groupBy("user_id", "event_type")
        .agg(min(col("event_id")).as("first_event_id"),
          count(lit(1)).as("n_dups"))
        .orderBy("user_id", "event_type")),

    // twin of the mapGroupsWithState running per-user state: final state
    "stream_stateful" -> ((s, d) =>
      events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          moneySum(col("value")).as("total_value"),
          max(col("ts")).as("last_ts"))
        .orderBy("user_id")),

    // twin of the watermarked hourly count (late-row drop is pinned by the
    // streaming spec; batch sees all rows) — distinct users per hour
    "stream_watermark_late" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("user_id")).as("n_users"))
        .select(col("window.start").as("wstart"), col("cnt"), col("n_users"))
        .orderBy("wstart"))
  )

  def oracle: Map[String, String] = Map(
    "stream_tumbling" ->
      s"""SELECT date_trunc('hour', ts) AS wstart, event_type,
         |count(*) AS cnt, ${sql.moneySum("value")} AS sum_val
         |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin,
    "stream_sliding" ->
      s"""SELECT time_bucket(INTERVAL '15 minutes', ts)
         |    - k * INTERVAL '15 minutes' AS wstart,
         |count(*) AS cnt, ${sql.moneySum("value")} AS sum_val
         |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) t(k)
         |GROUP BY 1 ORDER BY wstart""".stripMargin,
    "stream_session" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "stream_dedup" ->
      """SELECT user_id, event_type, min(event_id) AS first_event_id,
        |count(*) AS n_dups
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "stream_stateful" ->
      s"""SELECT user_id, count(*) AS n_events,
         |${sql.moneySum("value")} AS total_value, max(ts) AS last_ts
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "stream_watermark_late" ->
      """SELECT date_trunc('hour', ts) AS wstart, count(*) AS cnt,
        |count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY wstart""".stripMargin
  )
}
