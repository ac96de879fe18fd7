package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time window operators (SURVEY.md §2.8 note: the engine exposes
  * tumbling/sliding/session windows; the reference's only windowing is
  * the 2-s RMS segmentation). Batch forms here with DuckDB oracles; the
  * streaming forms (watermark + memory sink) are covered in
  * StreamingSpec.
  */
object TimeWindows {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling 1-hour windows over event time.
    "q32_tumbling_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("win_start"),
          col("event_type"), col("n"), col("total"))
        .orderBy("win_start", "event_type")
    }),

    // Sliding 1-hour windows every 30 minutes (each event lands in 2).
    "q73_sliding_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("win_start"),
          col("n"), col("total"))
        .orderBy("win_start")
    }),

    // Session windows with a 30-minute inactivity gap, per user.
    "q33_session_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          col("n_events"), col("total"))
        .orderBy("user_id", "session_start")
    })
  )

  def oracle: Map[String, String] = Map(
    "q32_tumbling_window" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
        |    '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,

    // Hop emulation: every event joins each of its 2 candidate window
    // starts (time_bucket by the slide, minus j slides), filtered to
    // containment. Both engines half-hour-align their buckets.
    "q73_sliding_window" ->
      """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
        |  COUNT(*) AS n, ROUND(SUM(value), 2) AS total
        |FROM (
        |  SELECT ts, value,
        |    time_bucket(INTERVAL '30 minutes', ts)
        |      - TO_MINUTES(CAST(j * 30 AS BIGINT)) AS ws
        |  FROM events, range(2) t(j))
        |WHERE ts >= ws AND ts < ws + INTERVAL '60 minutes'
        |GROUP BY ws ORDER BY win_start""".stripMargin,

    // Gaps-and-islands with exact epoch arithmetic (matches Spark's
    // microsecond comparison; gap >= 1800 s starts a new session).
    "q33_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800.0
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total
        |FROM numbered GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin
  )
}
