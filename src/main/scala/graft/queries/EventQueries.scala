package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Sessionize
import graft.sources.Tables

/** Event-stream batch analytics: gap sessionization (single shuffle,
  * two stacked windows) and tumbling-window aggregation.
  */
object EventQueries {

  val all: Map[String, QueryDef] = Map(

    "q30_sessionize" -> QueryDef(
      (s, dir) => Sessionize.sessions(Tables.computeTable(s, dir, "events"), gapMinutes = 30)
        .orderBy("user_id", "session_seq"),
      """WITH e AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS nw
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |x AS (
        |  SELECT *, CAST(SUM(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM m)
        |SELECT user_id, session_seq,
        |       min(us) AS session_start_us, max(us) AS session_end_us,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM x GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin),

    "q31_window_hourly" -> QueryDef(
      (s, dir) => Sessionize.tumbling(Tables.computeTable(s, dir, "events"), "hour")
        .orderBy("window_start"),
      """SELECT date_trunc('hour', ts) AS window_start,
        |       COUNT(*) AS n_events,
        |       COUNT(DISTINCT user_id) AS n_users,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY window_start""".stripMargin)
  )
}
