package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Sessionize
import graft.sources.Tables

/** Event-stream batch analytics: gap sessionization (single shuffle,
  * two stacked windows) and tumbling-window aggregation.
  */
object EventQueries {

  private def duckHash(e: String): String = QueryDef.duckPolyHash(e)

  val all: Map[String, QueryDef] = Map(

    // §2.9 UDAF surface: KMV distinct-count sketch (custom
    // TypedImperativeAggregate). Deterministic by construction (min-k
    // hash set = commutative idempotent monoid), so the oracle
    // reproduces the estimate exactly.
    "q3A_distinct_sketch" -> QueryDef(
      (s, dir) => Tables.computeTable(s, dir, "events")
        .groupBy("event_type")
        .agg(graft.functions.cat.KmvDistinct(col("user_id"), 64).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .orderBy("event_type"),
      s"""WITH h0 AS (
        |  SELECT DISTINCT event_type, ${duckHash("CAST(user_id AS VARCHAR)")} AS h
        |  FROM events),
        |hv AS (
        |  SELECT DISTINCT event_type,
        |         (((h * 48271 + 11) % 1000000007) * 48271 + 11) % 1000000007 AS h
        |  FROM h0),
        |rk AS (
        |  SELECT event_type, h,
        |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS r,
        |         COUNT(*) OVER (PARTITION BY event_type) AS nd
        |  FROM hv),
        |agg AS (
        |  SELECT event_type, max(nd) AS nd,
        |         max(CASE WHEN r = 64 THEN h END) AS kth
        |  FROM rk GROUP BY 1)
        |SELECT a.event_type,
        |       CASE WHEN a.nd < 64 THEN CAST(a.nd AS DOUBLE)
        |            ELSE 63 * 1000000007.0 / CAST(a.kth AS DOUBLE) END AS approx_users,
        |       e.exact_users
        |FROM agg a JOIN (SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
        |                 FROM events GROUP BY 1) e USING (event_type)
        |ORDER BY event_type""".stripMargin),

    // Running window aggregates (W-family completeness): cumulative sum
    // and a trailing 3-row moving average per user in event order.
    "q3G_running_windows" -> QueryDef(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val win3 = w.rowsBetween(-2, 0)
        Tables.computeTable(s, dir, "events")
          .filter(col("user_id") % 25 === 0)
          .select(col("user_id"), col("event_id"),
            sum(col("value").cast("decimal(18,4)")).over(w).cast("double").as("running_sum"),
            (sum(col("value").cast("decimal(18,4)")).over(win3).cast("double") /
              count(lit(1)).over(win3).cast("double")).as("avg3"),
            lag(col("event_id"), 1).over(w).as("prev_event"))
          .orderBy("user_id", "event_id")
      },
      """SELECT user_id, event_id,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS running_sum,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w3 AS DOUBLE)
        |         / CAST(COUNT(*) OVER w3 AS DOUBLE) AS avg3,
        |       lag(event_id, 1) OVER w AS prev_event
        |FROM events WHERE user_id % 25 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS UNBOUNDED PRECEDING),
        |       w3 AS (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin),

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
