package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Sessionize
import graft.sources.Tables
import graft.streaming.Replay.BoundedReplay

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
        |FROM events GROUP BY 1 ORDER BY window_start""".stripMargin),

    // Sliding windows (1h width / 30m slide): every event lands in two
    // overlapping windows. The oracle expands each event to its two
    // slide-aligned window starts.
    "q45_sliding_windows" -> QueryDef(
      (s, dir) => Sessionize.sliding(Tables.computeTable(s, dir, "events"),
          width = "1 hour", slide = "30 minutes")
        .orderBy("window_start"),
      """WITH e AS (
        |  SELECT epoch_us(ts) // 1000000 AS sec, value FROM events),
        |w AS (
        |  SELECT (sec // 1800) * 1800 - k * 1800 AS ws, value
        |  FROM e, UNNEST(range(0, 2)) AS u(k))
        |SELECT make_timestamp(ws * 1000000) AS window_start,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY ws ORDER BY window_start""".stripMargin),

    // Backward as-of join (kdb aj / pandas merge_asof): every
    // non-signup event picks up its user's most recent prior (or
    // same-instant) signup event. Single-shuffle union+window form —
    // no inequality join anywhere in the plan. Oracle is DuckDB's
    // native ASOF LEFT JOIN on epoch-micro keys.
    "q3L_asof_join" -> QueryDef(
      (s, dir) => {
        val ev = Tables.computeTable(s, dir, "events")
        val left = ev.filter(col("event_type") =!= "signup")
          .select("event_id", "user_id", "event_type", "ts")
        val right = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"),
            col("event_id").as("signup_event"), col("value").as("signup_value"))
        graft.operators.AsOfJoin.asOf(left, right, Seq("user_id"), "ts",
            Seq("signup_event", "signup_value"))
          .select("event_id", "user_id", "event_type",
            "ref_ts_us", "ref_signup_event", "ref_signup_value")
          .orderBy("event_id")
      },
      """WITH l AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events WHERE event_type <> 'signup'),
        |r AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         event_id AS signup_event, value AS signup_value
        |  FROM events WHERE event_type = 'signup')
        |SELECT l.event_id, l.user_id, l.event_type,
        |       r.us AS ref_ts_us,
        |       r.signup_event AS ref_signup_event,
        |       r.signup_value AS ref_signup_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.us >= r.us
        |ORDER BY l.event_id""".stripMargin),

    // Point-in-interval range join: assign every event to the gap
    // session whose [start, end] window contains it. The equi-binned
    // index (1h bins) turns the inequality join into a hash join;
    // each qualifying pair meets in exactly one bin, so the rows need
    // no dedup. Oracle runs the plain BETWEEN join.
    "q3M_range_join" -> QueryDef(
      (s, dir) => {
        val ev = Tables.computeTable(s, dir, "events")
        val sessions = Sessionize.sessions(ev, gapMinutes = 30)
          .select("user_id", "session_seq", "session_start_us", "session_end_us")
        val points = ev.select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"))
        graft.operators.RangeJoin.pointInInterval(points, sessions,
            Seq("user_id"), "us", "session_start_us", "session_end_us",
            binWidth = 3600L * 1000000L)
          .select("event_id", "user_id", "session_seq", "session_start_us")
          .orderBy("event_id")
      },
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS nw
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |x AS (
        |  SELECT *, CAST(SUM(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM m),
        |s AS (
        |  SELECT user_id, session_seq, min(us) AS session_start_us,
        |         max(us) AS session_end_us
        |  FROM x GROUP BY user_id, session_seq)
        |SELECT e.event_id, e.user_id, s.session_seq, s.session_start_us
        |FROM e JOIN s ON e.user_id = s.user_id
        |              AND e.us BETWEEN s.session_start_us AND s.session_end_us
        |ORDER BY e.event_id""".stripMargin),

    // FORWARD as-of join (pandas merge_asof direction='forward'):
    // every non-signup event picks up its user's NEXT (or
    // same-instant) signup. Same single-shuffle union+window form as
    // q3L, frame flipped to [current, following]. Oracle is DuckDB's
    // native ASOF LEFT JOIN with the inequality reversed.
    "q6B_asof_forward" -> QueryDef(
      (s, dir) => {
        val ev = Tables.computeTable(s, dir, "events")
        val left = ev.filter(col("event_type") =!= "signup")
          .select("event_id", "user_id", "event_type", "ts")
        val right = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"),
            col("event_id").as("signup_event"), col("value").as("signup_value"))
        graft.operators.AsOfJoin.asOfForward(left, right, Seq("user_id"), "ts",
            Seq("signup_event", "signup_value"))
          .select("event_id", "user_id", "event_type",
            "ref_ts_us", "ref_signup_event", "ref_signup_value")
          .orderBy("event_id")
      },
      """WITH l AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events WHERE event_type <> 'signup'),
        |r AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         event_id AS signup_event, value AS signup_value
        |  FROM events WHERE event_type = 'signup')
        |SELECT l.event_id, l.user_id, l.event_type,
        |       r.us AS ref_ts_us,
        |       r.signup_event AS ref_signup_event,
        |       r.signup_value AS ref_signup_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.us <= r.us
        |ORDER BY l.event_id""".stripMargin),

    // INTERVAL-OVERLAP join: gap sessions × ±10-minute promo windows
    // around purchases. The equi-binned index turns the double
    // inequality into a hash join; each overlapping pair is emitted
    // only from the bin holding the overlap's START, so the rows are
    // exactly-once with no dedup (PlansSpec pins no cartesian).
    // Oracle runs the plain double-inequality join over the same
    // session CTE as q3M.
    "q6A_interval_overlap" -> QueryDef(
      (s, dir) => {
        val ev = Tables.computeTable(s, dir, "events")
        val sessions = Sessionize.sessions(ev, gapMinutes = 30)
          .select("user_id", "session_seq", "session_start_us", "session_end_us")
        val promos = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("promo_event"),
            (unix_micros(col("ts")) - 600L * 1000000L).as("promo_start_us"),
            (unix_micros(col("ts")) + 600L * 1000000L).as("promo_end_us"))
        graft.operators.RangeJoin.intervalOverlap(sessions, promos,
            Seq("user_id"), "session_start_us", "session_end_us",
            "promo_start_us", "promo_end_us", binWidth = 3600L * 1000000L)
          .select("user_id", "session_seq", "promo_event",
            "session_start_us", "promo_start_us")
          .orderBy("user_id", "session_seq", "promo_event")
      },
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS nw
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |x AS (
        |  SELECT *, CAST(SUM(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM m),
        |s AS (
        |  SELECT user_id, session_seq, min(us) AS session_start_us,
        |         max(us) AS session_end_us
        |  FROM x GROUP BY user_id, session_seq),
        |p AS (
        |  SELECT user_id, event_id AS promo_event,
        |         us - 600000000 AS promo_start_us,
        |         us + 600000000 AS promo_end_us
        |  FROM e WHERE event_type = 'purchase')
        |SELECT s.user_id, s.session_seq, p.promo_event,
        |       s.session_start_us, p.promo_start_us
        |FROM s JOIN p ON s.user_id = p.user_id
        |              AND s.session_start_us <= p.promo_end_us
        |              AND p.promo_start_us <= s.session_end_us
        |ORDER BY s.user_id, s.session_seq, p.promo_event""".stripMargin),

    // Bottom-k quantile sketch: the scale path for exact quantiles
    // (q3R). Min-k-by-hash is the same mergeable monoid as the KMV
    // sketch; WindowGroupLimit prunes to the local min-k before the
    // exchange. Exact integer hashing + nearest-rank value picks, so
    // the oracle replays it bit-for-bit.
    "q4J_sketch_quantiles" -> QueryDef(
      (s, dir) => graft.operators.Sampling.bottomKQuantiles(
          Tables.computeTable(s, dir, "events"),
          groupCols = Seq("event_type"), valueCol = "value",
          idCol = "event_id", k = 64, salt = "qsk")
        .orderBy("event_type"),
      s"""WITH h AS (
        |  SELECT event_type, event_id, value,
        |         ${QueryDef.duckSampleHash("event_id", "qsk")} AS __h
        |  FROM events),
        |s AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY event_type
        |                 ORDER BY __h, event_id) AS __srn
        |    FROM h) __t WHERE __srn <= 64),
        |r AS (
        |  SELECT event_type, value,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY value, event_id) AS __vr,
        |         COUNT(*) OVER (PARTITION BY event_type) AS __n
        |  FROM s)
        |SELECT event_type, count(*) AS n_sample,
        |       MAX(CASE WHEN __vr = round(0.25*(__n-1)) + 1 THEN value END) AS q25,
        |       MAX(CASE WHEN __vr = round(0.50*(__n-1)) + 1 THEN value END) AS q50,
        |       MAX(CASE WHEN __vr = round(0.75*(__n-1)) + 1 THEN value END) AS q75,
        |       MAX(CASE WHEN __vr = round(0.90*(__n-1)) + 1 THEN value END) AS q90
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin),

    // Hourly resample + gap fill: every hour between a type's first and
    // last event exists in the output — empty hours zero-filled, the
    // last observed hourly sum forward-filled. The grid is a
    // distributed sequence explode, never driver-side.
    "q4R_gap_fill" -> QueryDef(
      (s, dir) => Sessionize.gapFillHourly(
          Tables.computeTable(s, dir, "events"), groupCol = "event_type")
        .orderBy("event_type", "hour"),
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n,
        |         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
        |  FROM events GROUP BY 1, 2),
        |b AS (
        |  SELECT event_type, min(hour) AS lo, max(hour) AS hi
        |  FROM hourly GROUP BY 1),
        |grid AS (
        |  SELECT event_type,
        |         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        |  FROM b),
        |j AS (
        |  SELECT g.event_type, g.hour, h.n, h.sv
        |  FROM grid g LEFT JOIN hourly h USING (event_type, hour))
        |SELECT event_type, hour,
        |       coalesce(n, 0) AS n, coalesce(sv, 0.0) AS sum_value,
        |       last_value(sv IGNORE NULLS) OVER (PARTITION BY event_type
        |         ORDER BY hour ROWS UNBOUNDED PRECEDING) AS carried_sum
        |FROM j ORDER BY event_type, hour""".stripMargin),

    // Z-score anomaly flags: moments from exact decimal sums (a float
    // var_samp would flag differently depending on partitioning),
    // stats broadcast back, flags map-side.
    "q4P_anomaly_flags" -> QueryDef(
      (s, dir) => graft.operators.Profiler.anomalyFlags(
          Tables.computeTable(s, dir, "events"),
          groupCols = Seq("event_type"), valueCol = "value",
          idCol = "event_id", sigma = 3.0)
        .orderBy("event_id"),
      """WITH stat AS (
        |  SELECT event_type, COUNT(*) AS __n,
        |         CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS s1,
        |         CAST(SUM(CAST(value*value AS DECIMAL(38,12))) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value,
        |       round((e.value - s1/__n) / sqrt(s2/__n - (s1/__n)*(s1/__n)), 6) AS z
        |FROM events e JOIN stat USING (event_type)
        |WHERE abs((e.value - s1/__n) / sqrt(s2/__n - (s1/__n)*(s1/__n))) > 3
        |ORDER BY event_id""".stripMargin),

    // Ordered funnel: per user, how far through view -> click ->
    // purchase, each stage strictly after the earliest completion of
    // the previous one. Single exchange, chained conditional-min
    // windows; stage timestamps compared as epoch micros.
    "q4W_funnel" -> QueryDef(
      (s, dir) => graft.operators.Funnel.funnelStages(
          Tables.computeTable(s, dir, "events"),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .select(col("user_id"),
          unix_micros(col("ts_view")).as("view_us"),
          unix_micros(col("ts_click")).as("click_us"),
          unix_micros(col("ts_purchase")).as("purchase_us"),
          col("funnel_stage"))
        .orderBy("user_id"),
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        |s1 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
        |              OVER (PARTITION BY user_id) AS view_us
        |  FROM e),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND us > view_us
        |                     THEN us END)
        |              OVER (PARTITION BY user_id) AS click_us
        |  FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND us > click_us
        |                     THEN us END)
        |              OVER (PARTITION BY user_id) AS purchase_us
        |  FROM s2),
        |f AS (
        |  SELECT user_id, min(view_us) AS view_us, min(click_us) AS click_us,
        |         min(purchase_us) AS purchase_us
        |  FROM s3 GROUP BY user_id)
        |SELECT user_id, view_us, click_us, purchase_us,
        |       CAST(CASE WHEN view_us IS NULL THEN 0 ELSE 1 END
        |          + CASE WHEN click_us IS NULL THEN 0 ELSE 1 END
        |          + CASE WHEN purchase_us IS NULL THEN 0 ELSE 1 END
        |            AS INTEGER) AS funnel_stage
        |FROM f ORDER BY user_id""".stripMargin),

    // The STREAMING gap sessionizer under a DuckDB oracle — the third
    // stateful flow hash-gated (with q54/q55). Two chronological
    // chunks replay the events table; sessions close by the gap rule
    // when a newer event arrives and by event-time TIMEOUT when the
    // watermark passes the gap (the mid-replay timeout closure IS
    // correct gap semantics here, unlike q54's never-forgetting
    // funnel); a far-future sentinel event advances the final
    // watermark so every remaining open session flushes. session_seq
    // is recomputed in the sink compaction (a timeout removes per-user
    // state, so the flow's own counter restarts — content, not
    // numbering, is the flow's contract). Session sums left-fold in
    // event-time order, which the oracle reproduces with an ORDER
    // BY'd list_reduce (float addition is order-sensitive; the data
    // has no (user, ms) timestamp ties, so the order is total).
    "q58_stream_sessions" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val ev = Tables.computeTable(s, dir, "events")
          .select(col("user_id").cast("long"), col("ts"),
            col("value").cast("double"))
          .as[(Long, java.sql.Timestamp, Double)].boundedCollect()
        val midMs = 1705363200000L // 2024-01-16 00:00 UTC
        val (c1, c2) = ev.partition(_._2.getTime < midMs)
        val sentinel = (-1L, new java.sql.Timestamp(1709251200000L), 0.0) // 2024-03-01
        val in = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, java.sql.Timestamp, Double)](16)
        val out = graft.streaming.StreamingFlows.sessionize(
          in.toDF().toDF("user_id", "event_time", "value"),
          gapMinutes = 1440)
        val q = graft.streaming.StreamMeter.startWithPartitions(s, 8)(
          out.writeStream.format("memory").queryName("q58_sess_sink")
          .outputMode("append").start())
        try {
          import graft.streaming.StreamMeter.timed
          if (c1.nonEmpty) { in.addData(c1.toSeq: _*); timed("q58_stream_sessions")(q.processAllAvailable()) }
          if (c2.nonEmpty) { in.addData(c2.toSeq: _*); timed("q58_stream_sessions")(q.processAllAvailable()) }
          in.addData(sentinel); timed("q58_stream_sessions")(q.processAllAvailable())
        } finally q.stop()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("session_start_us")
        s.table("q58_sess_sink")
          .filter(col("user_id") >= 0) // drop the sentinel's own state
          .withColumn("session_seq", row_number().over(w).cast("long"))
          .select("user_id", "session_seq", "session_start_us",
            "session_end_us", "n_events", "sum_value")
          .orderBy("user_id", "session_seq")
      },
      """WITH e AS (
        |  SELECT user_id, (epoch_us(ts) // 1000) * 1000 AS us, value
        |  FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w > 86400000000
        |                 THEN 1 ELSE 0 END AS nw
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |r AS (
        |  SELECT *, CAST(SUM(nw) OVER (PARTITION BY user_id ORDER BY us
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM m),
        |g AS (
        |  SELECT user_id, session_seq,
        |         min(us) AS session_start_us, max(us) AS session_end_us,
        |         count(*) AS n_events,
        |         list_reduce(list(value ORDER BY us), (a, b) -> a + b)
        |           AS sum_value
        |  FROM r GROUP BY 1, 2)
        |SELECT user_id, session_seq, session_start_us, session_end_us,
        |       n_events, sum_value
        |FROM g ORDER BY user_id, session_seq""".stripMargin),

    // The streaming WINDOWED AGGREGATION under a DuckDB oracle: hourly
    // tumbling windows with count / KMV-distinct / decimal sum,
    // replayed in two chronological chunks; a far-future sentinel
    // advances the watermark so every real window finalizes (append
    // mode emits a window only when the watermark passes it — the
    // sentinel's own window never finalizes and so never pollutes the
    // sink). approx_count_distinct would be order-stable here but not
    // reproducible outside Spark; the KMV sketch is both, so the
    // oracle replays the same min-k arithmetic per window.
    "q5O_stream_windows" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val ev = Tables.computeTable(s, dir, "events")
          .select(col("user_id").cast("long"), col("ts"),
            col("value").cast("double"))
          .as[(Long, java.sql.Timestamp, Double)].boundedCollect()
        val midMs = 1705363200000L // 2024-01-16 00:00 UTC
        val (c1, c2) = ev.partition(_._2.getTime < midMs)
        val sentinel = (-1L, new java.sql.Timestamp(1709251200000L), 0.0) // 2024-03-01
        val in = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, java.sql.Timestamp, Double)](16)
        val out = graft.streaming.StreamingFlows.tumblingCountsSketch(
          in.toDF().toDF("user_id", "ts", "value"))
        val q = graft.streaming.StreamMeter.startWithPartitions(s, 8)(
          out.writeStream.format("memory").queryName("q5O_win_sink")
          .outputMode("append").start())
        try {
          import graft.streaming.StreamMeter.timed
          if (c1.nonEmpty) { in.addData(c1.toSeq: _*); timed("q5O_stream_windows")(q.processAllAvailable()) }
          if (c2.nonEmpty) { in.addData(c2.toSeq: _*); timed("q5O_stream_windows")(q.processAllAvailable()) }
          in.addData(sentinel); timed("q5O_stream_windows")(q.processAllAvailable())
        } finally q.stop()
        s.table("q5O_win_sink")
          .select(expr("unix_micros(window_start)").as("window_start_us"),
            col("n_events"), col("n_users_approx"), col("sum_value"))
          .orderBy("window_start_us")
      },
      s"""WITH e AS (
        |  SELECT user_id, (epoch_us(ts) // 3600000000) * 3600000000 AS ws,
        |         value
        |  FROM events),
        |h0 AS (
        |  SELECT DISTINCT ws, ${duckHash("CAST(user_id AS VARCHAR)")} AS h
        |  FROM e),
        |hv AS (
        |  SELECT DISTINCT ws,
        |         (((h * 48271 + 11) % 1000000007) * 48271 + 11) % 1000000007 AS h
        |  FROM h0),
        |rk AS (
        |  SELECT ws, h,
        |         row_number() OVER (PARTITION BY ws ORDER BY h) AS r,
        |         COUNT(*) OVER (PARTITION BY ws) AS nd
        |  FROM hv),
        |agg AS (
        |  SELECT ws, max(nd) AS nd, max(CASE WHEN r = 64 THEN h END) AS kth
        |  FROM rk GROUP BY 1),
        |base AS (
        |  SELECT ws, COUNT(*) AS n_events,
        |         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |  FROM e GROUP BY 1)
        |SELECT b.ws AS window_start_us, b.n_events,
        |       CASE WHEN a.nd < 64 THEN CAST(a.nd AS DOUBLE)
        |            ELSE 63 * 1000000007.0 / CAST(a.kth AS DOUBLE) END
        |         AS n_users_approx,
        |       b.sum_value
        |FROM base b JOIN agg a USING (ws) ORDER BY window_start_us""".stripMargin),

    // The TRANSACTIONAL STREAMING SINK under a DuckDB oracle: events
    // replay in two chunks through startSnapshotSink (foreachBatch →
    // one SnapshotTable append per micro-batch, batch-id-tagged for
    // replay detection). The gate is exactly-once-ness end to end: the
    // final table content must equal the input stream EXACTLY — a
    // duplicated batch (foreachBatch's documented at-least-once
    // window) or a dropped one would break the per-type counts and
    // id-checksums the oracle recomputes from the raw events.
    "q5P_stream_snapshot_sink" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val ev = Tables.computeTable(s, dir, "events")
          .select(col("event_id").cast("long"), col("user_id").cast("long"),
            col("event_type"))
          .as[(Long, Long, String)].boundedCollect()
        val (c1, c2) = ev.partition(_._1 % 2 == 0)
        val tmp = java.nio.file.Files.createTempDirectory("graft-q5p")
        val table = tmp.resolve("table").toString
        val ckpt = tmp.resolve("ckpt").toString
        val in = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, Long, String)](16)
        val q = graft.streaming.StreamMeter.startWithPartitions(s, 8)(
          graft.streaming.StreamingFlows.startSnapshotSink(
            in.toDF().toDF("event_id", "user_id", "event_type"),
            table, ckpt, statsCols = Seq("event_id")))
        try {
          import graft.streaming.StreamMeter.timed
          if (c1.nonEmpty) { in.addData(c1.toSeq: _*); timed("q5P_stream_snapshot_sink")(q.processAllAvailable()) }
          if (c2.nonEmpty) { in.addData(c2.toSeq: _*); timed("q5P_stream_snapshot_sink")(q.processAllAvailable()) }
        } finally q.stop()
        graft.sources.SnapshotTable.scan(s, table)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum("event_id").as("id_checksum"),
            countDistinct("event_id").as("n_distinct"))
          .orderBy("event_type")
      },
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
        |       COUNT(DISTINCT event_id) AS n_distinct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // The GATED sink + dead-letter queue under a DuckDB oracle: chunk
    // A is clean and commits to the main table; chunk B carries
    // planted nulls, fails the not-null expectation, and must land —
    // WHOLE and batch-atomic — in the quarantine table instead of
    // killing the stream or leaking partial rows into main. The
    // oracle recomputes both sides from the same chunk predicate: any
    // row on the wrong side (a leaked bad row, a quarantined good
    // batch, a replayed batch double-committing) breaks the counts
    // and checksums.
    "q5Q_stream_quarantine" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val ev = Tables.computeTable(s, dir, "events")
          .select(col("event_id").cast("long"), col("user_id").cast("long"),
            col("value").cast("double"))
          .as[(Long, Long, Double)].boundedCollect()
        val (clean, bad0) = ev.partition(_._1 % 2 == 0)
        // plant the violation: bad chunk rows carry a null value
        val bad = bad0.map(e => (e._1, e._2, None: Option[Double]))
        val tmp = java.nio.file.Files.createTempDirectory("graft-q5q")
        val in = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, Long, Option[Double])](16)
        val q = graft.streaming.StreamMeter.startWithPartitions(s, 8)(
          graft.streaming.StreamingFlows.startGatedSnapshotSink(
            in.toDF().toDF("event_id", "user_id", "value"),
            tmp.resolve("main").toString, tmp.resolve("quar").toString,
            tmp.resolve("ckpt").toString,
            checks = Seq(graft.operators.Expectations.notNull("value")),
            statsCols = Seq("event_id")))
        try {
          import graft.streaming.StreamMeter.timed
          if (clean.nonEmpty) {
            in.addData(clean.map(e => (e._1, e._2, Some(e._3): Option[Double])).toSeq: _*)
            timed("q5Q_stream_quarantine")(q.processAllAvailable())
          }
          if (bad.nonEmpty) {
            in.addData(bad.toSeq: _*)
            timed("q5Q_stream_quarantine")(q.processAllAvailable())
          }
        } finally q.stop()
        def side(d: java.nio.file.Path, name: String) =
          graft.sources.SnapshotTable.scan(s, d.toString)
            .agg(count(lit(1)).as("n"), sum("event_id").as("id_checksum"))
            .select(lit(name).as("side"), col("n"), col("id_checksum"))
        side(tmp.resolve("main"), "main")
          .unionAll(side(tmp.resolve("quar"), "quarantine"))
          .orderBy("side")
      },
      """SELECT 'main' AS side, COUNT(*) AS n,
        |       CAST(SUM(event_id) AS BIGINT) AS id_checksum
        |FROM events WHERE event_id % 2 = 0
        |UNION ALL
        |SELECT 'quarantine', COUNT(*),
        |       CAST(SUM(event_id) AS BIGINT)
        |FROM events WHERE event_id % 2 = 1
        |ORDER BY side""".stripMargin),

    // The PARITY streaming flow under a DuckDB oracle: the reference's
    // filtered DISTINCT scan as a stream (S1/S2/D1 —
    // StreamingFlows.watermarkDistinct), replayed in two chronological
    // chunks through a FILE SOURCE — the production ingestion shape
    // (a directory the stream tails), with no driver-side collect at
    // all: each chunk is written distributed as parquet, and
    // processAllAvailable() between writes makes "one chunk = one
    // micro-batch round" deterministic. Dedup state lives under the
    // watermark horizon; because chunk 2 sits entirely past chunk 1's
    // watermark, nothing is late-dropped and every cross-chunk
    // duplicate still finds its state row — so the emission set is
    // exactly DISTINCT, which is the oracle. (The flow's
    // bounded-state behavior — late drops and re-emission after
    // eviction — is StreamingSpec territory, as is file-replay ≡
    // MemoryStream-replay parity; this gate pins the cross-batch
    // dedup itself.)
    "q5N_stream_distinct" -> QueryDef(
      (s, dir) => {
        val ev = Tables.computeTable(s, dir, "events")
          .select(col("user_id").cast("long").as("user_id"), col("ts"),
            col("event_type"))
        // plant exact duplicates so the dedup provably fires, both
        // within and across chunks (the raw feed has none)
        val all = ev.unionAll(ev.filter(col("user_id") % 7 === 0))
        val midMs = 1705363200000L // 2024-01-16 00:00 UTC
        val cut = lit(midMs / 1000).cast("timestamp")
        val feed = java.nio.file.Files
          .createTempDirectory("q5N_feed").toString
        all.filter(col("ts") < cut).write.mode("overwrite").parquet(feed)
        val in = s.readStream.schema(all.schema).parquet(feed)
        val out = graft.streaming.StreamingFlows.watermarkDistinct(
          in, tsCol = "ts", lookback = "10 minutes",
          keyCols = Seq("user_id", "event_type"))
        val q = graft.streaming.StreamMeter.startWithPartitions(s, 8)(
          out.writeStream.format("memory").queryName("q5N_dist_sink")
          .outputMode("append").start())
        try {
          import graft.streaming.StreamMeter.timed
          timed("q5N_stream_distinct")(q.processAllAvailable())
          all.filter(col("ts") >= cut).write.mode("append").parquet(feed)
          timed("q5N_stream_distinct")(q.processAllAvailable())
        } finally q.stop()
        s.table("q5N_dist_sink")
          .select(col("user_id"), expr("unix_micros(ts)").as("us"),
            col("event_type"))
          .orderBy("user_id", "us", "event_type")
      },
      """SELECT DISTINCT user_id, epoch_us(ts) AS us, event_type
        |FROM events
        |ORDER BY user_id, us, event_type""".stripMargin),

    // Stream-STREAM interval join under a DuckDB oracle: views and
    // purchases replay as two MemoryStreams in chronological chunks;
    // each purchase pairs with the same user's views from the
    // preceding 60 minutes. Append-mode inner joins emit each match
    // exactly once when the later side arrives, so the emission set
    // equals the batch interval join REGARDLESS of chunking: a view
    // evicted at watermark w has view_ts + 60min < w, and every
    // later-chunk purchase has ts > w — eviction only discards state
    // that could never match again (that inequality is the whole
    // exactness argument). Timestamps flow through the join untouched
    // (no ms-grain state re-encoding), so the oracle compares at full
    // microsecond precision.
    "q5G_stream_interval_join" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        // user subset: the stream-stream join's state cost is the
        // product of both sides' in-window volume — a third of the
        // users exercises the full semantics (cross-chunk matches,
        // eviction, micros exactness) at a third of the harness wall
        val ev = Tables.computeTable(s, dir, "events")
          .filter(col("user_id") % 3 === 0)
          .select(col("user_id").cast("long"), col("ts"), col("event_type"))
          .as[(Long, java.sql.Timestamp, String)].boundedCollect()
        val midMs = 1705363200000L // 2024-01-16 00:00 UTC
        val views = ev.filter(_._3 == "view").map(e => (e._1, e._2))
        val purch = ev.filter(_._3 == "purchase").map(e => (e._1, e._2))
        val inV = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, java.sql.Timestamp)](16)
        val inP = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, java.sql.Timestamp)](16)
        val out = graft.streaming.StreamingFlows.intervalJoin(
            inV.toDF().toDF("user_id", "view_time"),
            inP.toDF().toDF("user_id", "purchase_time"),
            "user_id", "view_time", "purchase_time", windowMinutes = 60)
          .select(col("l.user_id").as("user_id"),
            expr("unix_micros(l.view_time)").as("view_us"),
            expr("unix_micros(r.purchase_time)").as("purchase_us"))
        // A stream-stream join commits FOUR state stores per side per
        // shuffle partition per micro-batch; at test scale that fixed
        // machinery dwarfs the data (6k rows/side) — size partitions
        // to state, not cores (12.3 s -> 3.4 s at sf0.1).
        val q = graft.streaming.StreamMeter.startWithPartitions(s, 4)(
          out.writeStream.format("memory").queryName("q5G_ij_sink")
            .outputMode("append").start())
        try {
          import graft.streaming.StreamMeter.timed
          def chunk(pred: Long => Boolean): Unit = {
            val v = views.filter(e => pred(e._2.getTime))
            val p = purch.filter(e => pred(e._2.getTime))
            if (v.nonEmpty) inV.addData(v.toSeq: _*)
            if (p.nonEmpty) inP.addData(p.toSeq: _*)
            timed("q5G_stream_interval_join")(q.processAllAvailable())
          }
          chunk(_ < midMs)
          chunk(_ >= midMs)
        } finally q.stop()
        s.table("q5G_ij_sink").orderBy("user_id", "view_us", "purchase_us")
      },
      """WITH v AS (
        |  SELECT user_id, epoch_us(ts) AS view_us
        |  FROM events WHERE event_type = 'view' AND user_id % 3 = 0),
        |p AS (
        |  SELECT user_id, epoch_us(ts) AS purchase_us
        |  FROM events WHERE event_type = 'purchase' AND user_id % 3 = 0)
        |SELECT v.user_id AS user_id, view_us, purchase_us
        |FROM v JOIN p ON v.user_id = p.user_id
        | AND purchase_us >= view_us
        | AND purchase_us <= view_us + 3600000000
        |ORDER BY user_id, view_us, purchase_us""".stripMargin),

    // The STREAMING funnel under the same oracle as the batch one
    // (q4W): the events table replays through MemoryStream in two
    // chronological chunks — cross-batch stateful updates, watermark
    // advancing between chunks — and the Update-mode output compacts
    // to each user's final row. Closes §2.10's "no oracle" column: the
    // stateful flow itself is now hash-gated against DuckDB, not just
    // spec-pinned against the batch operator. MemoryStream + collect
    // is harness plumbing (a deployment reads Kafka); the operator
    // under test is the flatMapGroupsWithState flow. Event times pass
    // through the flow at millisecond grain (java.sql.Timestamp
    // state), so the oracle truncates micros to ms. Chunks split on a
    // fixed mid-January instant: chunk-2 events all sit AFTER the
    // post-chunk-1 watermark, so nothing is ever late-dropped and
    // exactness holds under any lateness setting.
    "q54_stream_funnel" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val stages = Seq("view", "click", "purchase")
        val ev = Tables.computeTable(s, dir, "events")
          .select(col("user_id").cast("long"), col("ts"), col("event_type"))
          .as[(Long, java.sql.Timestamp, String)]
          .boundedCollect()
        val midMs = 1705363200000L // 2024-01-16 00:00 UTC (test data spans Jan 2024)
        val (c1, c2) = ev.partition(_._2.getTime < midMs)
        val in = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, java.sql.Timestamp, String)](16)
        // horizon must cover the whole replayed span (the tables span
        // Jan 2024): a mid-replay state expiry is correct STREAM
        // behavior (bounded state) but the oracle compares against the
        // full-history batch funnel, which never forgets
        val out = graft.streaming.StreamingFlows.funnelProgress(
          in.toDF().toDF("user_id", "event_time", "event_type"), stages,
          horizonMinutes = 60 * 24 * 60)
        val q = graft.streaming.StreamMeter.startWithPartitions(s, 8)(
          out.writeStream.format("memory").queryName("q54_funnel_sink")
          .outputMode("update").start())
        try {
          import graft.streaming.StreamMeter.timed
          if (c1.nonEmpty) { in.addData(c1.toSeq: _*); timed("q54_stream_funnel")(q.processAllAvailable()) }
          if (c2.nonEmpty) { in.addData(c2.toSeq: _*); timed("q54_stream_funnel")(q.processAllAvailable()) }
        } finally q.stop()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("update_seq").desc)
        def stageUs(i: Int, name: String) = {
          val c = element_at(col("stage_ts_us"), i)
          when(c =!= -1L, c).as(name)
        }
        s.table("q54_funnel_sink")
          .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
          .select(col("user_id"), stageUs(1, "view_us"), stageUs(2, "click_us"),
            stageUs(3, "purchase_us"), col("funnel_stage"))
          .orderBy("user_id")
      },
      """WITH e AS (
        |  SELECT user_id, (epoch_us(ts) // 1000) * 1000 AS us, event_type
        |  FROM events),
        |s1 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
        |              OVER (PARTITION BY user_id) AS view_us
        |  FROM e),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND us > view_us
        |                     THEN us END)
        |              OVER (PARTITION BY user_id) AS click_us
        |  FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND us > click_us
        |                     THEN us END)
        |              OVER (PARTITION BY user_id) AS purchase_us
        |  FROM s2),
        |f AS (
        |  SELECT user_id, min(view_us) AS view_us, min(click_us) AS click_us,
        |         min(purchase_us) AS purchase_us
        |  FROM s3 GROUP BY user_id)
        |SELECT user_id, view_us, click_us, purchase_us,
        |       CAST(CASE WHEN view_us IS NULL THEN 0 ELSE 1 END
        |          + CASE WHEN click_us IS NULL THEN 0 ELSE 1 END
        |          + CASE WHEN purchase_us IS NULL THEN 0 ELSE 1 END
        |            AS INTEGER) AS funnel_stage
        |FROM f ORDER BY user_id""".stripMargin),

    // Triangle counting on the co-order part-affinity graph (parts
    // appearing together in >= 2 orders). Degree-ordered orientation
    // ("compact-forward") caps wedge fan-out at O(sqrt(m)) per node —
    // hub-proof — and the output triple is sorted by id, so the oracle
    // can close triangles with the plain a<b ordering.
    "q4X_triangles" -> QueryDef(
      (s, dir) => {
        val li = Tables.computeTable(s, dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct()
        val edges = li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
          .agg(count(lit(1)).as("w"))
          .where(col("w") >= 2)
          .select("a", "b")
        graft.operators.Graph.triangleCounts(edges)
          .orderBy(col("n_tri").desc, col("node"))
      },
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |ew AS (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS w
        |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
        |                     AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2),
        |e AS (SELECT a, b FROM ew WHERE w >= 2),
        |t AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |            JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        |n AS (SELECT unnest([x, y, z]) AS node FROM t)
        |SELECT node, COUNT(*) AS n_tri FROM n GROUP BY node
        |ORDER BY n_tri DESC, node""".stripMargin),

    // PageRank on the same co-order graph, in scaled-integer arithmetic
    // (damping 17/20, truncating division) — bit-exact in any 64-bit
    // engine, so the oracle unrolls the same 5 iterations as CTEs.
    "q4Y_pagerank" -> QueryDef(
      (s, dir) => {
        val li = Tables.computeTable(s, dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct()
        val edges = li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
          .agg(count(lit(1)).as("w"))
          .where(col("w") >= 2)
          .select("a", "b")
        graft.operators.Graph.pageRankScaled(edges, iters = 5)
          .orderBy(col("rank_scaled").desc, col("node"))
      },
      {
        val head =
          """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            |ew AS (
            |  SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS w
            |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
            |                     AND x.l_partkey < y.l_partkey
            |  GROUP BY 1, 2),
            |e AS (SELECT a, b FROM ew WHERE w >= 2),
            |g AS (SELECT a AS src, b AS dst FROM e
            |      UNION ALL SELECT b, a FROM e),
            |d AS (SELECT src, COUNT(*) AS outdeg FROM g GROUP BY 1),
            |nn AS (SELECT COUNT(*) AS cnt FROM d),
            |r0 AS (SELECT src AS node, outdeg,
            |              1000000000000 // (SELECT cnt FROM nn) AS r
            |       FROM d)""".stripMargin
        val iters = (1 to 5).map { k =>
          s"""r$k AS (
             |  SELECT d.src AS node, d.outdeg,
             |         (3 * 1000000000000) // (20 * (SELECT cnt FROM nn))
             |           + (17 * COALESCE(c.s, 0)) // 20 AS r
             |  FROM d LEFT JOIN (
             |    SELECT g.dst AS dst, SUM(p.r // p.outdeg) AS s
             |    FROM g JOIN r${k - 1} p ON g.src = p.node
             |    GROUP BY g.dst) c
             |  ON d.src = c.dst)""".stripMargin
        }
        head + ",\n" + iters.mkString(",\n") +
          "\nSELECT node, CAST(r AS BIGINT) AS rank_scaled FROM r5" +
          "\nORDER BY rank_scaled DESC, node"
      }),

    // RANGE window frames (time-based, not row-count): trailing-1-hour
    // sum/count per user over the event-time axis — the frame
    // completeness piece q3G's ROWS frames don't cover. Epoch-second
    // keys make the frame arithmetic integral on both engines.
    "q52_range_frame" -> QueryDef(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("sec")
          .rangeBetween(-3599, 0)
        Tables.computeTable(s, dir, "events")
          .filter(col("user_id") % 25 === 0)
          .withColumn("sec", expr("unix_micros(ts) div 1000000"))
          .select(col("user_id"), col("event_id"), col("sec"),
            sum(col("value").cast("decimal(18,4)")).over(w).cast("double")
              .as("sum_1h"),
            count(lit(1)).over(w).as("n_1h"))
          .orderBy("user_id", "event_id")
      },
      """SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |         AS sum_1h,
        |       COUNT(*) OVER w AS n_1h
        |FROM events WHERE user_id % 25 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
        |             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin),

    // Graph-feature composite: degree + triangle participation +
    // PageRank per node of the co-order graph, one feature table —
    // the operator-interop form (edge list checkpointed once, three
    // consumers).
    "q50_graph_features" -> QueryDef(
      (s, dir) => {
        val li = Tables.computeTable(s, dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct()
        val edges = li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
          .agg(count(lit(1)).as("w"))
          .where(col("w") >= 2)
          .select("a", "b")
          .localCheckpoint() // three consumers below; derive the join once
        val deg = edges.select(col("a").as("node"))
          .unionAll(edges.select(col("b").as("node")))
          .groupBy("node").agg(count(lit(1)).as("degree"))
        val tri = graft.operators.Graph.triangleCounts(edges)
        val pr = graft.operators.Graph.pageRankScaled(edges, iters = 5)
        deg.join(tri, Seq("node"), "left")
          .join(pr, Seq("node"))
          .select(col("node"), col("degree"),
            coalesce(col("n_tri"), lit(0L)).as("n_tri"), col("rank_scaled"))
          .orderBy(col("rank_scaled").desc, col("node"))
      },
      {
        val head =
          """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            |ew AS (
            |  SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS w
            |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
            |                     AND x.l_partkey < y.l_partkey
            |  GROUP BY 1, 2),
            |e AS (SELECT a, b FROM ew WHERE w >= 2),
            |g AS (SELECT a AS src, b AS dst FROM e
            |      UNION ALL SELECT b, a FROM e),
            |d AS (SELECT src, COUNT(*) AS outdeg FROM g GROUP BY 1),
            |nn AS (SELECT COUNT(*) AS cnt FROM d),
            |t AS (
            |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
            |  FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
            |            JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
            |tn AS (SELECT unnest([x, y, z]) AS node FROM t),
            |tc AS (SELECT node, COUNT(*) AS n_tri FROM tn GROUP BY node),
            |r0 AS (SELECT src AS node, outdeg,
            |              1000000000000 // (SELECT cnt FROM nn) AS r
            |       FROM d)""".stripMargin
        val iters = (1 to 5).map { k =>
          s"""r$k AS (
             |  SELECT d.src AS node, d.outdeg,
             |         (3 * 1000000000000) // (20 * (SELECT cnt FROM nn))
             |           + (17 * COALESCE(c.s, 0)) // 20 AS r
             |  FROM d LEFT JOIN (
             |    SELECT g.dst AS dst, SUM(p.r // p.outdeg) AS s
             |    FROM g JOIN r${k - 1} p ON g.src = p.node
             |    GROUP BY g.dst) c
             |  ON d.src = c.dst)""".stripMargin
        }
        head + ",\n" + iters.mkString(",\n") +
          """
            |SELECT d.src AS node, CAST(d.outdeg AS BIGINT) AS degree,
            |       CAST(COALESCE(tc.n_tri, 0) AS BIGINT) AS n_tri,
            |       CAST(r.r AS BIGINT) AS rank_scaled
            |FROM d LEFT JOIN tc ON d.src = tc.node
            |       JOIN r5 r ON d.src = r.node
            |ORDER BY rank_scaled DESC, node""".stripMargin
      })
  )
}
