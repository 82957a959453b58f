package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch operators: gap-based sessionization and tumbling
  * time-window aggregation.
  *
  * Sessionization is the classic two-window construction: lag() marks
  * session starts, a running sum assigns session ids — both windows
  * share one partitioning by user, so the whole operator costs a single
  * shuffle. At 100 TB this is the right shape: no self-join, state
  * bounded per user partition. (The Structured Streaming analogue lives
  * in graft.streaming.)
  */
object Sessionize {

  /** Assign session ids per user with a max inactivity gap, then
    * aggregate one row per session. Timestamps are compared in epoch
    * microseconds (exact integer arithmetic). */
  def sessions(events: DataFrame, gapMinutes: Int,
               userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    val marked = events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__prev", lag(col("__us"), 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull || col("__us") - col("__prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    marked.groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col("__us")).as("session_start_us"),
        max(col("__us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
  }

  /** Tumbling-window aggregation (hourly by default). */
  def tumbling(events: DataFrame, unit: String = "hour",
               tsCol: String = "ts"): DataFrame =
    events.groupBy(date_trunc(unit, col(tsCol)).as("window_start"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))

  /** Sliding-window aggregation via Spark's `window(ts, width, slide)`:
    * each event contributes to width/slide overlapping windows — the
    * smoothed-rate view tumbling windows cannot give. Still one
    * shuffle; the per-event window fan-out is plan-side (Expand), and
    * the decimal-cast sum keeps parallel aggregation bit-exact. */
  def sliding(events: DataFrame, width: String = "1 hour",
              slide: String = "30 minutes", tsCol: String = "ts"): DataFrame =
    events.groupBy(window(col(tsCol), width, slide).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("n_events"), col("sum_value"))

  /** Hourly resample with gap filling: build each group's complete
    * hour grid between its first and last event (a distributed
    * `sequence` explode — the grid is generated inside the plan, per
    * group, never on the driver), left-join the observed aggregates,
    * zero-fill the empty hours, and forward-fill the last observed
    * sum (`last(..., ignoreNulls)` running window). Time-series
    * feature pipelines need the dense grid; naive groupBy silently
    * skips empty buckets. One shuffle keyed by the group serves the
    * aggregate, the grid join, and the forward-fill window.
    * Output: (groupCol, hour, n, sum_value, carried_sum). */
  def gapFillHourly(events: DataFrame, groupCol: String,
                    valueCol: String = "value", tsCol: String = "ts"): DataFrame = {
    val hourly = events
      .groupBy(col(groupCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("__sv"))
    val grid = hourly.groupBy(col(groupCol))
      .agg(min(col("hour")).as("__lo"), max(col("hour")).as("__hi"))
      .select(col(groupCol),
        explode(sequence(col("__lo"), col("__hi"),
          expr("interval 1 hour"))).as("hour"))
    val wff = Window.partitionBy(col(groupCol)).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq(groupCol, "hour"), "left")
      .select(col(groupCol), col("hour"),
        coalesce(col("__n"), lit(0L)).as("n"),
        coalesce(col("__sv"), lit(0.0)).as("sum_value"),
        last(col("__sv"), ignoreNulls = true).over(wff).as("carried_sum"))
  }
}
