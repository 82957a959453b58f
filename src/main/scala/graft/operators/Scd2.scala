package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history builder — the classic
  * warehouse operator the reference's truncate-and-load protocol
  * (`etl/loader.py:159-348`) sidesteps by keeping only the newest
  * snapshot: collapse an ordered change log into validity intervals
  * `[valid_from, valid_to)` per key, one row per run of identical
  * tracked attributes, newest interval open-ended (`is_current`).
  *
  * Shape at scale: every step — the change-detection window, the
  * run-collapsing aggregate, and the interval-closing window — clusters
  * by `keyCols`, so Catalyst plans ONE hash exchange and reuses its
  * partitioning across all three (HashPartitioning(key) satisfies the
  * (key, run) grouping). Nothing is driver-side and nothing is
  * quadratic; a 100 TB change log shuffles once.
  */
object Scd2 {

  /** @param orderCol  event-time column ordering each key's history
    * @param tieCol    deterministic tie-break within equal `orderCol`
    * @param attrCols  tracked attributes; a change in ANY opens a new
    *                  interval (null-safe comparison)
    */
  def history(df: DataFrame, keyCols: Seq[String], orderCol: String,
              tieCol: String, attrCols: Seq[String]): DataFrame = {
    val reserved = Seq("__run", "valid_from", "valid_to", "version_seq",
      "n_rows", "is_current")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"input already carries reserved column $r"))

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol), col(tieCol))
    val attrs = struct(attrCols.map(col): _*)
    // run boundary: first row per key, or any tracked attr changed
    val boundary = when(lag(attrs, 1).over(w).isNull ||
      !(lag(attrs, 1).over(w) <=> attrs), 1L).otherwise(0L)
    val runs = df.withColumn("__run", sum(boundary).over(w))

    val aggs = min(col(orderCol)).as("valid_from") +:
      count(lit(1)).as("n_rows") +:
      attrCols.map(c => first(col(c)).as(c)) // constant within a run
    val intervals = runs
      .groupBy((keyCols.map(col) :+ col("__run")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("__run", "version_seq")

    val wk = Window.partitionBy(keyCols.map(col): _*).orderBy("version_seq")
    intervals
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wk))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
