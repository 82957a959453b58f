package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
              tieCol: String, attrCols: Seq[String]): DataFrame =
    historyWeighted(df, keyCols, orderCol, col(tieCol), attrCols, lit(1L))

  /** Run-collapse core: like [[history]] but each input row carries a
    * `weight` summed into `n_rows` (an already-collapsed interval
    * re-enters as one pseudo-row weighing its original row count). */
  private def historyWeighted(df: DataFrame, keyCols: Seq[String],
                              orderCol: String, tieExpr: Column,
                              attrCols: Seq[String], weight: Column): DataFrame = {
    val reserved = Seq("__run", "valid_from", "valid_to", "version_seq",
      "n_rows", "is_current")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"input already carries reserved column $r"))

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol), tieExpr)
    val attrs = struct(attrCols.map(col): _*)
    // run boundary: first row per key, or any tracked attr changed
    val boundary = when(lag(attrs, 1).over(w).isNull ||
      !(lag(attrs, 1).over(w) <=> attrs), 1L).otherwise(0L)
    val runs = df.withColumn("__run", sum(boundary).over(w))
      .withColumn("__w", weight)

    val aggs = min(col(orderCol)).as("valid_from") +:
      sum(col("__w")).as("n_rows") +:
      attrCols.map(c => first(col(c)).as(c)) // constant within a run
    val intervals = runs
      .groupBy((keyCols.map(col) :+ col("__run")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("__run", "version_seq")

    val wk = Window.partitionBy(keyCols.map(col): _*).orderBy("version_seq")
    intervals
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wk))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols.map(col) ++ Seq(col("version_seq"), col("valid_from"),
        col("valid_to")) ++ attrCols.map(col) ++
        Seq(col("n_rows"), col("is_current"))): _*)
  }

  /** Incremental maintenance: fold a new change batch into an existing
    * SCD2 `history` WITHOUT the original log. Affected keys (semi-join
    * on the batch) re-enter the run collapse as weighted pseudo-rows —
    * one per interval, weighing its `n_rows` — unioned with the batch;
    * untouched keys carry through untouched. The result is
    * row-identical to rebuilding from the full log, which is exactly
    * what the q4O oracle checks (incremental == full rebuild, hashed).
    *
    * Requires every batch row to sort AFTER the affected keys' existing
    * `valid_from`s (no late data — the standard warehouse cutoff
    * contract); the catalogued instance splits on a strict date cutoff.
    */
  def applyBatch(history: DataFrame, batch: DataFrame, keyCols: Seq[String],
                 orderCol: String, tieCol: String,
                 attrCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val batchKeys = batch.select(keys: _*).distinct()
    val affected = history.join(batchKeys, keyCols, "left_semi")
    val untouched = history.join(batchKeys, keyCols, "left_anti")

    // pseudo-log: one weighted row per existing interval. Ties within
    // a key: pseudo rows order by version_seq, batch rows by tieCol
    // rank; the two sets never tie on orderCol (cutoff contract).
    val pseudo = affected.select((keys ++ Seq(
      col("valid_from").as(orderCol), col("version_seq").as("__tie"),
      col("n_rows").as("__weight")) ++ attrCols.map(col)): _*)
    val wb = Window.partitionBy(keys: _*).orderBy(col(orderCol), col(tieCol))
    val batchRows = batch.select((keys ++ Seq(
      col(orderCol), row_number().over(wb).cast("long").as("__tie"),
      lit(1L).as("__weight")) ++ attrCols.map(col)): _*)

    val rebuilt = historyWeighted(pseudo.unionByName(batchRows), keyCols,
      orderCol, col("__tie"), attrCols, col("__weight"))
      .drop("__tie", "__weight")
    untouched.unionByName(rebuilt)
  }
}
