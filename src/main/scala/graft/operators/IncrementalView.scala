package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance from a row-level change
  * feed: refresh a grouped sum/count aggregate using ONLY the CDC diff
  * between two table versions — never rescanning the base table. For
  * commutative-group aggregates an 'upsert' post-image adds and a
  * 'delete' pre-image subtracts; groups whose row count reaches zero
  * leave the view. Sums run in DECIMAL so incremental maintenance is
  * BIT-EXACT against a full recompute (float addition is
  * order-sensitive; decimal addition is associative, so the refresh
  * path and the rebuild path cannot drift).
  *
  * Reference analogue: none — engine-completeness warehouse surface,
  * the consumer `SnapshotTable.changes` (q4C) exists for. The refresh
  * cost is O(|changes|): one groupBy of the feed on the view key plus
  * one outer join against the current view, both hash-partitioned on
  * the key. Paired with the manifest-diff change feed (which reads
  * only touched FILES), keeping a 100 TB table's dashboard aggregate
  * current costs the day's churn, not the table.
  */
object IncrementalView {

  /** The materialized view: one row per key with the DECIMAL(18,4) sum
    * of `valueCol` and the row count. An all-NULL (or empty-after-
    * nulls) group sums to 0, not NULL, so the rebuild path and the
    * incremental path (which must coalesce to add deltas) agree
    * exactly. */
  def sumCountView(table: DataFrame, keyCols: Seq[String],
                   valueCol: String): DataFrame =
    table.groupBy(keyCols.map(col): _*)
      .agg(coalesce(sum(col(valueCol).cast("decimal(18,4)")), lit(0))
          .cast("decimal(18,4)").as(s"sum_$valueCol"),
        count(lit(1)).as("n_rows"))

  /** Apply a change feed (the table's columns plus `change_type` in
    * upsert|delete — the `SnapshotTable.changes` shape) to a view
    * produced by [[sumCountView]]. An updated row contributes one
    * delete pre-image and one upsert post-image, so its net effect on
    * `n_rows` is zero and on the sum is the value delta. Keys absent
    * from the feed pass through untouched; keys whose row count drops
    * to zero are removed. */
  def applyChanges(view: DataFrame, changes: DataFrame, keyCols: Seq[String],
                   valueCol: String): DataFrame = {
    val sgn = when(col("change_type") === "upsert", 1L)
      .when(col("change_type") === "delete", -1L)
    val delta = changes.groupBy(keyCols.map(col): _*)
      .agg(sum(sgn * col(valueCol).cast("decimal(18,4)")).as("__dsum"),
        sum(sgn).as("__dn"))
    val sumName = s"sum_$valueCol"
    val zero = lit(0).cast("decimal(18,4)")
    view.join(delta, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col(sumName), zero) + coalesce(col("__dsum"), zero))
          .cast("decimal(18,4)").as(sumName),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n_rows")): _*)
      .filter(col("n_rows") > 0)
  }

  // --- min/max: the invertibility boundary -------------------------------
  // sum/count form a commutative GROUP (every delta has an inverse), so
  // applyChanges never reads the base table. min/max form only a
  // MONOID: an upsert folds in for free (least/greatest), but deleting
  // a key's current extremum cannot be undone from the view alone — the
  // second-smallest value isn't there. The standard answers are a
  // heap/sketch per key (approximate or memory-heavy) or a per-key
  // rebuild on retraction; [[applyChangesMinMax]] takes the rebuild,
  // scoped to EXACTLY the keys whose extremum was touched: everything
  // else refreshes from the feed, and the rebuild's base-table read is
  // a semi-join on the affected keys (partition pruning + pushdown
  // apply, and churn is the day's, not the table's).

  /** The min/max materialized view: one row per key with min, max (of
    * `valueCol` as double — selection, not arithmetic, so exact) and
    * the row count. All-null groups carry null extrema, like plain
    * SQL MIN/MAX. */
  def minMaxView(table: DataFrame, keyCols: Seq[String],
                 valueCol: String): DataFrame =
    table.groupBy(keyCols.map(col): _*)
      .agg(min(col(valueCol).cast("double")).as(s"min_$valueCol"),
        max(col(valueCol).cast("double")).as(s"max_$valueCol"),
        count(lit(1)).as("n_rows"))

  /** Apply a change feed to a [[minMaxView]]. `current` is the table
    * AS OF the feed's end version (`SnapshotTable.scan` of `toV`): it
    * is read ONLY through a semi-join on the keys whose current
    * extremum was deleted — for every other key the refresh is
    * feed-only, exactly like [[applyChanges]]. Upserts fold in via
    * least/greatest; keys whose row count reaches zero leave the
    * view. */
  def applyChangesMinMax(view: DataFrame, changes: DataFrame,
                         current: DataFrame, keyCols: Seq[String],
                         valueCol: String): DataFrame = {
    val isU = col("change_type") === "upsert"
    val v = col(valueCol).cast("double")
    val delta = changes.groupBy(keyCols.map(col): _*)
      .agg(min(when(isU, v)).as("__umin"), max(when(isU, v)).as("__umax"),
        min(when(!isU, v)).as("__dmin"), max(when(!isU, v)).as("__dmax"),
        sum(when(isU, 1L).otherwise(-1L)).as("__dn"))
    val (minName, maxName) = (s"min_$valueCol", s"max_$valueCol")
    val newN = (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
    // a deleted value AT the current extremum invalidates it (ties
    // included: the view can't know how many rows held the extremum)
    val touched = col("__dmin").isNotNull && col(minName).isNotNull &&
      (col("__dmin") <= col(minName) || col("__dmax") >= col(maxName))
    val live = view.join(delta, keyCols, "full_outer")
      .withColumn("__n", newN).filter(col("__n") > 0)
      .withColumn("__rebuild", coalesce(touched, lit(false)))
    val fed = live.filter(!col("__rebuild"))
      .select(keyCols.map(col) ++ Seq(
        least(col(minName), col("__umin")).as(minName),
        greatest(col(maxName), col("__umax")).as(maxName),
        col("__n").as("n_rows")): _*)
    val rebuilt = minMaxView(
      current.join(live.filter(col("__rebuild")).select(keyCols.map(col): _*),
        keyCols, "left_semi"),
      keyCols, valueCol)
    fed.unionByName(rebuilt)
  }
}
