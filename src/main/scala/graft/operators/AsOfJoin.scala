package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: attach to each left row the single right row
  * with the same key and the greatest right timestamp `<=` the left
  * row's timestamp (optionally only if it is within a tolerance).
  *
  * This is the kdb `aj` / pandas `merge_asof` operator, which Spark
  * has no native form of. The naive SQL rendering is an inequality
  * join + per-left-row top-1 — Catalyst plans the inequality join as
  * a nested-loop, O(|L|·|R|) per key, which is unusable at scale.
  * This implementation instead union-tags both sides and runs ONE
  * window over the key partitioning, ordered by (time, side), carrying
  * the most recent right payload forward with `last(_, ignoreNulls)`:
  *
  *   - exactly one shuffle (the window exchange), no join at all;
  *   - running state per key is one row's worth of right payload, so a
  *     hot key costs a sort, never a quadratic pair blowup;
  *   - right rows sort before left rows at equal timestamps, making
  *     the match inclusive (`left.ts >= right.ts`), the same tie rule
  *     as DuckDB's `ASOF JOIN` and pandas `merge_asof`.
  *
  * Precondition: the right side must be unique per (key, ts) — the
  * "latest of several right rows at the identical instant" is not
  * well-defined across engines otherwise. Dedup upstream (e.g.
  * [[Dedupe]] keep-latest) when the feed can repeat timestamps.
  */
object AsOfJoin {

  /** @param rightValueCols right columns to attach (each emitted as
    *                       `refPrefix + name`); the right row's
    *                       timestamp is always attached as
    *                       `refPrefix + tsCol + "_us"` (epoch micros)
    * @param toleranceUs    max staleness in microseconds; matches
    *                       older than this null out (Long.MaxValue =
    *                       unbounded). Left rows with no match keep
    *                       null refs — the join is left-outer. */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           tsCol: String, rightValueCols: Seq[String],
           refPrefix: String = "ref_",
           toleranceUs: Long = Long.MaxValue): DataFrame = {
    val leftCols = left.columns.toSeq
    val refTs = s"$refPrefix${tsCol}_us"
    val refCols = rightValueCols.map(refPrefix + _)

    // Unified schema via unionByName(allowMissingColumns): left rows
    // carry null refs, right rows carry null left payload, each typed
    // from the side that owns the column.
    val leftPayload = leftCols.filterNot(keyCols.contains)
    val l = left
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__side", lit(1))
    val r = right
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__side", lit(0))
      .select((keyCols :+ "__us" :+ "__side").map(col) ++
        (col("__us").as(refTs) +:
          rightValueCols.map(c => col(c).as(refPrefix + c))): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__us"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (refTs +: refCols).foldLeft(
      l.unionByName(r, allowMissingColumns = true)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }

    val fresh = col(refTs).isNotNull &&
      (col("__us") - col(refTs) <= toleranceUs)
    val out = refCols.foldLeft(carried.filter(col("__side") === 1)) {
      (df, c) => df.withColumn(c, when(fresh, col(c)))
    }.withColumn(refTs, when(fresh, col(refTs)))
    out.select((keyCols ++ leftPayload ++ (refTs +: refCols)).map(col): _*)
  }

  /** FORWARD as-of join: attach the single right row with the same key
    * and the SMALLEST right timestamp `>=` the left row's timestamp —
    * pandas `merge_asof(direction='forward')`, the "next event after"
    * shape (next maintenance window after an alert, next price tick
    * after an order). Mirror of [[asOf]]: one union-tagged window, no
    * join; left rows sort BEFORE right rows at equal timestamps so the
    * frame [current, following] sees the equal-instant right row and
    * the match is inclusive. `toleranceUs` bounds how far AHEAD the
    * match may be. Same right-side uniqueness precondition. */
  def asOfForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  tsCol: String, rightValueCols: Seq[String],
                  refPrefix: String = "ref_",
                  toleranceUs: Long = Long.MaxValue): DataFrame = {
    val leftCols = left.columns.toSeq
    val refTs = s"$refPrefix${tsCol}_us"
    val refCols = rightValueCols.map(refPrefix + _)
    val leftPayload = leftCols.filterNot(keyCols.contains)
    val l = left
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__side", lit(0))
    val r = right
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__side", lit(1))
      .select((keyCols :+ "__us" :+ "__side").map(col) ++
        (col("__us").as(refTs) +:
          rightValueCols.map(c => col(c).as(refPrefix + c))): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__us"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = (refTs +: refCols).foldLeft(
      l.unionByName(r, allowMissingColumns = true)) {
      (df, c) => df.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }

    val fresh = col(refTs).isNotNull &&
      (col(refTs) - col("__us") <= toleranceUs)
    val out = refCols.foldLeft(carried.filter(col("__side") === 0)) {
      (df, c) => df.withColumn(c, when(fresh, col(c)))
    }.withColumn(refTs, when(fresh, col(refTs)))
    out.select((keyCols ++ leftPayload ++ (refTs +: refCols)).map(col): _*)
  }
}
