package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D2: keep-latest deduplication (`etl/pipeline.py:56` — sort by
  * `creation_time` desc then `drop_duplicates(keep='first')` over all
  * other columns).
  *
  * Spark has no input order, so "sort then drop first" is expressed as
  * the canonical window idiom: `row_number()` partitioned by the payload
  * columns, ordered by the recency column descending, keep rank 1. The
  * pandas version breaks `creation_time` ties by original input order —
  * not reproducible distributedly — so callers supply deterministic
  * `tiebreakers` (e.g. a unique id, descending) to pin tie behavior; the
  * DuckDB oracle uses the same ORDER BY.
  *
  * Scale: one hash-partition shuffle on the payload key; no global sort
  * (the reference's `sort_values` over the whole frame disappears —
  * ordering is only ever needed within a key group).
  */
object Dedupe {

  def keepLatest(df: DataFrame, payloadCols: Seq[String], recencyCol: String,
                 tiebreakers: Seq[Column] = Nil): DataFrame = {
    val w = Window
      .partitionBy(payloadCols.map(col): _*)
      .orderBy(col(recencyCol).desc_nulls_last +: tiebreakers: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** D2 exactly as the pipeline uses it: payload = all columns except
    * the recency column. Ties need no tiebreaker: rows tied on recency
    * are identical in every column, so any survivor is the same row.
    *
    * Deliberately the window form, not `groupBy(payload).agg(max)`:
    * with a wide, mostly-unique payload a hash aggregate builds a
    * near-full-size hash map per task on both sides of the shuffle
    * (partial aggregation reduces nothing) and spills; the window sorts
    * each post-shuffle partition once and streams. */
  def keepLatestAllCols(df: DataFrame, recencyCol: String): DataFrame =
    keepLatest(df, df.columns.filterNot(_ == recencyCol).toSeq, recencyCol)

  /** D1: plain distinct (the reference pushes `SELECT DISTINCT` into the
    * source scan, `etl/extractor.py:67-120`); Catalyst plans a
    * partial+final hash aggregate (map-side combine before shuffle). */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()
}
