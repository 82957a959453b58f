package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-data table access (S1-S3). Each table is one parquet file under
  * the scale-factor dir; Spark's vectorized parquet reader + Catalyst
  * pushdown make `scanFiltered` the analogue of the reference's
  * server-side `SELECT DISTINCT … WHERE …` (`etl/extractor.py:42-58`):
  * predicates and column pruning reach the scan, DISTINCT becomes a
  * partial/final hash aggregate.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS); Spark reads it as long nanos
    // (spark.sql.legacy.parquet.nanosAsLong) — convert to a microsecond
    // timestamp by floor division, matching DuckDB's ns->us truncation.
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case None => df
    }
  }

  /** S1: filtered + DISTINCT scan. */
  def scanFiltered(spark: SparkSession, sfDir: String, name: String,
                   predicate: org.apache.spark.sql.Column, distinct: Boolean = true): DataFrame = {
    val base = table(spark, sfDir, name).filter(predicate)
    if (distinct) base.distinct() else base
  }

  /** S2: deterministic watermark literal (the reference embeds
    * `now - 12h` as an epoch literal in the scan predicate,
    * `etl/extractor.py:8-17`; tests parameterize the "now"). */
  def watermarkPredicate(tsCol: String, nowEpoch: Long, lookbackHours: Int = 12): org.apache.spark.sql.Column =
    col(tsCol) > to_timestamp(lit(nowEpoch - lookbackHours * 3600L))
}
