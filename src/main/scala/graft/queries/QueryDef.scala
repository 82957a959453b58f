package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: the Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle query over the
  * same parquet tables. Column names/aliases MUST match between the two
  * — the driver sorts columns by name before hashing values.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(fn: (SparkSession, String) => DataFrame, oracle: String): QueryDef =
    QueryDef(fn, Some(oracle))
}
