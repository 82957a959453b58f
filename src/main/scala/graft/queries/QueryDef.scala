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

  /** DuckDB polynomial rolling hash over a string expression — the one
    * shared definition (query catalogs must not fork it). Lambda
    * variables are deliberately obscure: a DuckDB lambda var shadows any
    * outer column/unnest alias of the same name inside `e`, silently
    * hashing the wrong bytes. */
  def duckPolyHash(e: String, base: Int = 31, p: Long = 1000000007L): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, length($e) + 1), __ci -> CAST(ascii($e[__ci]) AS BIGINT))), " +
      s"(__acc, __c) -> (__acc * $base + __c) % $p)"

  /** DuckDB mirror of [[graft.operators.Sampling.sampleHash]]: polyHash
    * of `key ":" salt` then two LCG mix rounds — the one shared
    * definition for every hash-decided curation oracle. */
  def duckSampleHash(keyExpr: String, salt: String): String =
    s"(((${duckPolyHash(s"(CAST($keyExpr AS VARCHAR) || ':$salt')")}" +
      s" * 48271 + 11) % 1000000007) * 48271 + 11) % 1000000007"
}
