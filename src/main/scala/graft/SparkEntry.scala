package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ClusterQueries, EventQueries, FlightQueries, MultimodalQueries, ParityQueries, QueryDef, TextQueries, VectorQueries, WarehouseQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator catalog; each catalog entry
  * carries its own DuckDB oracle SQL where the semantics are
  * SQL-expressible (the driver hash-compares), and omits it otherwise
  * (driver records a rows-only check).
  */
object SparkEntry {

  private def catalog: Map[String, QueryDef] =
    ParityQueries.all ++ FlightQueries.all ++ TextQueries.all ++
      VectorQueries.all ++ EventQueries.all ++ MultimodalQueries.all ++
      ClusterQueries.all ++ WarehouseQueries.all

  /** Flagship: the full flight pipeline (E1/E2) on sf0.001; driver
    * smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    FlightPipeline.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.collect { case (name, QueryDef(_, Some(sql))) => name -> sql }
}
