package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink (SURVEY §2.1 S1/S4/S5 on a real database).
  *
  * The reference extracts from BigQuery and batch-INSERTs into Postgres
  * in one transaction (`etl/extractor.py:42-58`, `etl/loader.py:15-96`);
  * the Spark shape is the jdbc relation: predicates push into the
  * database on read, writes batch per partition. The parquet-dir
  * variants in [[graft.operators.Sinks]] carry the backup/restore
  * semantics; these wrappers carry the wire protocol. Tested against
  * embedded Derby (JdbcSpec) — swap the url for Postgres in production.
  */
object Jdbc {

  private def props(extra: Map[String, String]): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** S1: server-side filtered scan — Catalyst pushes predicates and
    * column pruning into the database query. */
  def read(spark: SparkSession, url: String, table: String,
           options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, props(options))

  /** S4: batched append (one INSERT batch per `batchsize` rows per
    * partition — the distributed analogue of the reference's
    * single-transaction executemany). */
  def append(df: DataFrame, url: String, table: String,
             batchSize: Int = 10000): Unit =
    df.write.mode("append")
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props(Map.empty))

  /** S5: full refresh. `truncate=true` keeps the table definition (the
    * reference TRUNCATEs rather than dropping, `etl/loader.py:213`). */
  def truncateAndLoad(df: DataFrame, url: String, table: String): Unit =
    df.write.mode("overwrite")
      .option("truncate", "true")
      .jdbc(url, table, props(Map.empty))
}
