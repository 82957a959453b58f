package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge.
  *
  * The classic-mode converters are `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so this one-file
  * shim lives under `org.apache.spark.sql` to re-export them — the
  * standard technique Spark extension libraries use to attach custom
  * Catalyst expressions (graft.functions.cat) to the public Column API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column → catalyst conversion. `expression` wraps the
    * Column's node lazily (`ColumnNodeExpression`), which hides the
    * tree from pattern matches; the classic converter object resolves
    * it to the real `LessThan`/`Literal`/… shape — what the manifest
    * interval proofs (metadata-only DELETE) analyze. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap an analyzed LogicalPlan as a DataFrame (classic
    * `Dataset.ofRows` is `private[sql]`) — the DML translation rule
    * re-wraps a MERGE statement's resolved source plan this way. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Block until every queued listener event is delivered
    * (`listenerBus` is `private[spark]`) — lets specs assert on task
    * metrics immediately after an action. */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Spark's temporary row-index column name (`FileFormat.
    * ROW_INDEX_TEMPORARY_COLUMN_NAME`, `private[sql]`): a requested
    * parquet field with this name makes `VectorizedParquetRecordReader`
    * generate file-absolute row indexes, exact under row-group/page
    * skipping — the dv mask's position source. */
  def rowIndexTempColumn: String =
    org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
      .ROW_INDEX_TEMPORARY_COLUMN_NAME

  /** Non-blocking read of an Observation's metrics (`getOrEmpty` is
    * `private[sql]`; the public `get` blocks indefinitely, which a
    * fallback-on-missing caller cannot risk). */
  def observationOrEmpty(obs: org.apache.spark.sql.Observation): Map[String, Any] =
    obs.getOrEmpty
}
