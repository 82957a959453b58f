package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** P3/P4: schema conformance — add absent columns as typed nulls so wide
  * unions/joins never fail on shape. This is the Spark analogue of the
  * reference's `if col not in df.columns: df[col] = pd.NA`
  * (`etl/transform/unified_transformer.py:197-207`,
  * `etl/transform/cola_transformer.py:271-287`).
  *
  * Purely a plan rewrite (adds `Alias(Literal(null))` projections), so it
  * costs nothing at runtime and Catalyst prunes unused pads.
  */
object Conform {

  /** Add every missing column of `schema` as a typed null literal. */
  def conformSchema(df: DataFrame, schema: StructType): DataFrame =
    schema.fields.foldLeft(df) { (acc, f) =>
      if (acc.columns.contains(f.name)) acc
      else acc.withColumn(f.name, lit(null).cast(f.dataType))
    }

  /** Ensure named columns exist (default StringType nulls). */
  def ensureColumns(df: DataFrame, cols: Seq[String], dt: DataType = StringType): DataFrame =
    cols.foldLeft(df) { (acc, name) =>
      if (acc.columns.contains(name)) acc
      else acc.withColumn(name, lit(null).cast(dt))
    }

  /** P4: ensure a column exists AND is non-null, filling with `fill`
    * (`cola_transformer.py:289-300` — `建立時間` defaults to now-epoch,
    * `KP` to ""). */
  def ensureWithDefault(df: DataFrame, name: String, fill: org.apache.spark.sql.Column): DataFrame =
    if (df.columns.contains(name)) df.withColumn(name, coalesce(col(name), fill))
    else df.withColumn(name, fill)

  /** Bulk rename via map, ignoring absent sources — P1/P2
    * (`cola_transformer.py:121-168`, `set_transformer.py:28-58`). */
  def renameColumns(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.withColumnsRenamed(renames.filter { case (from, _) => df.columns.contains(from) })
}
