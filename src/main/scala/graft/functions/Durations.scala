package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F3: duration string -> total minutes
  * (`etl/transform/unified_transformer.py:76-113`).
  *
  * Accepts `"[D days ]HH:MM[:SS]"` (searched anywhere in the string, like
  * the reference's `re.search`), rounding up one minute when SS >= 30;
  * bare digit strings are already minutes; anything else is NULL.
  * Numeric inputs pass through truncated to int (Python `int(x)`).
  */
object Durations {

  def durationToMinutes(c: Column): Column =
    graft.functions.cat.GraftExpr.call("durationMinutes", coalesce(c.cast("string"), lit("")))

  /** Numeric passthrough variant for already-numeric columns. */
  def durationToMinutesNumeric(c: Column): Column = c.cast("int")
}
