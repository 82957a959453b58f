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

  private val Pat = "(?:(\\d+)\\s*days\\s*)?(\\d{1,2}):(\\d{2})(?::(\\d{2}))?"

  def durationToMinutes(c: Column): Column = {
    val s = trim(coalesce(c.cast("string"), lit("")))
    val whole = regexp_extract(s, Pat, 0)
    val days = coalesce(nullif(regexp_extract(s, Pat, 1), lit("")), lit("0")).cast("int")
    val hours = regexp_extract(s, Pat, 2).cast("int")
    val mins = regexp_extract(s, Pat, 3).cast("int")
    val secs = coalesce(nullif(regexp_extract(s, Pat, 4), lit("")), lit("0")).cast("int")
    val fromPat = days * 1440 + hours * 60 + mins + when(secs >= 30, 1).otherwise(0)
    when(s === "", lit(null).cast("int"))
      .when(whole =!= "", fromPat)
      .when(s.rlike("^\\d+$"), s.cast("int"))
      .otherwise(lit(null).cast("int"))
  }

  /** Numeric passthrough variant for already-numeric columns. */
  def durationToMinutesNumeric(c: Column): Column = c.cast("int")
}
