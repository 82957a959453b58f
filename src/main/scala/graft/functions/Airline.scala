package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F1/F12/A1: airline-code extraction, airport head token, and the
  * row-wise transfer count
  * (`etl/transform/unified_transformer.py:13-31,314-338,427-436`).
  */
object Airline {

  /** F1: leading letters of a flight number, uppercased; "" otherwise
    * (`"HX261"` -> `"HX"`, null -> `""`). */
  def extractAirlineCode(c: Column): Column =
    graft.functions.cat.GraftExpr.call("airlineCode", coalesce(c.cast("string"), lit("")))

  /** F12: first whitespace-delimited token (`"TPE 桃園機場"` -> `"TPE"`).
    * Python `"".split()[0]` yields NaN for empty input, so blank -> NULL. */
  def airportHeadToken(c: Column): Column =
    graft.functions.cat.GraftExpr.call("headToken", coalesce(c.cast("string"), lit("")))

  /** A1: transfer count = (non-blank legs - 1) clamped at 0. The
    * reference first scrubs blank/whitespace flight cells to NaN, then
    * counts non-null per row (`unified_transformer.py:427-436`). */
  def transferCount(legs: Seq[Column]): Column = {
    val nonBlank = legs
      .map(c => when(c.isNotNull && trim(c.cast("string")) =!= "", 1).otherwise(0))
      .reduce(_ + _)
    greatest(lit(0), nonBlank - 1)
  }
}
