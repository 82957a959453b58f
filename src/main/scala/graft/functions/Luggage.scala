package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F4/F5: luggage parsing and re-composition
  * (`etl/transform/unified_transformer.py:115-147` `split_luggage`,
  * `etl/transform/cola_transformer.py:247-269` `_normalize_luggage`).
  *
  * `"25 公斤"` -> (25.0, "公斤"), `"1件"` -> (1.0, "件"); units are the
  * leftovers after stripping digits/space/dot, canonicalized to 件 or
  * 公斤 (kg/KG/Kg synonyms); otherwise the stripped residue is kept
  * verbatim (the docstring's `"無" -> ""` is aspirational — the code
  * returns `"無"`, and we reproduce the code).
  */
object Luggage {

  private def call(fn: String, c: Column): Column =
    graft.functions.cat.GraftExpr.call(fn, coalesce(c.cast("string"), lit("")))

  /** F4 number part: first `\d+(\.\d+)?` as double; NULL when absent. */
  def luggageValue(c: Column): Column = call("luggageValue", c)

  /** F4 unit part: strip `[\d\s.]`, canonicalize; "" for null/blank input. */
  def luggageUnit(c: Column): Column = call("luggageUnit", c)

  /** F5: re-compose `<number><unit>`, formatting integral values without
    * the decimal point (`25.0公斤` -> `25公斤`); "" when no number. */
  def recomposeLuggage(c: Column): Column = call("luggageRecompose", c)
}
