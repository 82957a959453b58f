package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date / time scalar normalizations (F2, F6–F9).
  *
  * Semantics from the reference's multi-format fallback parsers
  * (`etl/transform/unified_transformer.py:33-74` `to_time_hhmm`,
  * `etl/transform/cola_transformer.py:50-85` `to_date_yyyy_slash_mm_slash_dd`,
  * `etl/transform/set_transformer.py:60-66` ISO slice to MM/DD). The
  * Python strptime fallback chains become ordered `coalesce` chains of
  * `try_to_timestamp` — same first-match-wins order, but lazy, codegen'd
  * and null-safe instead of exception-driven.
  */
object Dates {

  /** F2: normalize a time-ish string to `HH:MM` (24h); "" when unparseable.
    * Order mirrors the reference: full datetime formats first
    * (`%Y-%m-%d %H:%M:%S`, `%Y/%m/%d %H:%M`, `%Y-%m-%d %H:%M`), then the
    * first `\d{1,2}:\d{2}` found anywhere, zero-padded. */
  def toTimeHhmm(c: Column): Column =
    graft.functions.cat.GraftExpr.call("timeHhmm", coalesce(c.cast("string"), lit("")))

  /** F6: multi-format date parse -> `YYYY/MM/DD`; "" when unparseable.
    * strptime order: `%Y-%m-%d %H:%M:%S`, `%Y-%m-%d`, `%Y/%m/%d %H:%M`,
    * `%Y/%m/%d`, then a lenient ISO fallback (the reference's
    * `pd.to_datetime`). */
  def toDateYyyySlashMmSlashDd(c: Column): Column =
    graft.functions.cat.GraftExpr.call("dateYyyySlash", coalesce(c.cast("string"), lit("")))

  /** F7: ISO-ish `YYYY-MM-DD...` string -> `MM/DD` by positional slice —
    * the reference slices chars [5,10) and swaps `-` for `/`
    * (`set_transformer.py:64-65`), so non-ISO input degrades identically. */
  def isoSliceToMmDd(c: Column): Column =
    translate(substring(c.cast("string"), 6, 5), "-", "/")

  /** F8: year = text before the first `-` (`cola_transformer.py:224`). */
  def yearPrefix(c: Column): Column =
    substring_index(c.cast("string"), "-", 1)

  /** F9: re-attach year: `YYYY` + "/" + `MM/DD`
    * (`unified_transformer.py:530-531` — plain string concat; null
    * propagates like pandas NaN + str -> NaN). */
  def attachYear(year: Column, mmdd: Column): Column =
    concat(year, lit("/"), mmdd)
}
