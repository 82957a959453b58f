package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Join-key / string normalization expression builders.
  *
  * Semantics derived from the reference's join-key canonicalization
  * (`etl/transform/unified_transformer.py:216-258`) and the per-source
  * flight-number / cabin-class cleanup (`etl/transform/set_transformer.py:85-92`,
  * `etl/transform/cola_transformer.py:232-245`), re-expressed as native
  * Catalyst `Column` combinators so every one of them stays inside
  * whole-stage codegen (no UDF serialization, fully optimizable).
  */
object Normalize {

  /** Literal placeholder strings that the reference treats as missing
    * (`unified_transformer.py:226` — `nan/none/<na>/null/nat` plus empty). */
  val Placeholders: Seq[String] = Seq("", "nan", "none", "<na>", "null", "nat")

  /** F14: blank / all-whitespace string -> NULL
    * (`unified_transformer.py:539-544`). */
  def blankToNull(c: Column): Column =
    when(trim(c) === "", lit(null)).otherwise(c)

  /** Placeholder scrub: case-insensitive literal `nan`-family -> "".
    * Applied *after* trim+whitespace-collapse in the join normalization. */
  def scrubPlaceholders(c: Column): Column =
    when(lower(c).isin(Placeholders: _*), lit("")).otherwise(c)

  /** J2 (generic key): stringify (null -> ""), trim, collapse internal
    * whitespace to single spaces, placeholder-scrub, uppercase
    * (`unified_transformer.py:228-234`). Result is never NULL, so the
    * downstream equi-join matches empty keys to empty keys exactly like
    * the reference's pandas merge on `""`-normalized strings. */
  def normalizeKey(c: Column): Column =
    graft.functions.cat.GraftExpr.call("keyNorm", coalesce(c.cast("string"), lit("")))

  /** The whitespace class the reference's `\s` matches on these ASCII
    * payloads — used with `translate`, a single char-table pass that
    * replaces a regex scan in the hot cleaning path. */
  private val WsChars = " \t\n\f\r"

  /** Strip ALL whitespace without a regex (translate is a per-char
    * table lookup; equivalent to `regexp_replace(c, "\\s+", "")`). */
  def stripAllWhitespace(c: Column): Column = translate(c, WsChars, "")

  /** J2 (flight-number / cabin-class key): normalizeKey + strip ALL
    * whitespace (`unified_transformer.py:236-241`: 'CX 450' -> 'CX450'). */
  def normalizeTightKey(c: Column): Column =
    graft.functions.cat.GraftExpr.call("tightKeyNorm", coalesce(c.cast("string"), lit("")))

  /** F10: flight-number canonicalization — strip whitespace, uppercase,
    * zero-pad 2-digit (`CI73` -> `CI073`) and 1-digit (`CI7` -> `CI007`)
    * tails (`set_transformer.py:85-92`). Null -> "".
    *
    * The pad rewrites fire only behind a length guard, so the regex
    * (the dominant per-row cost in the cleaning stage) runs on the rare
    * short tails instead of every value. */
  def normalizeFlightNumber(c: Column): Column =
    graft.functions.cat.GraftExpr.call("flightNorm", coalesce(c.cast("string"), lit("")))

  /** F-C validity predicate: a normalized flight number is valid when
    * empty or `^[A-Z0-9]{2}\d{3,4}$` (`set_transformer.py:94-102`).
    * Decomposed into length + per-char codepoint range checks — exact
    * same accept set as the anchored ASCII regex, but each check is a
    * codegen'd substring/ascii intrinsic instead of a regex engine run
    * per row per flight column. */
  def isValidFlightNumber(c: Column): Column =
    coalesce(graft.functions.cat.GraftExpr.call("flightValid", c.cast("string")),
      lit(true)) // NULL is valid (the reference checks only non-empty cells)

  /** F-C row filter: keep rows where EVERY flight column is valid. */
  def allFlightNumbersValid(cols: Seq[Column]): Column =
    cols.map(isValidFlightNumber).reduce(_ && _)

  /** F11: cabin-class cleanup — remove ASCII spaces (the reference uses
    * a literal `' '` replace, not `\s`; `cola_transformer.py:242-244`). */
  def normalizeCabinClass(c: Column): Column =
    regexp_replace(c.cast("string"), " ", "")

  /** J2 (date key): canonicalize a date string to `MM/DD`
    * (`unified_transformer.py:244-258`): unify separators `.`/`-` to `/`,
    * strip a leading or trailing 4-digit year, zero-pad month/day. The
    * reference's `pd.to_datetime` round-trip is a no-op on the padded
    * value (it re-emits `%m/%d`), so the padded string IS the result. */
  def normalizeDateKeyMMDD(c: Column): Column =
    graft.functions.cat.GraftExpr.call("dateKeyMmDd", coalesce(c.cast("string"), lit("")))

  /** Full J2 date-key chain: generic normalize first (the date columns go
    * through the same loop as every join key), then MM/DD canonicalization. */
  def normalizeDateKey(c: Column): Column =
    normalizeDateKeyMMDD(normalizeKey(c))
}
