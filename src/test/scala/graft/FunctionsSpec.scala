package graft

import org.apache.spark.sql.functions._

import graft.functions._

/** Golden input→output pairs for the scalar library, taken from the
  * reference docstrings (they are executable specs — SURVEY §5). */
class FunctionsSpec extends SparkTestBase {

  import spark.implicits._

  private def f1(fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
               (input: String): Any = {
    val df = Seq(Option(input)).toDF("v")
    df.select(fn(col("v")).as("r")).collect()(0).get(0)
  }
  private def f1null(fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any = {
    val df = Seq(Option.empty[String]).toDF("v")
    df.select(fn(col("v")).as("r")).collect()(0).get(0)
  }

  test("F1 extract_airline_code: 'HX261' -> 'HX'; null -> ''") {
    assert(f1(Airline.extractAirlineCode)("HX261") == "HX")
    assert(f1(Airline.extractAirlineCode)("CI073") == "CI")
    assert(f1(Airline.extractAirlineCode)("ci073") == "CI")
    assert(f1(Airline.extractAirlineCode)("073") == "")
    assert(f1null(Airline.extractAirlineCode) == "")
  }

  test("F2 to_time_hhmm docstring cases") {
    assert(f1(Dates.toTimeHhmm)("2025-11-05 19:20:00") == "19:20")
    assert(f1(Dates.toTimeHhmm)("0 days 19:20:00") == "19:20")
    assert(f1(Dates.toTimeHhmm)("19:05") == "19:05")
    assert(f1(Dates.toTimeHhmm)("9:05") == "09:05")
    assert(f1(Dates.toTimeHhmm)("2025/11/05 19:20") == "19:20")
    assert(f1(Dates.toTimeHhmm)("2025-11-05 19:20") == "19:20")
    assert(f1(Dates.toTimeHhmm)("dep at 7:45 local") == "07:45")
    assert(f1(Dates.toTimeHhmm)("garbage") == "")
    assert(f1null(Dates.toTimeHhmm) == "")
  }

  test("F3 duration_to_minutes docstring cases") {
    assert(f1(Durations.durationToMinutes)("0 days 02:05:00") == 125)
    assert(f1(Durations.durationToMinutes)("01:30:30") == 91)
    assert(f1(Durations.durationToMinutes)("95") == 95)
    assert(f1(Durations.durationToMinutes)("02:05") == 125)
    assert(f1(Durations.durationToMinutes)("1 days 01:00:00") == 1500)
    assert(f1(Durations.durationToMinutes)("n/a") == null)
    assert(f1null(Durations.durationToMinutes) == null)
  }

  test("F4 split_luggage: value and unit") {
    assert(f1(Luggage.luggageValue)("1件") == 1.0)
    assert(f1(Luggage.luggageUnit)("1件") == "件")
    assert(f1(Luggage.luggageValue)("25 公斤") == 25.0)
    assert(f1(Luggage.luggageUnit)("25 公斤") == "公斤")
    assert(f1(Luggage.luggageUnit)("30KG") == "公斤")
    // the reference code (not its docstring) keeps the residue verbatim
    assert(f1(Luggage.luggageValue)("無") == null)
    assert(f1(Luggage.luggageUnit)("無") == "無")
    assert(f1null(Luggage.luggageUnit) == "")
  }

  test("F5 luggage recompose: integral formatting") {
    assert(f1(Luggage.recomposeLuggage)("25.0 公斤") == "25公斤")
    assert(f1(Luggage.recomposeLuggage)("2 件") == "2件")
    assert(f1(Luggage.recomposeLuggage)("2.5kg") == "2.5公斤")
    assert(f1(Luggage.recomposeLuggage)("無") == "")
  }

  test("F6 to_date_yyyy_slash_mm_slash_dd docstring cases") {
    assert(f1(Dates.toDateYyyySlashMmSlashDd)("2025-11-05 19:20:00") == "2025/11/05")
    assert(f1(Dates.toDateYyyySlashMmSlashDd)("2025/11/05") == "2025/11/05")
    assert(f1(Dates.toDateYyyySlashMmSlashDd)("2025-11-05") == "2025/11/05")
    assert(f1(Dates.toDateYyyySlashMmSlashDd)("not a date") == "")
  }

  test("F7/F8 ISO slice + year prefix") {
    assert(f1(Dates.isoSliceToMmDd)("2024-01-15") == "01/15")
    assert(f1(Dates.yearPrefix)("2024-01-15 08:30:00") == "2024")
  }

  test("F10 flight-number normalize: zero padding (set_transformer.py:84-92)") {
    assert(f1(Normalize.normalizeFlightNumber)("CI73") == "CI073")
    assert(f1(Normalize.normalizeFlightNumber)("CI7") == "CI007")
    assert(f1(Normalize.normalizeFlightNumber)("ci 450") == "CI450")
    assert(f1(Normalize.normalizeFlightNumber)("CI1234") == "CI1234")
    assert(f1null(Normalize.normalizeFlightNumber) == "")
  }

  test("F-C validity: ^[A-Z0-9]{2}\\d{3,4}$ or empty") {
    def valid(s: String) =
      evalExpr(Normalize.isValidFlightNumber(lit(s))).asInstanceOf[Boolean]
    assert(valid("CI073"))
    assert(valid("B1023"))
    assert(valid(""))
    assert(!valid("BAD*CODE"))
    assert(!valid("1234567"))
    assert(!valid("CI12345"))
  }

  test("J2 key normalization: placeholders, whitespace, case") {
    assert(f1(Normalize.normalizeKey)("  a  b  ") == "A B")
    assert(f1(Normalize.normalizeKey)("NaN") == "")
    assert(f1(Normalize.normalizeKey)("<NA>") == "")
    assert(f1null(Normalize.normalizeKey) == "")
    assert(f1(Normalize.normalizeTightKey)("經濟艙 K") == "經濟艙K")
  }

  test("J2 date key: year strip + zero pad (unified_transformer.py:244-258)") {
    assert(f1(Normalize.normalizeDateKey)("2024/1/5") == "01/05")
    assert(f1(Normalize.normalizeDateKey)("1/5/2024") == "01/05")
    assert(f1(Normalize.normalizeDateKey)("2024-01-05") == "01/05")
    assert(f1(Normalize.normalizeDateKey)("11.05") == "11/05")
    assert(f1(Normalize.normalizeDateKey)("NOV/05") == "NOV/05")
    assert(f1null(Normalize.normalizeDateKey) == "")
  }

  test("J2 normalization is idempotent") {
    val inputs = Seq("  a  b ", "CI 73", "nan", "2024/1/5", "x", "")
    inputs.foreach { in =>
      val once = f1(Normalize.normalizeKey)(in)
      assert(f1(Normalize.normalizeKey)(once.toString) == once)
    }
  }

  test("A1 transfer count clamps at zero") {
    val df = Seq(("CI1", "", null.asInstanceOf[String])).toDF("a", "b", "c")
    val r = df.select(Airline.transferCount(Seq(col("a"), col("b"), col("c"))).as("t"))
      .collect()(0).getInt(0)
    assert(r == 0)
  }

  test("F12 airport head token; blank -> null (pandas ''.split()[0] is NaN)") {
    assert(f1(Airline.airportHeadToken)("TPE 桃園機場") == "TPE")
    assert(f1(Airline.airportHeadToken)("  ") == null)
  }

  test("text functions: tokens, shingles, polyHash determinism") {
    assert(f1(TextFunctions.wordCount)("a b  c") == 3)
    assert(f1(TextFunctions.wordCount)("") == 0)
    assert(f1(TextFunctions.bpeTokenCount)("ab 12 x!") == 5) // ab,1,2,x,!
    val sh = Seq("a b c d e f").toDF("v")
      .select(TextFunctions.shingles(col("v"), 5).as("s"))
      .collect()(0).getSeq[String](0)
    assert(sh == Seq("a b c d e", "b c d e f"))
    // polyHash("ab") = (0*31+97)*31+98 mod p = 3105
    assert(f1(c => TextFunctions.polyHash(c))("ab") == 3105L)
  }
}
