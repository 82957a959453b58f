package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Dates, Luggage, Normalize}
import graft.schema.FlightVocab._

/** Per-source cleaning stages (SURVEY §2: P1/P2, F-C, F6-F8, F10, F11, F5).
  *
  * Each cleaner is a pure `DataFrame => DataFrame` plan transform —
  * renames are metadata-only, every value transform is a codegen'd
  * `Column` expression, and the invalid-row drop is a single filter that
  * Catalyst pushes toward the scan.
  */
object Cleaners {

  /** P1: cola raw -> standard vocabulary
    * (`etl/transform/cola_transformer.py:121-168`). */
  val ColaRenames: Map[String, String] = {
    val perLeg = Legs.flatMap { i =>
      Seq(
        s"去程航班編號$i" -> depFlight(i), s"回程航班編號$i" -> retFlight(i),
        s"去程艙等與艙等編碼$i" -> depCabin(i), s"回程艙等與艙等編碼$i" -> retCabin(i),
        s"去程起飛時間$i" -> depDepTime(i), s"去程降落時間$i" -> depArrTime(i),
        s"回程起飛時間$i" -> retDepTime(i), s"回程降落時間$i" -> retArrTime(i),
        s"去程起飛機場$i" -> depDepAirport(i), s"去程降落機場$i" -> depArrAirport(i),
        s"回程起飛機場$i" -> retDepAirport(i), s"回程降落機場$i" -> retArrAirport(i),
        s"去程飛機公司及型號$i" -> depAircraft(i), s"回程飛機公司及型號$i" -> retAircraft(i),
        s"去程飛行時間$i" -> depDuration(i), s"回程飛行時間$i" -> retDuration(i))
    }.toMap
    perLeg ++ Map(
      "基礎票價" -> TicketPrice, "票價加價成數" -> TicketPriceMarkup,
      "總售價" -> FinalPrice, "票型" -> NetOrFace, "公式類型" -> RuleType,
      "GDS Type" -> GdsType, "折讓百分比" -> Kp)
  }

  /** P2: competitor raw -> standard vocabulary + supplier-specific
    * price/tax names (`etl/transform/set_transformer.py:28-58` and its
    * four clones). */
  def competitorRenames(priceCol: String, taxCol: String): Map[String, String] =
    Map("去程日期" -> DepartureDate, "回程日期" -> ReturnDate,
      "票面價格" -> priceCol, "稅金" -> taxCol) ++
      Legs.flatMap { i =>
        Seq(s"去程航班編號$i" -> depFlight(i), s"去程艙等$i" -> depCabin(i),
          s"回程航班編號$i" -> retFlight(i), s"回程艙等$i" -> retCabin(i))
      }.toMap

  /** Cola cleaning chain (`cola_transformer.py:29-48`): rename ->
    * cabin-class whitespace strip -> luggage recompose -> date/year
    * derivation from the first-leg departure time -> ensure key columns
    * -> ensure metadata. `nowEpoch` parameterizes the reference's
    * `time.time()` fill for determinism. */
  def cleanCola(raw: DataFrame, nowEpoch: Double = 0d): DataFrame = {
    var df = Conform.renameColumns(raw, ColaRenames)
    // F11 (`cola_transformer.py:232-245`): strip literal spaces in 艙等 cols
    df.columns.filter(_.contains("艙等")).foreach { c =>
      df = df.withColumn(c, Normalize.normalizeCabinClass(col(c)))
    }
    // F5 (`cola_transformer.py:247-269`): luggage recompose
    df.columns.filter(_.contains("行李")).foreach { c =>
      df = df.withColumn(c, Luggage.recomposeLuggage(col(c)))
    }
    // F6/F7/F8 (`cola_transformer.py:211-228`): dates from leg-1 times
    if (df.columns.contains(depDepTime(1))) {
      df = df
        .withColumn(DepartureDate,
          Dates.isoSliceToMmDd(Dates.toDateYyyySlashMmSlashDd(col(depDepTime(1)))))
        .withColumn(DepartureYear, Dates.yearPrefix(col(depDepTime(1))))
    }
    if (df.columns.contains(retDepTime(1))) {
      df = df
        .withColumn(ReturnDate,
          Dates.isoSliceToMmDd(Dates.toDateYyyySlashMmSlashDd(col(retDepTime(1)))))
        .withColumn(ReturnYear, Dates.yearPrefix(col(retDepTime(1))))
    }
    // P3 (`cola_transformer.py:271-287`)
    df = Conform.ensureColumns(df, FlightKeyCols ++ Seq(DepartureDate, ReturnDate))
    // P4 (`cola_transformer.py:289-300`)
    df = Conform.ensureWithDefault(df, CreationTime, lit(nowEpoch))
    Conform.ensureWithDefault(df, Kp, lit(""))
  }

  /** P7 (`cola_transformer.py:170-201`): split each composite
    * `去程_航班號{n}` / `回程_航班號{n}` column ("CI073 K") on the FIRST
    * space into `…航班編號{n}` (trimmed) and `…艙等{n}` (the untouched
    * remainder, so "CI073  K" keeps its leading space exactly as the
    * reference's `str.split(' ', n=1)` does), dropping the original.
    * The reference's all-null branch (manufacture both columns as
    * nulls) is subsumed: splitting a null yields null in both outputs,
    * with no data-dependent schema decision — the same plan shape at
    * any scale. */
  def splitFlightAndClass(df: DataFrame): DataFrame = {
    val composites = df.columns.filter(c =>
      c.startsWith("去程_航班號") || c.startsWith("回程_航班號"))
    composites.foldLeft(df) { (acc, c) =>
      val leg = c.takeRight(1)
      val prefix = c.dropRight(1).replace("航班號", "")
      val parts = split(col(c), " ", 2)
      acc
        .withColumn(s"${prefix}航班編號$leg", trim(get(parts, lit(0))))
        .withColumn(s"${prefix}艙等$leg", get(parts, lit(1)))
        .drop(c)
    }
  }

  /** Competitor cleaning chain (`set_transformer.py:13-26` + 4 clones):
    * rename -> flight-number normalize + invalid-row drop (F10/F-C) ->
    * ISO date slice to MM/DD (F7). */
  def cleanCompetitor(raw: DataFrame, priceCol: String, taxCol: String): DataFrame = {
    var df = Conform.renameColumns(raw, competitorRenames(priceCol, taxCol))
    val flightCols = (Legs.map(depFlight) ++ Legs.map(retFlight)).filter(df.columns.contains)
    // F10 (`set_transformer.py:85-92`)
    flightCols.foreach { c =>
      df = df.withColumn(c, Normalize.normalizeFlightNumber(col(c)))
    }
    // F-C (`set_transformer.py:94-109`); the reference logs each dropped
    // row — distributed engines expose the reject side as a branch
    // instead (see `invalidRows`).
    if (flightCols.nonEmpty)
      df = df.filter(Normalize.allFlightNumbersValid(flightCols.map(col)))
    // F7 (`set_transformer.py:60-66`; guarded like the foreign variant)
    Seq(DepartureDate, ReturnDate).filter(df.columns.contains).foreach { c =>
      df = df.withColumn(c, Dates.isoSliceToMmDd(col(c)))
    }
    df
  }

  /** The complement of F-C's keep-filter — the reference logs these rows
    * (`set_transformer.py:103-107`); at scale they go to a reject sink. */
  def invalidRows(df: DataFrame): DataFrame = {
    val flightCols = (Legs.map(depFlight) ++ Legs.map(retFlight)).filter(df.columns.contains)
    val normalized = flightCols.foldLeft(df)((acc, c) =>
      acc.withColumn(c, Normalize.normalizeFlightNumber(col(c))))
    normalized.filter(!Normalize.allFlightNumbersValid(flightCols.map(col)))
  }
}
