package graft.schema

/** The flight-price data model's column vocabularies.
  *
  * Three regimes, as in the reference: raw per-source names (Chinese),
  * the standard intermediate vocabulary shared by all cleaned frames
  * (`去程_航班編號{1..3}` …, `etl/transform/cola_transformer.py:121-168`),
  * and the English output schema (~85 columns,
  * `etl/transform/unified_transformer.py:290-503`).
  */
object FlightVocab {

  val Legs: Seq[Int] = Seq(1, 2, 3)

  // ── standard intermediate vocabulary ────────────────────────────────
  def depFlight(i: Int) = s"去程_航班編號$i"
  def retFlight(i: Int) = s"回程_航班編號$i"
  /** Composite "flight number + space + cabin class" columns P7 splits
    * (`cola_transformer.py:170-201`). */
  def depFlightComposite(i: Int) = s"去程_航班號$i"
  def retFlightComposite(i: Int) = s"回程_航班號$i"
  def depCabin(i: Int) = s"去程_艙等$i"
  def retCabin(i: Int) = s"回程_艙等$i"
  def depDepTime(i: Int) = s"去程_出發時間$i"
  def depArrTime(i: Int) = s"去程_到達時間$i"
  def retDepTime(i: Int) = s"回程_出發時間$i"
  def retArrTime(i: Int) = s"回程_到達時間$i"
  def depDepAirport(i: Int) = s"去程_出發機場$i"
  def depArrAirport(i: Int) = s"去程_到達機場$i"
  def retDepAirport(i: Int) = s"回程_出發機場$i"
  def retArrAirport(i: Int) = s"回程_到達機場$i"
  def depAircraft(i: Int) = s"去程_機型$i"
  def retAircraft(i: Int) = s"回程_機型$i"
  def depDuration(i: Int) = s"去程_飛行時間$i"
  def retDuration(i: Int) = s"回程_飛行時間$i"
  def depLuggage(i: Int) = s"去程行李$i" // note: no underscore (reference quirk)
  def retLuggage(i: Int) = s"回程行李$i"

  val DepartureDate = "出發日期"
  val ReturnDate = "返回日期"
  val DepartureYear = "出發年份"
  val ReturnYear = "返回年份"
  val CreationTime = "建立時間"
  val GdsType = "GDS_Type"
  val TicketPrice = "機票價錢"
  val TicketPriceMarkup = "機票價錢加價成數"
  val Tax = "稅金"
  val TaxMarkup = "稅金加價成數"
  val FinalPrice = "最終價格"
  val NetOrFace = "淨價或票面"
  val RuleType = "票價規則類型"
  val Kp = "KP"
  val Discount = "折扣"
  val FixedFee = "固定金額"

  /** The 12 flight/cabin join-key columns every source must carry
    * (`unified_transformer.py:191-207`). */
  val FlightKeyCols: Seq[String] =
    Legs.map(depFlight) ++ Legs.map(depCabin) ++ Legs.map(retFlight) ++ Legs.map(retCabin)

  /** Columns that get the *tight* (all-whitespace-stripped) join
    * normalization (`unified_transformer.py:236-241`). */
  val FlightNumberKeyCols: Seq[String] = Legs.map(depFlight) ++ Legs.map(retFlight)
  val CabinKeyCols: Seq[String] = Legs.map(depCabin) ++ Legs.map(retCabin)

  /** The full 14-column join key (`unified_transformer.py:210`). */
  val JoinKeys: Seq[String] = FlightKeyCols ++ Seq(DepartureDate, ReturnDate)

  // ── competitor payload (supplier_mapping, unified_transformer.py:454-473) ──
  val SupplierPriceTaxCols: Seq[(String, String)] = Seq(
    "ezfly_ticket_price" -> "ezfly_tax", // no upstream source; emitted as nulls
    "eztravel_ticket_air_tickets_price" -> "eztravel_tax",
    "foreign_supplier_eztraval_ticket_air_tickets_price" -> "foreign_supplier_eztraval_tax",
    "lion_air_tickets_price" -> "lion_tax",
    "settour_air_tickets_price" -> "settour_tax",
    "rich_mond_air_tickets_price" -> "rich_mond_tax")

  /** The five competitor tax columns the F-D filter checks
    * (`unified_transformer.py:505-516`). */
  val CompetitorTaxCols: Seq[String] = Seq(
    "lion_tax", "settour_tax", "eztravel_tax", "rich_mond_tax",
    "foreign_supplier_eztraval_tax")
}
