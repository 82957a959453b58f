package graft.queries

import org.apache.spark.sql.functions._

import graft.FlightPipeline

/** The flagship end-to-end flight pipeline (SURVEY §3 E1/E2) verified
  * against a DuckDB oracle that independently re-derives the expected
  * output from `lineitem` (the synthesized sources' base table).
  *
  * The selected column subset is *separating*: every varying output
  * column of the 85-column projection is a function of columns in the
  * subset, so the oracle's dedup over the subset equals the pipeline's
  * dedup over all columns.
  */
object FlightQueries {

  private val outCols = Seq(
    "departure_airline_1", "departure_flight_number_1", "departure_flight_number_2",
    "departure_cabin_class_1", "departure_cabin_class_2", "return_flight_number_1",
    "departure_airport_1", "departure_flight_time_1", "departure_flight_duration_1",
    "departure_luggage_value_1", "departure_luggage_unit_1",
    "departure_transfer_count", "return_transfer_count",
    "departure_date", "return_date", "gds_type", "ticket_price", "tax",
    "final_price", "creation_time",
    "settour_air_tickets_price", "settour_tax",
    "lion_air_tickets_price", "lion_tax",
    "eztravel_ticket_air_tickets_price", "eztravel_tax",
    "foreign_supplier_eztraval_ticket_air_tickets_price", "foreign_supplier_eztraval_tax",
    "rich_mond_air_tickets_price", "rich_mond_tax",
    "kp", "discount", "net_price_or_ticket_price")

  private def compKeys(alias: String): String = {
    val keys = Seq("fn1", "fn2", "cab1", "cab2", "rfn1", "dd", "rd")
    keys.map(k => s"c.$k = $alias.$k").mkString(" AND ")
  }

  private def compCte(name: String, where: String, pf: String, tf: String,
                      priceAlias: String, taxAlias: String): String =
    s"""$name AS (
       |  SELECT 'CI' || CAST(pk % 900 + 100 AS VARCHAR) AS fn1,
       |         CASE WHEN ok % 3 = 0 THEN 'BR0' || CAST(pk % 90 + 10 AS VARCHAR) ELSE '' END AS fn2,
       |         CASE WHEN pk % 2 = 0 THEN 'Y' ELSE 'J1' END AS cab1,
       |         CASE WHEN ok % 3 = 0 THEN 'K' ELSE '' END AS cab2,
       |         'BR' || CAST(sk % 900 + 100 AS VARCHAR) AS rfn1,
       |         strftime(sd, '%m/%d') AS dd,
       |         strftime(sd + INTERVAL 7 DAY, '%m/%d') AS rd,
       |         CAST(FLOOR(ep * $pf) AS BIGINT) AS $priceAlias,
       |         CAST(FLOOR(ep * tx * $tf) AS BIGINT) AS $taxAlias
       |  FROM li WHERE $where)""".stripMargin

  val oracle: String = {
    val dedupPartition = outCols.filterNot(_ == "creation_time").mkString(", ")
    val orderBy = outCols.map(c => s"$c NULLS FIRST").mkString(", ")
    s"""WITH li AS (
       |  SELECT l_orderkey AS ok, l_partkey AS pk, l_suppkey AS sk,
       |         l_linenumber AS ln, l_extendedprice AS ep, l_tax AS tx,
       |         l_shipdate AS sd
       |  FROM lineitem),
       |cola AS (
       |  SELECT 'CI' || CAST(pk % 900 + 100 AS VARCHAR) AS fn1,
       |         CASE WHEN ok % 3 = 0 THEN 'BR0' || CAST(pk % 90 + 10 AS VARCHAR) ELSE '' END AS fn2,
       |         CASE WHEN pk % 2 = 0 THEN 'Y' ELSE 'J1' END AS cab1,
       |         CASE WHEN ok % 3 = 0 THEN 'K' ELSE '' END AS cab2,
       |         'BR' || CAST(sk % 900 + 100 AS VARCHAR) AS rfn1,
       |         strftime(sd, '%m/%d') AS dd,
       |         strftime(sd + INTERVAL 7 DAY, '%m/%d') AS rd,
       |         strftime(sd, '%Y') AS dy,
       |         strftime(sd + INTERVAL 7 DAY, '%Y') AS ry,
       |         CASE WHEN pk % 3 = 0 THEN CAST(25.0 AS DOUBLE)
       |              WHEN pk % 3 = 1 THEN CAST(30.0 AS DOUBLE)
       |              ELSE CAST(2.0 AS DOUBLE) END AS lug_v,
       |         CASE WHEN pk % 3 = 2 THEN '件' ELSE '公斤' END AS lug_u,
       |         CASE WHEN ok % 2 = 0 THEN 'AMADEUS' ELSE 'SABRE' END AS gds,
       |         CAST(FLOOR(ep) AS BIGINT) AS price,
       |         CAST(FLOOR(ep * tx) AS BIGINT) AS taxv,
       |         CAST(FLOOR(ep) + FLOOR(ep * tx) AS BIGINT) AS fprice,
       |         CAST(1700000000 + ok * 10 + ln AS DOUBLE) AS ctime,
       |         CAST(CASE WHEN ok % 3 = 0 THEN 1 ELSE 0 END AS INTEGER) AS dtc
       |  FROM li),
       |${compCte("comp_set", "ok % 2 = 0 AND ok % 11 <> 0", "0.97", "0.95", "sp", "st")},
       |${compCte("comp_lion", "ok % 3 = 0", "0.99", "0.90", "lp", "lt")},
       |${compCte("comp_ez", "ok % 5 = 0", "1.02", "1.00", "ep_", "et")},
       |${compCte("comp_fez", "ok % 5 = 3", "0.95", "0.85", "fp", "ft")},
       |${compCte("comp_rich", "ok % 7 = 0", "1.05", "1.10", "rp", "rt")},
       |joined AS (
       |  SELECT c.*, s.sp, s.st, l.lp, l.lt, e.ep_, e.et, f.fp, f.ft, r.rp, r.rt
       |  FROM cola c
       |  LEFT JOIN comp_set s  ON ${compKeys("s")}
       |  LEFT JOIN comp_lion l ON ${compKeys("l")}
       |  LEFT JOIN comp_ez e   ON ${compKeys("e")}
       |  LEFT JOIN comp_fez f  ON ${compKeys("f")}
       |  LEFT JOIN comp_rich r ON ${compKeys("r")}),
       |projected AS (
       |  SELECT 'CI' AS departure_airline_1,
       |         fn1 AS departure_flight_number_1,
       |         NULLIF(fn2, '') AS departure_flight_number_2,
       |         cab1 AS departure_cabin_class_1,
       |         NULLIF(cab2, '') AS departure_cabin_class_2,
       |         rfn1 AS return_flight_number_1,
       |         'TPE' AS departure_airport_1,
       |         '08:30' AS departure_flight_time_1,
       |         CAST(255 AS INTEGER) AS departure_flight_duration_1,
       |         lug_v AS departure_luggage_value_1,
       |         lug_u AS departure_luggage_unit_1,
       |         dtc AS departure_transfer_count,
       |         CAST(0 AS INTEGER) AS return_transfer_count,
       |         dy || '/' || dd AS departure_date,
       |         ry || '/' || rd AS return_date,
       |         gds AS gds_type,
       |         price AS ticket_price,
       |         taxv AS tax,
       |         fprice AS final_price,
       |         ctime AS creation_time,
       |         sp AS settour_air_tickets_price, st AS settour_tax,
       |         lp AS lion_air_tickets_price, lt AS lion_tax,
       |         ep_ AS eztravel_ticket_air_tickets_price, et AS eztravel_tax,
       |         fp AS foreign_supplier_eztraval_ticket_air_tickets_price,
       |         ft AS foreign_supplier_eztraval_tax,
       |         rp AS rich_mond_air_tickets_price, rt AS rich_mond_tax,
       |         CAST(NULL AS VARCHAR) AS kp,
       |         CAST(0 AS BIGINT) AS discount,
       |         '票面' AS net_price_or_ticket_price
       |  FROM joined
       |  WHERE st IS NOT NULL OR lt IS NOT NULL OR et IS NOT NULL
       |     OR ft IS NOT NULL OR rt IS NOT NULL),
       |dedup AS (
       |  SELECT *, row_number() OVER
       |    (PARTITION BY $dedupPartition ORDER BY creation_time DESC) AS rn
       |  FROM projected)
       |SELECT ${outCols.mkString(", ")} FROM dedup WHERE rn = 1
       |ORDER BY $orderBy""".stripMargin
  }

  val all: Map[String, QueryDef] = Map(
    "q40_flight_pipeline" -> QueryDef(
      (s, dir) => FlightPipeline.run(s, dir)
        .select(outCols.map(col): _*)
        .orderBy(outCols.map(c => col(c).asc_nulls_first): _*),
      oracle))
}
