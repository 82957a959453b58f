package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing over `documents` (text bytes standing in for an
  * opaque media payload): binary column + stub-decoded metadata. The
  * oracle reproduces the deterministic stub from byte lengths.
  */
object MultimodalQueries {

  val all: Map[String, QueryDef] = Map(
    "q32_multimodal_meta" -> QueryDef(
      (s, dir) => Multimodal.withMedia(Tables.table(s, dir, "documents"), "text")
        .select("doc_id", "byte_len", "format", "width", "height", "n_frames")
        .orderBy("doc_id"),
      """SELECT doc_id,
        |       CAST(strlen(text) AS INTEGER) AS byte_len,
        |       CASE WHEN strlen(text) % 3 = 0 THEN 'jpeg'
        |            WHEN strlen(text) % 3 = 1 THEN 'png'
        |            ELSE 'webp' END AS format,
        |       CAST(320 + strlen(text) % 320 AS INTEGER) AS width,
        |       CAST(240 + strlen(text) % 240 AS INTEGER) AS height,
        |       CAST(CASE WHEN strlen(text) % 3 = 2 THEN 1 + strlen(text) % 16
        |            ELSE 1 END AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin))
}
