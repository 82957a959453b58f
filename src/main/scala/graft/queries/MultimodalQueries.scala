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
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Frame sampling + resize + feature extraction over the decoded
    // metadata: explode every 2nd frame of the "webp" payloads, resize
    // dims to fit 256, and surface two embedding components (the stub
    // feature extractor's arithmetic reproduced by the oracle).
    "q33_frame_sample" -> QueryDef(
      (s, dir) => {
        val base = Multimodal
          .withMedia(Tables.computeTable(s, dir, "documents"), "text")
          .filter(col("format") === "webp")
        val (w2, h2) = Multimodal.resizeMeta(col("width"), col("height"), 256)
        val feat = Multimodal.featureStub(col("payload"))
        Multimodal.sampleFrames(base, stride = 2)
          .select(col("doc_id"), col("frame_idx"), col("frame_ts_ms"),
            w2.as("w256"), h2.as("h256"),
            element_at(feat, 1).cast("double").as("feat_0"),
            element_at(feat, 2).cast("double").as("feat_1"))
          .orderBy("doc_id", "frame_idx")
      },
      """WITH m AS (
        |  SELECT doc_id, strlen(text) AS n,
        |         CAST(320 + strlen(text) % 320 AS INTEGER) AS width,
        |         CAST(240 + strlen(text) % 240 AS INTEGER) AS height,
        |         CAST(1 + strlen(text) % 16 AS INTEGER) AS nf
        |  FROM documents WHERE strlen(text) % 3 = 2)
        |SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
        |       CAST(fi * 40 AS INTEGER) AS frame_ts_ms,
        |       CAST(CASE WHEN greatest(width, height) <= 256 THEN width
        |            ELSE width * 256 // greatest(width, height) END AS INTEGER) AS w256,
        |       CAST(CASE WHEN greatest(width, height) <= 256 THEN height
        |            ELSE height * 256 // greatest(width, height) END AS INTEGER) AS h256,
        |       CAST(CAST(CAST((n * 31 + 0) % 997 AS DOUBLE) / 997.0
        |            AS FLOAT) AS DOUBLE) AS feat_0,
        |       CAST(CAST(CAST((n * 31 + 7) % 997 AS DOUBLE) / 997.0
        |            AS FLOAT) AS DOUBLE) AS feat_1
        |FROM m, unnest(range(0, CAST(nf AS BIGINT), 2)) AS t(fi)
        |ORDER BY doc_id, frame_idx""".stripMargin))
}
