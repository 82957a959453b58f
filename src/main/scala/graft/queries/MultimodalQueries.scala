package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal queries over `documents`: real PNG payloads synthesized
  * from integer pixel formulas of (doc_id, x, y), decoded back through
  * `javax.imageio` (dims + channel sums read from the actual raster),
  * nearest-neighbor resize on the raster with a PNG re-encode round
  * trip, histogram feature extraction, and metadata-driven video frame
  * sampling. PNG is lossless, so every decoded statistic is
  * reproducible by DuckDB from the pixel formulas alone — the oracles
  * recompute the rasters arithmetically with UNNEST(range(...)).
  */
object MultimodalQueries {

  /** doc_id-parameterized pixel/dim formulas, shared by all oracles
    * (mirrors Multimodal.imageDims / pixelR / pixelG / pixelB). */
  private val DuckDims =
    """dims AS (
      |  SELECT doc_id,
      |         CAST(16 + doc_id % 17 AS INTEGER) AS width,
      |         CAST(12 + doc_id % 13 AS INTEGER) AS height
      |  FROM documents)""".stripMargin

  val all: Map[String, QueryDef] = Map(

    // Real decode: encode each fixture image to PNG on the executors,
    // decode it back with ImageIO, report sniffed container format,
    // raster dims, and per-channel pixel sums.
    "q32_multimodal_meta" -> QueryDef(
      (s, dir) => Multimodal.decodeImages(
          Multimodal.mediaTable(s, Tables.table(s, dir, "documents")))
        .toDF().orderBy("doc_id"),
      s"""WITH $DuckDims,
         |px AS (
         |  SELECT doc_id, width, height,
         |         (doc_id*31 + x*7 + y*13) % 256 AS r,
         |         (doc_id*17 + x*11 + y*5) % 256 AS g,
         |         (doc_id*13 + x*3 + y*19) % 256 AS b
         |  FROM dims,
         |       unnest(range(0, CAST(width AS BIGINT))) AS tx(x),
         |       unnest(range(0, CAST(height AS BIGINT))) AS ty(y))
         |SELECT doc_id, 'png' AS format, width, height,
         |       CAST(width * height AS INTEGER) AS n_pixels,
         |       CAST(SUM(r) AS BIGINT) AS sum_r,
         |       CAST(SUM(g) AS BIGINT) AS sum_g,
         |       CAST(SUM(b) AS BIGINT) AS sum_b
         |FROM px GROUP BY doc_id, width, height ORDER BY doc_id""".stripMargin),

    // Real resize: decode -> nearest-neighbor raster resize to fit 8px
    // -> PNG re-encode -> decode again; dims and red-channel sum come
    // from the re-decoded bytes. The oracle recomputes the NN mapping
    // dst(x,y) = src(x*w//dw, y*h//dh) arithmetically.
    "q3H_image_resize" -> QueryDef(
      (s, dir) => Multimodal.resizeImages(
          Multimodal.mediaTable(s, Tables.table(s, dir, "documents")), maxDim = 8)
        .toDF().orderBy("doc_id"),
      s"""WITH $DuckDims,
         |rd AS (
         |  SELECT doc_id, width, height,
         |         CAST(width * 8 // greatest(width, height) AS INTEGER) AS rw,
         |         CAST(height * 8 // greatest(width, height) AS INTEGER) AS rh
         |  FROM dims),
         |px AS (
         |  SELECT doc_id, rw, rh,
         |         (doc_id*31 + (x * width // rw)*7 + (y * height // rh)*13) % 256 AS r
         |  FROM rd,
         |       unnest(range(0, CAST(rw AS BIGINT))) AS tx(x),
         |       unnest(range(0, CAST(rh AS BIGINT))) AS ty(y))
         |SELECT doc_id, rw AS width, rh AS height,
         |       CAST(SUM(r) AS BIGINT) AS sum_r
         |FROM px GROUP BY doc_id, rw, rh ORDER BY doc_id""".stripMargin),

    // Real feature extraction: 8-bin red-channel histogram fractions
    // from the decoded raster (float32; the oracle applies the same
    // single-precision rounding).
    "q3I_image_histogram" -> QueryDef(
      (s, dir) => {
        val feats = Multimodal.imageFeatures(
          Multimodal.mediaTable(s, Tables.table(s, dir, "documents")))
        feats.toDF().select(
          col("doc_id") +:
            (0 until 8).map(b =>
              element_at(col("features"), b + 1).cast("double").as(s"f$b")): _*)
          .orderBy("doc_id")
      }, {
        val binCols = (0 until 8).map { b =>
          s"CAST(CAST(CAST(SUM(CASE WHEN r * 8 // 256 = $b THEN 1 ELSE 0 END) AS DOUBLE)" +
            s" / (width * height) AS FLOAT) AS DOUBLE) AS f$b"
        }.mkString(",\n       ")
        s"""WITH $DuckDims,
           |px AS (
           |  SELECT doc_id, width, height,
           |         (doc_id*31 + x*7 + y*13) % 256 AS r
           |  FROM dims,
           |       unnest(range(0, CAST(width AS BIGINT))) AS tx(x),
           |       unnest(range(0, CAST(height AS BIGINT))) AS ty(y))
           |SELECT doc_id,
           |       $binCols
           |FROM px GROUP BY doc_id, width, height ORDER BY doc_id""".stripMargin
      }),

    // Frame sampling + resize over the video-metadata path: explode
    // every 2nd frame of the metadata n_frames, resize dims to fit 256.
    // (The JDK ships no video codec; frame geometry comes from typed
    // metadata columns, the schema contract of a real video table.)
    "q33_frame_sample" -> QueryDef(
      (s, dir) => {
        val base = Multimodal.videoMeta(Tables.computeTable(s, dir, "documents"))
        val (w2, h2) = Multimodal.resizeMeta(col("width"), col("height"), 256)
        Multimodal.sampleFrames(base, stride = 2)
          .select(col("doc_id"), col("frame_idx"), col("frame_ts_ms"),
            w2.as("w256"), h2.as("h256"))
          .orderBy("doc_id", "frame_idx")
      },
      """WITH m AS (
        |  SELECT doc_id,
        |         CAST(320 + doc_id % 320 AS INTEGER) AS width,
        |         CAST(240 + doc_id % 240 AS INTEGER) AS height,
        |         CAST(1 + doc_id % 16 AS INTEGER) AS nf
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
        |       CAST(fi * 40 AS INTEGER) AS frame_ts_ms,
        |       CAST(CASE WHEN greatest(width, height) <= 256 THEN width
        |            ELSE width * 256 // greatest(width, height) END AS INTEGER) AS w256,
        |       CAST(CASE WHEN greatest(width, height) <= 256 THEN height
        |            ELSE height * 256 // greatest(width, height) END AS INTEGER) AS h256
        |FROM m, unnest(range(0, CAST(nf AS BIGINT), 2)) AS t(fi)
        |ORDER BY doc_id, frame_idx""".stripMargin),

    // Real audio decode: PCM16 WAV payloads encoded on the executors,
    // parsed back through the RIFF chunk walk, waveform features
    // (energy, peak, zero crossings) computed from the decoded samples.
    // The sample formula is pure integer arithmetic of (doc_id, i), so
    // the oracle regenerates the exact waveform.
    "q3Z_audio_features" -> QueryDef(
      (s, dir) => Multimodal.decodeAudio(
          Multimodal.audioTable(s, Tables.table(s, dir, "documents")))
        .toDF().orderBy("doc_id"),
      """WITH n AS (
        |  SELECT doc_id, CAST(1000 + (doc_id % 5) * 500 AS INTEGER) AS ns
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, ns, i, ((doc_id*31 + i*7919) % 65536) - 32768 AS v
        |  FROM n, unnest(range(0, CAST(ns AS BIGINT))) AS t(i)),
        |w AS (
        |  SELECT doc_id, ns, v,
        |         lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        |  FROM s)
        |SELECT doc_id, 'wav' AS format, CAST(8000 AS INTEGER) AS sample_rate,
        |       ns AS n_samples,
        |       CAST(ns * 1000 // 8000 AS INTEGER) AS duration_ms,
        |       CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS sumsq,
        |       CAST(MAX(ABS(v)) AS INTEGER) AS peak,
        |       CAST(SUM(CASE WHEN pv IS NOT NULL AND ((pv >= 0) <> (v >= 0))
        |                THEN 1 ELSE 0 END) AS INTEGER) AS zero_crossings
        |FROM w GROUP BY doc_id, ns ORDER BY doc_id""".stripMargin),

    // Decode with quarantine: every 37th payload is truncated to 10
    // bytes (PNG magic survives, the raster does not); corrupt rows
    // land in a queryable quarantine set with zeroed stats instead of
    // killing the job — the non-negotiable property of a 100 TB decode
    // pass. Statuses are collapsed to ok/corrupt so the oracle stays
    // JDK-exception-name independent.
    "q43_decode_quarantine" -> QueryDef(
      (s, dir) => {
        val media = Multimodal.mediaTable(s, Tables.table(s, dir, "documents"))
        import media.sparkSession.implicits._
        val corrupted = media.map(r =>
          if (r.doc_id % 37 == 0) Multimodal.MediaRecord(r.doc_id, r.payload.take(10))
          else r)
        Multimodal.decodeImagesWithQuarantine(corrupted).toDF()
          .select(col("doc_id"),
            when(col("status") === "ok", "ok").otherwise("corrupt").as("status"),
            col("format"), col("width"), col("height"), col("sum_r"))
          .orderBy("doc_id")
      },
      s"""WITH $DuckDims,
         |px AS (
         |  SELECT doc_id, width, height,
         |         (doc_id*31 + x*7 + y*13) % 256 AS r
         |  FROM dims,
         |       unnest(range(0, CAST(width AS BIGINT))) AS tx(x),
         |       unnest(range(0, CAST(height AS BIGINT))) AS ty(y)
         |  WHERE doc_id % 37 <> 0),
         |good AS (
         |  SELECT doc_id, 'ok' AS status, 'png' AS format, width, height,
         |         CAST(SUM(r) AS BIGINT) AS sum_r
         |  FROM px GROUP BY doc_id, width, height),
         |bad AS (
         |  SELECT doc_id, 'corrupt' AS status, 'png' AS format,
         |         CAST(0 AS INTEGER) AS width, CAST(0 AS INTEGER) AS height,
         |         CAST(0 AS BIGINT) AS sum_r
         |  FROM documents WHERE doc_id % 37 = 0)
         |SELECT * FROM good UNION ALL SELECT * FROM bad
         |ORDER BY doc_id""".stripMargin))
}
