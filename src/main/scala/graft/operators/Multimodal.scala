package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads with typed
  * metadata, plus a partition-wise "decode" stage.
  *
  * The image/audio codec libraries are not available in this
  * environment, so `decodeStub` is a clearly-marked DETERMINISTIC FAKE:
  * it derives plausible metadata purely from the byte payload. The
  * Spark-side plumbing — binary column handling, schema, partition-wise
  * batched execution via `mapPartitions` (the JVM analogue of
  * `mapInPandas` batching), and the column-level metadata path — is
  * real and tested; swapping the stub body for a JNI/codec call is the
  * only production change.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte])
  final case class DecodedMeta(doc_id: Long, byte_len: Int, format: String,
                               width: Int, height: Int, n_frames: Int)

  /** STUB decode of one payload — replace with a real codec in prod.
    * Deterministic in the payload bytes only. */
  def decodeStub(docId: Long, payload: Array[Byte]): DecodedMeta = {
    val n = payload.length
    val fmt = (n % 3) match {
      case 0 => "jpeg"
      case 1 => "png"
      case _ => "webp"
    }
    DecodedMeta(docId, n, fmt, 320 + n % 320, 240 + n % 240,
      if (fmt == "webp") 1 + n % 16 else 1)
  }

  /** Partition-wise decode: one iterator pass per partition, no
    * per-row task overhead — the shape a heavyweight codec needs
    * (library init once per partition, then stream the batch). */
  def decodePartitions(media: Dataset[MediaRecord]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init would go here (codec handles, buffers)
      it.map(r => decodeStub(r.doc_id, r.payload))
    }
  }

  /** Column-level variant of the same metadata derivation (codegen'd,
    * oracle-friendly): identical output to `decodeStub` field-by-field. */
  def metaColumns(binCol: Column): Seq[(String, Column)] = {
    val n = length(binCol)
    val fmt = when(n % 3 === 0, "jpeg").when(n % 3 === 1, "png").otherwise("webp")
    Seq(
      "byte_len" -> n.cast("int"),
      "format" -> fmt,
      "width" -> (lit(320) + n % 320).cast("int"),
      "height" -> (lit(240) + n % 240).cast("int"),
      "n_frames" -> when(fmt === "webp", lit(1) + n % 16).otherwise(lit(1)).cast("int"))
  }

  /** Attach a binary payload column + decoded metadata to a text table
    * (documents stand in for a media table here). */
  def withMedia(df: DataFrame, textCol: String): DataFrame = {
    val bin = encode(col(textCol), "UTF-8")
    metaColumns(bin).foldLeft(df.withColumn("payload", bin)) {
      case (acc, (name, c)) => acc.withColumn(name, c)
    }
  }

  /** STUB resize-to-fit: integer-arithmetic scaled dimensions (no pixel
    * work — a codec would transform the payload too). Exact in doubles
    * for all plausible dims, so floor(w*maxDim/m) == integer division
    * and any SQL engine reproduces it. */
  def resizeMeta(w: Column, h: Column, maxDim: Int): (Column, Column) = {
    val m = greatest(w, h)
    (when(m <= maxDim, w).otherwise(floor(w * maxDim / m)).cast("int"),
      when(m <= maxDim, h).otherwise(floor(h * maxDim / m)).cast("int"))
  }

  /** Frame sampling: one row per `stride`-th frame of the decoded
    * n_frames — plan-side explode, no UDF; 25 fps timestamps. */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame =
    df.withColumn("frame_idx",
        explode(filter(sequence(lit(0), col("n_frames") - 1),
          i => i % stride === 0)))
      .withColumn("frame_idx", col("frame_idx").cast("int"))
      .withColumn("frame_ts_ms", (col("frame_idx") * 40).cast("int"))

  /** STUB feature extraction: deterministic `dim`-dim embedding derived
    * from the payload length — the `array<float>` schema, null-safety
    * and batch shape are the real plumbing a codec-backed extractor
    * would keep. */
  def featureStub(binCol: Column, dim: Int = 8): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (((length(binCol) * 31 + i * 7) % 997).cast("double") / 997.0d)
        .cast("float"))
}
