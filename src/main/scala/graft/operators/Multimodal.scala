package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: opaque `binary` payloads with typed metadata.
  *
  * The image path is REAL: payloads are PNG-encoded with
  * `javax.imageio` (JDK built-in — no external codec needed), and
  * decode / resize / feature-extraction read the actual raster back
  * through `ImageIO.read`. Fixture images are synthesized from integer
  * formulas of (doc_id, x, y), and PNG is lossless, so every decoded
  * pixel statistic is independently reproducible by an oracle engine
  * from arithmetic alone — the tests prove the encode→decode round
  * trip bit-for-bit.
  *
  * The audio path is REAL too: PCM16 WAV needs no codec — payloads are
  * RIFF/WAVE byte streams encoded on the executors and decode parses
  * the container and samples back directly, with waveform features
  * (energy, peak, zero crossings) computed from the decoded samples.
  *
  * Video is the one modality the JDK has no codec for, so frame
  * sampling operates on *typed metadata* (frame counts, dims) carried
  * alongside the opaque payload — the schema contract of a real video
  * table — and is a plan-side explode, no UDF.
  *
  * All per-payload work runs `mapPartitions`: one codec/buffer init
  * per partition, then the batch streams through — the JVM analogue of
  * `mapInPandas` batching (reference: `etl/pipeline.py` stages media
  * work the same batch-at-a-time way).
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte])
  final case class ImageMeta(doc_id: Long, format: String, width: Int, height: Int,
                             n_pixels: Int, sum_r: Long, sum_g: Long, sum_b: Long)
  final case class ResizedImage(doc_id: Long, width: Int, height: Int, sum_r: Long)
  final case class ImageFeatures(doc_id: Long, features: Array[Float])
  final case class AudioMeta(doc_id: Long, format: String, sample_rate: Int,
                             n_samples: Int, duration_ms: Int, sumsq: Long,
                             peak: Int, zero_crossings: Int)

  // ---- deterministic fixture synthesis (real PNG bytes) ----

  /** Fixture image dims: w in [16,32], h in [12,24]. */
  def imageDims(docId: Long): (Int, Int) =
    ((16 + docId % 17).toInt, (12 + docId % 13).toInt)

  /** Fixture pixel channels — pure integer arithmetic of (doc_id,x,y),
    * so any engine recomputes them without an image library. */
  def pixelR(docId: Long, x: Int, y: Int): Int = ((docId * 31 + x * 7 + y * 13) % 256).toInt
  def pixelG(docId: Long, x: Int, y: Int): Int = ((docId * 17 + x * 11 + y * 5) % 256).toInt
  def pixelB(docId: Long, x: Int, y: Int): Int = ((docId * 13 + x * 3 + y * 19) % 256).toInt

  def synthesizeImage(docId: Long): BufferedImage = {
    val (w, h) = imageDims(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (pixelR(docId, x, y) << 16) | (pixelG(docId, x, y) << 8) | pixelB(docId, x, y))
        x += 1
      }
      y += 1
    }
    img
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  def decodePng(payload: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(payload))

  /** The fixture media table: one real PNG payload per document row.
    * Encoding happens on the executors (`mapPartitions` over doc ids),
    * exactly where a production ingest would decode-and-normalize. */
  def mediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      ImageIO.setUseCache(false) // no disk-backed stream cache on executors
      it.map(id => MediaRecord(id, encodePng(synthesizeImage(id))))
    }
  }

  // ---- real decode ----

  /** Container sniffing from magic bytes — works on any payload, no
    * decode needed (the cheap pre-filter a 100 TB media scan runs
    * before routing to per-format decoders). */
  def sniffFormat(payload: Array[Byte]): String = {
    def at(i: Int): Int = if (i < payload.length) payload(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
    else if (at(0) == 0xff && at(1) == 0xd8) "jpeg"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') "gif"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
             at(8) == 'W' && at(9) == 'E' && at(10) == 'B' && at(11) == 'P') "webp"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
             at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') "wav"
    else "unknown"
  }

  private def channelSums(img: BufferedImage): (Long, Long, Long) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    (sr, sg, sb)
  }

  /** Decode each payload with ImageIO and report real dims + per-channel
    * sums read from the decoded raster. */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { r =>
        val img = decodePng(r.payload)
        val (sr, sg, sb) = channelSums(img)
        ImageMeta(r.doc_id, sniffFormat(r.payload), img.getWidth, img.getHeight,
          img.getWidth * img.getHeight, sr, sg, sb)
      }
    }
  }

  final case class DecodeResult(doc_id: Long, status: String, format: String,
                                width: Int, height: Int, sum_r: Long)

  /** Decode with QUARANTINE: at 100 TB one corrupt payload per billion
    * is a certainty, and a raw `decodePng` would kill the whole job on
    * the first bad row. Every payload decodes to a row — good ones with
    * status `ok` and real raster stats, undecodable ones with a
    * diagnostic status (`corrupt:<reason>`) and zeroed stats — so the
    * pipeline splits good/bad with two filters on ONE pass and the bad
    * set is a queryable quarantine table, not an exception trace. */
  def decodeImagesWithQuarantine(media: Dataset[MediaRecord]): Dataset[DecodeResult] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { r =>
        try {
          val img = decodePng(r.payload)
          if (img == null)
            DecodeResult(r.doc_id, "corrupt:unreadable", sniffFormat(r.payload), 0, 0, 0L)
          else {
            val (sr, _, _) = channelSums(img)
            DecodeResult(r.doc_id, "ok", sniffFormat(r.payload),
              img.getWidth, img.getHeight, sr)
          }
        } catch {
          case e: Exception =>
            DecodeResult(r.doc_id, s"corrupt:${e.getClass.getSimpleName}",
              sniffFormat(r.payload), 0, 0, 0L)
        }
      }
    }
  }

  // ---- real resize ----

  /** Nearest-neighbor resize on the actual raster: dst(x,y) =
    * src(x*srcW/dstW, y*srcH/dstH) with integer division — the mapping
    * is explicit (not Graphics2D's implementation-defined filtering) so
    * the resized pixels are engine-independent. */
  def resizeNearest(img: BufferedImage, maxDim: Int): BufferedImage = {
    val (w, h) = (img.getWidth, img.getHeight)
    val m = math.max(w, h)
    if (m <= maxDim) img
    else {
      val (dw, dh) = (w * maxDim / m, h * maxDim / m)
      val out = new BufferedImage(dw, dh, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < dh) {
        var x = 0
        while (x < dw) {
          out.setRGB(x, y, img.getRGB(x * w / dw, y * h / dh))
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Decode → nearest-neighbor resize → PNG re-encode → decode again:
    * the reported dims/sums come from the re-decoded bytes, proving the
    * full write-read cycle, not just the in-memory transform. */
  def resizeImages(media: Dataset[MediaRecord], maxDim: Int): Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { r =>
        val resized = decodePng(encodePng(resizeNearest(decodePng(r.payload), maxDim)))
        val (sr, _, _) = channelSums(resized)
        ResizedImage(r.doc_id, resized.getWidth, resized.getHeight, sr)
      }
    }
  }

  // ---- real feature extraction ----

  /** 8-bin red-channel histogram fractions from the decoded raster —
    * an `array<float>` embedding per image with the exact batch shape
    * (one kernel pass per partition) a learned extractor would use. */
  def imageFeatures(media: Dataset[MediaRecord], bins: Int = 8): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { r =>
        val img = decodePng(r.payload)
        val counts = new Array[Long](bins)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            counts(((img.getRGB(x, y) >> 16) & 0xff) * bins / 256) += 1
            x += 1
          }
          y += 1
        }
        val n = (img.getWidth * img.getHeight).toDouble
        ImageFeatures(r.doc_id, counts.map(c => (c / n).toFloat))
      }
    }
  }

  // ---- audio path (REAL: PCM16 WAV needs no codec — the RIFF container
  //      and little-endian samples are parsed directly, so decode reads
  //      the actual bytes back, same standing as the PNG path) ----

  /** Fixture sample count: 1000..3000 samples at 8 kHz. */
  def audioLen(docId: Long): Int = (1000 + (docId % 5) * 500).toInt

  val AudioRate = 8000

  /** Fixture PCM sample — pure integer arithmetic of (doc_id, i), full
    * int16 range, so any engine recomputes the exact waveform. */
  def sampleAt(docId: Long, i: Int): Short =
    (((docId * 31 + i.toLong * 7919) % 65536) - 32768).toShort

  def synthesizeAudio(docId: Long): Array[Short] =
    Array.tabulate(audioLen(docId))(i => sampleAt(docId, i))

  /** Encode PCM16 mono samples as a standard RIFF/WAVE byte stream. */
  def encodeWav(samples: Array[Short], sampleRate: Int = AudioRate): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a RIFF/WAVE payload back to (sampleRate, samples): validates
    * the container magics and the PCM16-mono format chunk, then walks
    * the chunk list to the data chunk — a real decode of the bytes, not
    * a lookup of stored metadata. */
  def decodeWav(payload: Array[Byte]): (Int, Array[Short]) = {
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = { val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII") }
    require(fourcc() == "RIFF", "not a RIFF container")
    buf.getInt // riff size
    require(fourcc() == "WAVE", "not a WAVE stream")
    var sampleRate = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && samples == null) {
      val id = fourcc(); val len = buf.getInt
      id match {
        case "fmt " =>
          val fmt = buf.getShort; val ch = buf.getShort
          sampleRate = buf.getInt; buf.getInt; buf.getShort
          val bits = buf.getShort
          require(fmt == 1 && ch == 1 && bits == 16, s"not PCM16 mono: fmt=$fmt ch=$ch bits=$bits")
          buf.position(buf.position() + (len - 16) + (len & 1))
        case "data" =>
          samples = Array.fill(len / 2)(buf.getShort)
        // RIFF chunks are word-aligned: an odd-length foreign chunk
        // carries a pad byte not counted in its length field
        case _ => buf.position(buf.position() + len + (len & 1))
      }
    }
    require(sampleRate > 0 && samples != null, "missing fmt/data chunk")
    (sampleRate, samples)
  }

  /** The fixture audio table: one real WAV payload per document row,
    * encoded on the executors. */
  def audioTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map(id => MediaRecord(id, encodeWav(synthesizeAudio(id))))
    }
  }

  /** Decode each WAV payload and report waveform statistics computed
    * from the decoded samples: energy (sum of squares), peak amplitude,
    * and zero crossings ((prev >= 0) != (cur >= 0)) — the standard
    * cheap audio-quality features a curation pipeline gates on. */
  def decodeAudio(media: Dataset[MediaRecord]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (rate, s) = decodeWav(r.payload)
        var sumsq = 0L; var peak = 0; var zc = 0
        var i = 0
        while (i < s.length) {
          val v = s(i).toInt
          sumsq += v.toLong * v
          if (math.abs(v) > peak) peak = math.abs(v)
          if (i > 0 && ((s(i - 1) >= 0) != (v >= 0))) zc += 1
          i += 1
        }
        AudioMeta(r.doc_id, sniffFormat(r.payload), rate, s.length,
          s.length * 1000 / rate, sumsq, peak, zc)
      }
    }
  }

  // ---- video metadata path (typed metadata alongside opaque payloads;
  //      the JDK ships no video codec, so frame geometry comes from the
  //      table's metadata columns, never from a pretend decode) ----

  /** Synthesized video metadata for fixture rows (doc_id-determined so
    * oracles recompute it): every 3rd document models a video asset. */
  def videoMeta(df: DataFrame): DataFrame =
    df.filter(col("doc_id") % 3 === 2)
      .withColumn("width", (lit(320) + col("doc_id") % 320).cast("int"))
      .withColumn("height", (lit(240) + col("doc_id") % 240).cast("int"))
      .withColumn("n_frames", (lit(1) + col("doc_id") % 16).cast("int"))

  /** Resize-to-fit dims: integer-arithmetic scaled dimensions. Exact in
    * doubles for all plausible dims, so floor(w*maxDim/m) == integer
    * division and any SQL engine reproduces it. Matches
    * [[resizeNearest]]'s dimension rule. */
  def resizeMeta(w: Column, h: Column, maxDim: Int): (Column, Column) = {
    val m = greatest(w, h)
    (when(m <= maxDim, w).otherwise(floor(w * maxDim / m)).cast("int"),
      when(m <= maxDim, h).otherwise(floor(h * maxDim / m)).cast("int"))
  }

  /** Frame sampling: one row per `stride`-th frame of the metadata
    * n_frames — plan-side explode, no UDF; 25 fps timestamps. */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame =
    df.withColumn("frame_idx",
        explode(filter(sequence(lit(0), col("n_frames") - 1),
          i => i % stride === 0)))
      .withColumn("frame_idx", col("frame_idx").cast("int"))
      .withColumn("frame_ts_ms", (col("frame_idx") * 40).cast("int"))
}
