package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic sampling for dataset curation and mixing.
  *
  * `df.sample` draws from a per-partition RNG: its output changes with
  * partition layout, repartition counts, and Spark version — useless
  * for a reproducible training mixture. Hash sampling decides
  * per-*row* from a key: keep iff mix(hash(key:salt)) % den < num.
  * Stable under any shuffle, re-runnable years later, reproducible by
  * any engine with 64-bit integers (the oracle mirrors the
  * arithmetic), and changing the salt draws an independent sample.
  *
  * The polynomial hash of a short key is bounded by ~31^len — far from
  * uniform mod den — so two LCG mix rounds (same trick as the KMV
  * sketch) wrap values across the full [0, p) domain first.
  */
object Sampling {

  private val P = 1000000007L

  /** Mixed per-row hash in [0, p): polyHash(key ":" salt) then two LCG
    * rounds. All exact integer Column arithmetic. */
  def sampleHash(key: Column, salt: String): Column = {
    val h0 = TextFunctions.polyHash(concat(key.cast("string"), lit(":" + salt)))
    val h1 = (h0 * 48271L + 11L) % P
    (h1 * 48271L + 11L) % P
  }

  /** Keep `num`/`den` of rows, decided by the key hash. */
  def hashSample(df: DataFrame, keyCol: String, num: Int, den: Int,
                 salt: String): DataFrame =
    df.filter(sampleHash(col(keyCol), salt) % den < num)

  /** Stratified mixing: per-stratum keep rates `num(stratum)/den`
    * (unlisted strata use `defaultNum`). One scan, one filter — the
    * mixture is a pure map-side decision that composes with any
    * downstream pipeline. */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           rates: Seq[(String, Int)], defaultNum: Int, den: Int,
                           salt: String): DataFrame = {
    val num = rates.foldRight(lit(defaultNum): Column) { case ((s, n), acc) =>
      when(col(strataCol) === s, lit(n)).otherwise(acc)
    }
    df.filter(sampleHash(col(keyCol), salt) % den < num)
  }

  /** Fractional UPSAMPLING for corpus mixing: repeat each row
    * `num`/`den` times in expectation — floor(num/den) guaranteed
    * copies plus one more when the key hash lands under the fractional
    * remainder — so a 5/2 rate emits 2 or 3 copies per row,
    * deterministically. High-quality sources are usually repeated
    * 2-4x in pretraining mixtures (fractional epochs); doing it with
    * hash-decided copies keeps the mixture a pure function of the
    * data: partition-order independent, rerun-stable, and exactly
    * reproducible by any engine. `copy_id` (0-based) distinguishes
    * the repeats downstream (e.g. packSequences treats copies as
    * distinct documents via a composite key). Map-side explode of a
    * per-row sequence — no shuffle, no RNG.
    * num/den <= 1 degrades to [[hashSample]]'s keep-or-drop. */
  def weightedRepeat(df: DataFrame, keyCol: String, num: Int, den: Int,
                     salt: String): DataFrame = {
    require(num >= 0 && den >= 1, s"need num >= 0, den >= 1; got $num/$den")
    val copies = lit(num / den) +
      when(sampleHash(col(keyCol), salt) % den < num % den, 1).otherwise(0)
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("copy_id", explode(sequence(lit(0), col("__copies") - 1)))
      .drop("__copies")
  }
}
