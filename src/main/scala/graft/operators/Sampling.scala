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
}
