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

  private[graft] val P = 1000000007L

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

  /** Mergeable bottom-k quantile sketch: per group, keep the `k` rows
    * with the smallest [[sampleHash]] values (a uniform pseudo-random
    * draw that is a commutative-idempotent monoid — the same min-k
    * property [[graft.functions.cat.KmvDistinct]] rides), then report
    * nearest-rank quantiles of the sample. This is the scale path for
    * exact quantiles (q3R): exact needs every group value sorted in
    * one place, the sketch bounds per-group state at `k` rows — and
    * WindowGroupLimit prunes each partition to its local min-k BEFORE
    * the exchange, so the shuffle carries at most k*partitions rows
    * per group regardless of group size.
    *
    * Everything is exact integer hashing plus picking actual data
    * values (no float accumulation), so an oracle replays it
    * bit-for-bit. Returns one row per group:
    * (groupCols*, n_sample, q25, q50, q75, q90). */
  def bottomKQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       idCol: String, k: Int, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val wSample = Window.partitionBy(g: _*)
      .orderBy(sampleHash(col(idCol), salt), col(idCol))
    val sample = df
      .withColumn("__srn", row_number().over(wSample))
      .filter(col("__srn") <= k)
    val wRank = Window.partitionBy(g: _*).orderBy(col(valueCol), col(idCol))
    val ranked = sample
      .withColumn("__vr", row_number().over(wRank))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(g: _*)))
    // nearest-rank pick: index round(p*(n-1)) + 1 in value order
    def pick(p: Double, as: String) =
      max(when(col("__vr") === round(lit(p) * (col("__n") - 1)) + 1,
        col(valueCol))).as(as)
    ranked.groupBy(g: _*)
      .agg(count(lit(1)).as("n_sample"),
        pick(0.25, "q25"), pick(0.50, "q50"), pick(0.75, "q75"),
        pick(0.90, "q90"))
  }

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
