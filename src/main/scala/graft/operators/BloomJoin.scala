package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.cat.{BloomAgg, GraftExpr}

/** Bloom semi-join pre-filter: build a deterministic bloom filter over
  * the small side's join keys, probe it on the big side *before* the
  * join, then run the exact join — identical results (no false
  * negatives; false positives are removed by the join itself), but the
  * join exchange only carries big-side rows that can possibly match.
  *
  * Why an explicit operator when AQE has runtime bloom injection
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`): the optimizer
  * only fires on shuffle-join patterns it recognizes, inside one
  * query. The operator form lets a pipeline build the filter once and
  * reuse it across many queries/batches (e.g. an incremental-dedup
  * index, a decontamination key set), and makes the pruning
  * plan-visible and testable.
  *
  * NOTE [[bloomJoin]] is EAGER: it runs one Spark action (the filter
  * build, plus a count for the auto-sized form) at DataFrame-
  * construction time, unlike the lazily-composed operators elsewhere
  * in this package. Build once, reuse via [[prefilter]] when composing.
  *
  * Scale shape at 100 TB: the filter is constant-size (numBits/8
  * bytes), built with map-side-combined OR partials. Small filters
  * ship to the probe side inlined in the plan; above
  * [[LiteralBloomMaxBytes]] the same kernel reads a broadcast variable
  * instead, so a big filter is shipped to each executor once rather
  * than serialized into every task's plan. The probe is one codegen'd
  * kernel call in the scan stage, so pruning happens before any
  * exchange — the join shuffle shrinks by (1 - selectivity) of the big
  * side, which for a selective dimension is 10-100x less shuffle I/O.
  *
  * Sizing: a FIXED geometry silently stops pruning at scale — at 100x
  * the build cardinality the false-positive rate of an undersized
  * filter approaches 1 and the prefilter keeps everything (still
  * correct, pointless). [[geometry]] derives (numBits, k) from the
  * build-side count and a target false-positive rate with the standard
  * m = -n ln p / (ln 2)^2, k = (m/n) ln 2 formulas, so the filter
  * grows with the data; LayoutSpec asserts the measured FPR holds at
  * 1x and 10x build cardinality.
  */
object BloomJoin {

  /** Plan-literal size cap: filters at or below this ship as a foldable
    * literal (codegen folds the array reference); larger ones go
    * through a broadcast variable to keep task plans slim. */
  val LiteralBloomMaxBytes: Long = 4L << 20

  /** Hard cap on filter size: 2^27 bits = 16 MiB covers ~10^7 keys at
    * 1% fpp; beyond that a bloom stops being "the small side". */
  val MaxBits: Int = 1 << 27

  /** Optimal bloom geometry for `expectedKeys` at `fpp`: numBits from
    * m = -n ln p / (ln 2)^2 rounded UP to a power of two (the kernels
    * mask positions with m-1), k = round((m/n) ln 2), both clamped to
    * sane bounds. Rounding m up only lowers the realized fpp. */
  def geometry(expectedKeys: Long, fpp: Double): (Int, Int) = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val n = math.max(1L, expectedKeys)
    val ln2 = math.log(2.0)
    val mIdeal = -n * math.log(fpp) / (ln2 * ln2)
    var m = 1 << 10
    while (m < mIdeal && m < MaxBits) m <<= 1
    val k = math.max(1, math.min(16, math.round(m.toDouble / n * ln2).toInt))
    (m, k)
  }

  /** Build the bloom over `small(smallKey)`. One bounded driver row
    * (numBits/8 bytes), same legitimacy as the IVF centroid collect
    * (`Similarity.scala`). */
  def buildBloom(small: DataFrame, smallKey: String, numBits: Int, k: Int): Array[Long] =
    small.agg(BloomAgg(col(smallKey), numBits, k).as("bloom"))
      .head().getSeq[Long](0).toArray

  /** Probe-side filter: keep rows whose key might be in the bloom.
    * Small filters inline as a plan literal; large ones ride a
    * broadcast variable (one copy per executor, not per task plan). */
  def prefilter(big: DataFrame, bigKey: String, bloom: Array[Long], k: Int): DataFrame =
    if (bloom.length * 8L <= LiteralBloomMaxBytes)
      big.filter(GraftExpr.bloomMightContain(col(bigKey).cast("long"), lit(bloom), k))
    else {
      val bc = big.sparkSession.sparkContext.broadcast(bloom)
      big.filter(GraftExpr.bloomMightContainBcast(col(bigKey).cast("long"), bc, k))
    }

  /** Exact inner equi-join with bloom pre-pruning of the big side,
    * explicit geometry. EAGER: builds the filter now (one action). */
  def bloomJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
                numBits: Int, k: Int): DataFrame = {
    val bloom = buildBloom(small, smallKey, numBits, k)
    prefilter(big, bigKey, bloom, k).join(small, col(bigKey) === col(smallKey))
  }

  /** Exact inner equi-join with bloom pre-pruning, geometry sized from
    * the build side's actual cardinality at the target false-positive
    * rate. EAGER: runs the build-side count and the filter build (two
    * actions) now. */
  def bloomJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
                fpp: Double = 0.01): DataFrame = {
    val (numBits, k) = geometry(small.count(), fpp)
    bloomJoin(big, small, bigKey, smallKey, numBits, k)
  }
}
