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
  * Scale shape at 100 TB: the filter is constant-size (numBits/8
  * bytes — 16 MiB covers ~10^8 keys at 1% fpp with k=7), built with
  * map-side-combined OR partials, and shipped to the probe side as a
  * literal (to ~16 MiB; beyond that switch the same kernel to a
  * broadcast variable). The probe is one codegen'd kernel call in the
  * scan stage, so pruning happens before any exchange — the join
  * shuffle shrinks by (1 - selectivity) of the big side, which for a
  * selective dimension is 10-100x less shuffle I/O.
  */
object BloomJoin {

  /** Build the bloom over `small(smallKey)`. One bounded driver row
    * (numBits/8 bytes), same legitimacy as the IVF centroid collect
    * (`Similarity.scala`). */
  def buildBloom(small: DataFrame, smallKey: String, numBits: Int, k: Int): Array[Long] =
    small.agg(BloomAgg(col(smallKey), numBits, k).as("bloom"))
      .head().getSeq[Long](0).toArray

  /** Probe-side filter: keep rows whose key might be in the bloom. */
  def prefilter(big: DataFrame, bigKey: String, bloom: Array[Long], k: Int): DataFrame =
    big.filter(GraftExpr.bloomMightContain(col(bigKey).cast("long"), lit(bloom), k))

  /** Exact inner equi-join with bloom pre-pruning of the big side. */
  def bloomJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
                numBits: Int = 1 << 20, k: Int = 7): DataFrame = {
    val bloom = buildBloom(small, smallKey, numBits, k)
    prefilter(big, bigKey, bloom, k).join(small, col(bigKey) === col(smallKey))
  }
}
