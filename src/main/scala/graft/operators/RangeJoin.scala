package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without the nested-loop fallback.
  *
  * `points JOIN intervals ON key AND start <= pt AND pt <= end` is an
  * inequality join: Catalyst plans it as a (broadcast) nested loop —
  * O(|P|·|I|) work per key, which dies at scale the moment either side
  * is large. The scalable shape is equi-binning: explode each interval
  * into the fixed-width bins it covers, map each point to its single
  * bin, hash-join on (key, bin), then re-check the exact containment
  * predicate. Every qualifying (point, interval) pair meets in exactly
  * one bin — the point's — so the output needs no dedup, and the
  * shuffle is a plain hash exchange Catalyst already knows how to
  * optimize (AQE skew split, broadcast if one side is small).
  *
  * Fan-out per interval is span/binWidth + 1 rows: pick `binWidth`
  * near the typical interval span so the index stays ~2× the interval
  * count while bins stay selective. This is the standard time-range
  * index used by interval engines; a merge-based band join would need
  * a custom `SparkPlan` for strictly less generality.
  */
object RangeJoin {

  /** Join each point row to every interval row with equal `keyCols`
    * and `startCol <= ptCol <= endCol` (all three numeric, e.g. epoch
    * micros). Inner join; output = point columns ++ interval payload
    * columns (callers project/rename upstream on collision). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCols: Seq[String], ptCol: String,
                      startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binned = intervals.withColumn("__bin",
      explode(sequence(
        floorDiv(col(startCol), binWidth), floorDiv(col(endCol), binWidth))))
    val p = points.withColumn("__bin", floorDiv(col(ptCol), binWidth))
    p.join(binned, keyCols :+ "__bin")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bin")
  }

  /** INTERVAL-OVERLAP join: every (a, b) pair with equal `keyCols`
    * and `a.start <= b.end AND b.start <= a.end` — the genomics /
    * temporal-overlap workhorse (sessions × promo windows, downtime ×
    * on-call shifts). Same equi-binning as [[pointInInterval]], but a
    * pair of overlapping intervals meets in EVERY bin their spans
    * share — so each surviving pair is counted only in the bin that
    * contains the overlap's START, `max(a.start, b.start)`. That bin
    * is covered by both intervals by definition, making the output
    * exactly-once with no dedup (no distinct, no shuffle beyond the
    * one hash join). Inner join; output = a columns ++ b columns
    * (callers rename upstream on collision). Fan-out per interval is
    * span/binWidth + 1 — pick `binWidth` near the typical span. */
  def intervalOverlap(a: DataFrame, b: DataFrame, keyCols: Seq[String],
                      aStart: String, aEnd: String,
                      bStart: String, bEnd: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val ab = a.withColumn("__bin",
      explode(sequence(
        floorDiv(col(aStart), binWidth), floorDiv(col(aEnd), binWidth))))
    val bb = b.withColumn("__bin",
      explode(sequence(
        floorDiv(col(bStart), binWidth), floorDiv(col(bEnd), binWidth))))
    ab.join(bb, keyCols :+ "__bin")
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col("__bin") ===
        floorDiv(greatest(col(aStart), col(bStart)), binWidth))
      .drop("__bin")
  }

  /** Exact floored integer division: subtracting the nonnegative
    * `pmod` makes the numerator an exact multiple of `w`, so the
    * double divide is exact (no truncate-vs-round edge at bin
    * boundaries) and the floor semantics hold for negatives too. */
  private def floorDiv(c: org.apache.spark.sql.Column, w: Long) =
    ((c.cast("long") - pmod(c.cast("long"), lit(w))) / lit(w)).cast("long")
}
