package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass column profiler: per-column row/null/distinct counts —
  * the data-quality gate a pipeline runs before a load (the reference
  * verifies row counts at load time, `etl/loader.py:214-222`; this is
  * the per-column generalization).
  *
  * Scale shape: ONE aggregate over one scan. The multi-column distinct
  * counts share the scan via Spark's Expand-based multi-distinct
  * rewrite (rows × columns expanded, then partial+final aggregation) —
  * still a single pass over the data with map-side partials, no
  * per-column jobs and nothing driver-side. The 1×wide result row is
  * unpivoted plan-side with `stack`.
  */
object Profiler {

  /** Profile `columns` of `df`: one output row per column with the
    * total row count, null count, and exact distinct count (nulls
    * excluded from distinct, standard SQL semantics).
    * Output: (col_name, n_rows, n_nulls, n_distinct). */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = Seq(count(lit(1)).as("__n")) ++ columns.zipWithIndex.flatMap {
      case (c, i) =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$i"),
          countDistinct(col(c)).as(s"__nd_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = columns.zipWithIndex
      .map { case (c, i) => s"'$c', __nulls_$i, __nd_$i" }.mkString(", ")
    one.selectExpr("__n",
        s"stack(${columns.size}, $stackArgs) AS (col_name, n_nulls, n_distinct)")
      .select(col("col_name"), col("__n").as("n_rows"),
        col("n_nulls"), col("n_distinct"))
  }

  /** Equi-width histogram of a numeric column over [lo, hi): map-side
    * bin assignment, one groupBy — the distribution profile behind
    * quality thresholds and skew checks. Out-of-range values clamp to
    * the edge bins; nulls are excluded. The bin arithmetic is plain
    * IEEE (one division making the width, one subtract/divide/floor
    * per row), so any engine reproduces the exact same bins.
    * Output: (bin, bin_lo, n). */
  def histogram(df: DataFrame, column: String, lo: Double, hi: Double,
                bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val w = (hi - lo) / bins
    val bin = least(greatest(floor((col(column) - lo) / w), lit(0.0)),
      lit((bins - 1).toDouble)).cast("int")
    // col === col is false for NaN (and null), true for everything
    // else including non-floating types — NaN must not become a bin
    df.filter(col(column).isNotNull && (col(column) === col(column)))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", lit(lo) + col("bin") * w)
      .select("bin", "bin_lo", "n")
      .orderBy("bin")
  }

  /** Join-key skew report: the `topK` heaviest keys with their share of
    * all rows — the diagnosis that decides WHEN the salted join
    * ([[SkewJoin]]) or AQE skew handling is worth its overhead. One
    * partial+final count aggregate; the global top-k is a
    * TakeOrderedAndProject (per-partition heaps, no global sort); the
    * row total rides a broadcast scalar. Deterministic: ties rank by
    * key. Output: (keyCols*, n, share). */
  def skewReport(df: DataFrame, keyCols: Seq[String], topK: Int): DataFrame = {
    val g = keyCols.map(col)
    val counts = df.groupBy(g: _*).agg(count(lit(1)).as("n"))
    val total = df.agg(count(lit(1)).as("__total"))
    counts
      .orderBy(col("n").desc +: g.map(_.asc): _*)
      .limit(topK)
      .crossJoin(broadcast(total))
      .select((g :+ col("n") :+
        (col("n").cast("double") / col("__total")).as("share")): _*)
      .orderBy(col("n").desc +: g.map(_.asc): _*)
  }

  /** Z-score anomaly flags per group: rows whose value sits more than
    * `sigma` standard deviations from their group's mean. Moments come
    * from EXACT decimal sums (order-independent, so partial
    * aggregation cannot perturb them) divided in doubles — var_samp's
    * float partial sums would make flags depend on partitioning; this
    * form is bit-reproducible on any engine. The per-group stats frame
    * is tiny and broadcast back, so flagging is one scan, one
    * aggregate, one map-side join.
    * Output: (idCol, groupCols*, valueCol, z). */
  def anomalyFlags(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   idCol: String, sigma: Double): DataFrame = {
    val g = groupCols.map(col)
    val stats = df.groupBy(g: _*).agg(
      count(lit(1)).as("__n"),
      sum(col(valueCol).cast("decimal(38,12)")).cast("double").as("__s1"),
      sum((col(valueCol) * col(valueCol)).cast("decimal(38,12)"))
        .cast("double").as("__s2"))
    val mean = col("__s1") / col("__n")
    val variance = col("__s2") / col("__n") - mean * mean
    val z = (col(valueCol) - mean) / sqrt(variance)
    // zero-variance groups flag nothing BY CONSTRUCTION (every value is
    // the mean); without the guard Spark's x/0.0 = Infinity would flag
    // every row while engines returning NULL on /0 (DuckDB) drop them —
    // a cross-engine divergence on the degenerate edge.
    df.join(broadcast(stats), groupCols)
      .filter(variance > 0 && abs(z) > sigma)
      .select((col(idCol) +: g) :+ col(valueCol) :+ round(z, 6).as("z"): _*)
  }
}
