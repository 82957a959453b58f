package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Frequent-term mining with a count-min-sketch pre-filter.
  *
  * Reference analogue: none — engine-completeness operator for corpus
  * profiling at training-data scale (vocabulary heavy hitters over a
  * web-scale token stream).
  *
  * Scale shape: the naive plan (`groupBy(term).count.filter(n >= T)`)
  * shuffles one partial count per distinct term per map partition —
  * at 100 TB the distinct-term universe is billions and dominates the
  * exchange. Here a count-min sketch is first built as a plain
  * (depth × width) aggregation: after map-side combine the sketch
  * shuffle carries at most partitions × depth × width slim rows no
  * matter how large the corpus, and the collected sketch is
  * depth × width longs of bounded driver state (same budget class as
  * the k-means centroid matrix). The sketch is then applied *map-side*
  * as an array literal: occurrences whose CMS estimate is below the
  * threshold are dropped before the exact count's shuffle, so the
  * exact groupBy only ever sees candidate terms. CMS never
  * under-counts, so no true heavy hitter is lost; the final exact
  * filter removes the sketch's false positives — the result is exact,
  * the cost is sketch-bounded.
  *
  * Note the sketch build is an eager Spark action at call time (two
  * jobs total), like `BloomJoin.bloomJoin` — documented rather than
  * hidden because the returned frame is otherwise lazy.
  */
object HeavyHitters {

  private val Bases = Seq(31, 37, 41, 43, 47, 53, 59, 61)
  private val Primes = Seq(1000000007L, 999999937L, 1000000021L, 999999893L,
    1000000033L, 999999883L, 1000000087L, 999999797L)

  /** CMS cell index of `term` under hash row `i`: the shared polynomial
    * hash at a per-row (base, prime), folded into [0, width). */
  private def cell(term: Column, i: Int, width: Int): Column =
    pmod(TextFunctions.polyHash(term, Bases(i), Primes(i)), lit(width)).cast("int")

  /** All `depth` cell indices of `term` as an array — the shared cell
    * derivation for the batch build here and the streaming sketch in
    * `StreamingFlows.cmsCells` (cell sums form a commutative monoid,
    * so batch and stream materializations agree exactly). */
  private[graft] def cells(term: Column, depth: Int, width: Int): Column = {
    require(depth >= 1 && depth <= Bases.length,
      s"depth must be in [1, ${Bases.length}], got $depth")
    array((0 until depth).map(i => cell(term, i, width)): _*)
  }

  /** Exact counts (`term`, `n`) of the terms occurring at least
    * `threshold` times in `terms` (one row per occurrence of
    * `termCol`). Null terms are ignored. */
  def exactOverThreshold(terms: DataFrame, termCol: String, threshold: Long,
      depth: Int = 4, width: Int = 4096): DataFrame = {
    require(depth >= 1 && depth <= Bases.length,
      s"depth must be in [1, ${Bases.length}], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val t = terms.select(col(termCol).cast("string").as("term"))
      .where(col("term").isNotNull)

    // Sketch build: depth rows per occurrence, combined map-side down to
    // <= depth × width partials per partition before the exchange.
    val counts = t.select(posexplode(cells(col("term"), depth, width))
        .as(Seq("i", "cell")))
      .groupBy("i", "cell").count()
      .collect()
    val flat = Array.fill[Long](depth * width)(0L)
    counts.foreach(r => flat(r.getInt(0) * width + r.getInt(1)) = r.getLong(2))

    // Map-side estimate = min over hash rows; prune before the shuffle.
    val sketch = lit(flat)
    val est = least((0 until depth).map(i =>
      element_at(sketch, cell(col("term"), i, width) + (i * width + 1))): _*)
    t.where(est >= threshold)
      .groupBy("term").agg(count(lit(1)).as("n"))
      .where(col("n") >= threshold)
  }
}
