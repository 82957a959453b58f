package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (the manual fallback when AQE's
  * skew-join split isn't enough or isn't available, e.g. bucketed
  * tables or deliberate partitioning).
  *
  * A hot join key puts every matching row of the big side into one
  * shuffle partition. Salting splits each key into `buckets` sub-keys:
  * the big (probe) side gets a per-row salt, the small (build) side is
  * replicated once per salt value, and the join runs on
  * (keys..., salt). Row-for-row the same result as the unsalted join —
  * each big row still meets every small row of its key exactly once —
  * but the hot key now spreads over `buckets` tasks.
  *
  * Cost model: small side is replicated `buckets`x, so pick
  * `buckets` ~ (hot-key rows / average-key rows), and keep the salted
  * path for joins whose build side is far smaller than the probe side
  * (the same regime where broadcasting would be the first choice —
  * salting is for when even the broadcast build side is too large).
  */
object SkewJoin {

  /** Left equi-join on `keys` with `buckets`-way salting. */
  def saltedLeftJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                     buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, keys :+ "__salt", "left").drop("__salt")
  }
}
