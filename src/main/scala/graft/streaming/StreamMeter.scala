package graft.streaming

/** Per-query wall-clock meter for the COMPUTE portion of a streaming
  * flow — the spans spent inside `processAllAvailable`, i.e. actual
  * micro-batch execution. Everything else in a streaming query's wall
  * (stream start, state-store init, stop, sink compaction planning) is
  * fixed harness overhead that dominates at test scale but amortizes
  * to nothing on a long-lived production stream. Bench reads this to
  * report `setup`/`compute` separately, so the catalog's "slowest
  * queries" list reflects plan cost, not start/stop tax.
  *
  * Accumulating and thread-safe: a query's replay loop may call
  * [[timed]] several times (once per chunk); Bench [[reset]]s between
  * reps. */
object StreamMeter {
  private val ns = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def timed[T](query: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally ns.merge(query, System.nanoTime() - t0, (a, b) => a + b)
  }

  def reset(query: String): Unit = ns.remove(query)

  /** Start a streaming query with `n` shuffle partitions (the setting
    * binds into the query AT START and persists for its lifetime),
    * restoring the session value immediately so batch plans are
    * untouched. Stateful streams commit one state-store instance PER
    * PARTITION per micro-batch — at test scale that fixed machinery
    * dwarfs the data, so replays size partitions to key cardinality
    * rather than cores (exactly what a deployment tunes). */
  def startWithPartitions[T](spark: org.apache.spark.sql.SparkSession,
                             n: Int)(start: => T): T = {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try start finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  /** Accumulated compute seconds for `query`, if any span was timed. */
  def computeSec(query: String): Option[Double] =
    Option(ns.get(query)).map(_.toDouble / 1e9)
}
