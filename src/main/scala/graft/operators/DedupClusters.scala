package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected-components resolution of near-duplicate pair graphs: the
  * pair output of `TextDedup` (q25/q26/q27) names *edges*, but a
  * training-data pipeline keeps one document per duplicate *cluster* —
  * this operator turns (doc_a, doc_b) edges into (doc_id,
  * cluster_keeper) where the keeper is the minimum doc id in the
  * component (the same survivor rule as `TextDedup.exactDedup`).
  *
  * Algorithm: iterative min-label propagation (the "hash-to-min" CC
  * family). Every node starts labeled with itself; each round every
  * node takes the min of its own and its neighbors' labels; fixpoint =
  * component minima. Each round is one hash join (edges × labels on
  * dst) plus one groupBy(src) min — both partition on node ids, no
  * all-pairs anything — and lineage is truncated per round with
  * `localCheckpoint` so the plan stays flat however many rounds run.
  * Rounds needed = graph diameter; near-dup clusters are tiny
  * near-cliques (diameter 1-3), so this converges in a handful of
  * rounds even at corpus scale. (At extreme diameters the
  * large-star/small-star variant halves the round count; not needed
  * for dedup graphs.)
  *
  * Convergence is detected by the label sum (labels only ever
  * decrease, so an unchanged sum means a fixpoint) — one scalar per
  * round instead of a change-count join.
  */
object DedupClusters {

  /** Materialize one round's labels AND its label sum in a single job:
    * the sum rides the checkpoint materialization as a CollectMetrics
    * observation instead of a second scan+agg job — under a contended
    * scheduler every avoided stage barrier counts. The observation
    * listener is asynchronous, so poll briefly and fall back to a
    * direct (cheap, checkpoint-backed) agg job if it never fires. */
  private def checkpointWithSum(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
    val obs = org.apache.spark.sql.Observation()
    val cp = df.observe(obs, sum(col("label").cast("decimal(38,0)")).as("s"))
      .localCheckpoint()
    import org.apache.spark.sql.graftbridge.Bridge.observationOrEmpty
    var m = observationOrEmpty(obs)
    var tries = 0
    while (m.isEmpty && tries < 100) { Thread.sleep(5); m = observationOrEmpty(obs); tries += 1 }
    val s =
      if (m.nonEmpty) m("s").asInstanceOf[java.math.BigDecimal]
      else {
        System.err.println("[graft] CC observation never fired; falling back to agg job")
        cp.agg(sum(col("label").cast("decimal(38,0)"))).collect()(0).getDecimal(0)
      }
    (cp, s)
  }

  def resolve(pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b",
              maxIter: Int = 20): DataFrame = {
    val e0 = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    val edges = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var (labels, prevSum) = checkpointWithSum(
      edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("label")))
    var done = false
    var iter = 0
    while (!done && iter < maxIter) {
      val nmin = edges
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("nl")).as("nmin"))
      // NOTE pointer doubling (joining `stepped` against itself to also
      // adopt the label of one's label, for O(log diameter) rounds) was
      // measured and REJECTED here: the un-checkpointed self-join makes
      // the driver spin in Catalyst plan-statistics BigInteger
      // arithmetic (jstack: main thread 600+ s inside
      // BigInteger.multiplyToomCook3) — planning cost, not compute.
      // See PLANS.md "Pointer doubling in CC".
      val (cp, s) = checkpointWithSum(
        labels.join(nmin, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("label")))
      labels = cp
      // compareTo, not equals: BigDecimal.equals is scale-sensitive, so a
      // change in either aggregation's result scale would make equal sums
      // compare unequal and the loop spin to maxIter. Null sums (empty
      // graph) compare equal to each other.
      done = (s == null && prevSum == null) ||
        (s != null && prevSum != null && s.compareTo(prevSum) == 0)
      prevSum = s
      iter += 1
    }
    edges.unpersist()
    require(done, s"connected components did not converge in $maxIter rounds " +
      "(graph diameter exceeds maxIter) — raise maxIter")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_keeper"))
  }
}
