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
  * Neighbor-min rounds needed = graph diameter; near-dup clusters are
  * tiny near-cliques (diameter 1-3) so they converge in a handful of
  * rounds, and entity-resolution name chains measured diameter ~31
  * (q4N at sf0.1). Past `doublingAfter` rounds each round also adopts
  * the label OF its label (pointer doubling), bounding any deeper
  * graph at O(log diameter) further rounds — see `resolve` for the
  * measured cost tradeoff that sets the switch point.
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

  /** `doublingAfter`: rounds of plain neighbor-min propagation before
    * each round ALSO adopts the label of its label (pointer doubling).
    * Measured tradeoff (PLANS.md "Pointer doubling in CC, round-6
    * re-measurement"): a doubling round costs ~6x a neighbor-min round
    * (a second materialization plus a sort-merge self-join), so for
    * typical dedup/entity graphs (diameter <= ~32) doubling from round
    * one is a net LOSS (q4N: 8.1 s -> 12.8 s), while past the switch
    * point the round count is logarithmic and a 511-diameter chain
    * finishes ~8x faster than neighbor-min would. The default switch
    * point sits past every measured production graph's convergence
    * (q4N converges at 31 — a switch at 32 made its LAST rounds pay
    * the doubling premium for nothing, 8.1 s -> 11.1 s), so shallow
    * graphs never leave the cheap path and deep ones stay bounded. */
  def resolve(pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b",
              maxIter: Int = 64, doublingAfter: Int = 48): DataFrame = {
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
      // Neighbor-min step, then a pointer-doubling hop (adopt the label
      // OF your label) for O(log diameter) rounds. The hop self-join
      // MUST run against a checkpointed frame: the first, rejected
      // attempt self-joined the un-checkpointed step and the driver
      // spun 600+ s in Catalyst plan-statistics BigInteger arithmetic
      // (PLANS.md "Pointer doubling in CC"). With the lineage cut the
      // stats tree is flat and the hop costs one extra materialization
      // per round — measured worth it once q4N's real name-chain graph
      // turned out to have diameter 30+, not the near-clique 1-3 the
      // dedup graphs have.
      val stepped0 =
        labels.join(nmin, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      val next =
        if (iter < doublingAfter) stepped0
        else {
          // Pointer-doubling hop: adopt the label OF your label. The
          // self-join must run against a frame REBUILT from the
          // checkpointed RDD — localCheckpoint PRESERVES source-plan
          // statistics, and a self-join squares sizeInBytes every
          // round, so the bit-length doubles per round and the driver
          // spins in BigInteger ToomCook3 stats arithmetic (jstack-
          // verified twice: round 6 original and the checkpoint-only
          // retry). createDataFrame gives a fresh LogicalRDD with
          // constant default stats.
          val cp = stepped0.localCheckpoint()
          val stepped = cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
          stepped.alias("x")
            .join(stepped.select(col("id").as("lid"), col("label").as("ll")),
              col("x.label") === col("lid"), "left")
            .select(col("x.id").as("id"),
              least(col("x.label"), coalesce(col("ll"), col("x.label"))).as("label"))
        }
      val (cp0, s) = checkpointWithSum(next)
      labels =
        if (iter < doublingAfter) cp0
        else cp0.sparkSession.createDataFrame(cp0.rdd, cp0.schema)
      // compareTo, not equals: BigDecimal.equals is scale-sensitive, so a
      // change in either aggregation's result scale would make equal sums
      // compare unequal and the loop spin to maxIter. Null sums (empty
      // graph) compare equal to each other.
      done = (s == null && prevSum == null) ||
        (s != null && prevSum != null && s.compareTo(prevSum) == 0)
      prevSum = s
      iter += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[graft-cc] round=$iter sum=$s done=$done " +
          s"t=${System.nanoTime() / 1000000}ms")
    }
    edges.unpersist()
    require(done, s"connected components did not converge in $maxIter rounds " +
      "(graph diameter exceeds maxIter) — raise maxIter")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_keeper"))
  }

  /** Block-local resolution: when every edge was generated WITHIN a
    * blocking key (blocked record linkage, per-domain entity
    * resolution — `FuzzyJoin.selfPairs` with `blockCols`), no component
    * can span blocks, so the fixpoint needs no iteration at all: edges
    * group by block and a union-find closes each block in one pass.
    * ONE exchange replaces diameter-many join+agg rounds — on a real
    * cluster the iterative path pays a scheduler round-trip PER ROUND
    * (q4N's name chains: 31 rounds), which dominates long before data
    * volume does.
    *
    * Skew safety: a block whose edge count exceeds `maxBlockEdges`
    * (default 4M ≈ tens of MB of per-task state) is excluded from the
    * local pass and falls back to the distributed hybrid [[resolve]] —
    * correctness never depends on the bound, only the per-task memory
    * budget. The count pre-pass reads the checkpointed slim edge
    * triples once; only over-bound block KEYS reach the driver
    * (≤ totalEdges / maxBlockEdges of them).
    *
    * The blocking columns are hashed to one 64-bit grouping key; a
    * hash collision merely co-locates two unconnected blocks in one
    * union-find, which yields identical components.
    *
    * CONTRACT (and its guard): correctness requires that no node's
    * edges span two blocking keys — a cross-block node would get one
    * label per block where [[resolve]] computes a single merged
    * component, and nothing downstream would notice. With `validate`
    * on (the default) the output plan carries a per-doc_id cardinality
    * assertion: any doc_id labeled twice fails the job loudly instead
    * of shipping silently-wrong clusters. The check is one extra
    * hash exchange over the slim (doc_id, label) output — skip it via
    * `validate = false` only when the edge generator structurally
    * guarantees the contract (e.g. `FuzzyJoin.selfPairs`, whose block
    * key is a FUNCTION of the node's own attributes, so a node's
    * every edge shares its block). */
  def resolveBlocked(pairs: DataFrame, aCol: String = "doc_a",
                     bCol: String = "doc_b",
                     blockCols: Seq[String] = Nil,
                     maxBlockEdges: Long = 4L * 1024 * 1024,
                     maxIter: Int = 64,
                     validate: Boolean = true): DataFrame = {
    require(blockCols.nonEmpty, "resolveBlocked needs blocking columns; " +
      "use resolve for unblocked pair graphs")
    val spark = pairs.sparkSession
    import spark.implicits._
    val e = pairs.select(xxhash64(blockCols.map(col): _*).as("bk"),
        col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .localCheckpoint() // edges are usually an expensive fuzzy join; read them once
    val big = e.groupBy("bk").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBlockEdges).select("bk").as[Long].collect().toSet
    val local = (if (big.isEmpty) e else e.filter(!col("bk").isin(big.toSeq: _*)))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups((_, it) => unionFindMin(it.map(t => (t._2, t._3))))
      .toDF("doc_id", "cluster_keeper")
    val out =
      if (big.isEmpty) local
      else local.unionAll(resolve(e.filter(col("bk").isin(big.toSeq: _*)),
        "src", "dst", maxIter))
    if (!validate) out
    else {
      // assert_true sits inside a filter so column pruning cannot drop
      // it: a doc_id appearing under two blocks (contract violation)
      // fails the job instead of emitting conflicting labels.
      val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      out.withColumn("__n", count(lit(1)).over(w))
        .filter(assert_true(col("__n") === 1,
          concat(lit("resolveBlocked contract violated: doc_id "),
            col("doc_id"),
            lit(" has edges under multiple blocking keys; " +
              "use resolve() for cross-block graphs"))).isNull)
        .drop("__n")
    }
  }

  /** In-memory union-find over one block's edges: every node that
    * appears gets (node, component-min). Union always attaches the
    * larger root under the smaller, so a root IS its component's
    * running minimum; path halving keeps finds near-constant. State is
    * one long-to-long map over the block's nodes — bounded by the
    * caller's `maxBlockEdges`. */
  private[graft] def unionFindMin(edges: Iterator[(Long, Long)])
      : Iterator[(Long, Long)] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(a: Long): Long = {
      var x = a
      while (parent(x) != x) {
        val p = parent(x)
        parent(x) = parent(p) // path halving
        x = parent(x)
      }
      x
    }
    edges.foreach { case (s, d) =>
      if (!parent.contains(s)) parent.update(s, s)
      if (!parent.contains(d)) parent.update(d, d)
      val rs = find(s)
      val rd = find(d)
      if (rs < rd) parent.update(rd, rs)
      else if (rd < rs) parent.update(rs, rd)
    }
    val nodes = parent.keys.toArray // snapshot: find() mutates the map
    nodes.iterator.map(n => (n, find(n)))
  }
}
