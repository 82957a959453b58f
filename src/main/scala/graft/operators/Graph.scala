package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected edge list.
  *
  * Reference analogue: none — engine-completeness graph analytics
  * (dup-cluster graphs, co-occurrence graphs and similarity graphs all
  * come out of this engine's other operators as edge lists; triangle
  * participation is the standard cohesion signal over them).
  *
  * Scale shape: the naive wedge join explodes on hub nodes (a node of
  * degree d contributes d² wedges). The degree-ordered orientation
  * (each edge points from its (degree, id)-smaller endpoint to the
  * larger; "compact-forward") caps every node's OUT-degree at
  * O(sqrt(m)) regardless of its raw degree, so wedge generation is
  * bounded and the hot-key skew a power-law graph would inflict on
  * the self-join disappears. Both joins are plain equi-joins on node
  * ids — shuffles carry slim (int, int) pairs, and the closing probe
  * can broadcast whenever the oriented edge list is small.
  */
object Graph {

  /** Canonical undirected edges: (a, b) with a < b, distinct,
    * self-loops dropped. */
  def canonicalEdges(pairs: DataFrame, srcCol: String, dstCol: String): DataFrame =
    pairs.select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") < col("b"))
      .distinct()

  /** Triangles of the undirected graph given by canonical `edges`
    * (columns `a`, `b`): one row per triangle, vertices sorted
    * ascending as (x, y, z) — orientation-invariant output. */
  def triangles(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient each edge from (deg, id)-smaller to larger endpoint
    val keyA = struct(col("da").as("d"), col("a").as("n"))
    val keyB = struct(col("db").as("d"), col("b").as("n"))
    val oriented = edges
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(keyA < keyB, col("a")).otherwise(col("b")).as("src"),
        when(keyA < keyB, col("b")).otherwise(col("a")).as("dst"),
        when(keyA < keyB, keyB).otherwise(keyA).as("dstKey"))
    // wedges around a shared source, pair ordered by the orientation key
    // so the closing edge exists in oriented form iff the wedge closes
    val e1 = oriented.select(col("src"), col("dst").as("v"), col("dstKey").as("vk"))
    val e2 = oriented.select(col("src"), col("dst").as("w"), col("dstKey").as("wk"))
    val wedges = e1.join(e2, Seq("src")).where(col("vk") < col("wk"))
      .select(col("src").as("apex"), col("v"), col("w"))
    val closing = oriented.select(col("src").as("v"), col("dst").as("w"))
    wedges.join(closing, Seq("v", "w"))
      .select(array_sort(array(col("apex"), col("v"), col("w"))).as("t"))
      .select(element_at(col("t"), 1).as("x"), element_at(col("t"), 2).as("y"),
        element_at(col("t"), 3).as("z"))
  }

  /** Per-node triangle participation: (node, n_tri) for every node in
    * at least one triangle. */
  def triangleCounts(edges: DataFrame): DataFrame =
    triangles(edges)
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))

  /** PageRank over the undirected graph of canonical `edges`, in
    * SCALED-INTEGER arithmetic: ranks carry `scale` fixed-point units
    * and every step is integer multiply / truncating divide, so the
    * result is bit-exact in any engine with 64-bit integers (float
    * PageRank is not — parallel sum order perturbs the low bits).
    * Damping 17/20 (= 0.85) keeps the damping step integral.
    *
    * Scale shape: each of the `iters` rounds is one equi-join of the
    * directed edge list against the rank table plus one groupBy —
    * both hash-partitioned on the node key, no driver-side state but
    * the single node count. The rank plan is truncated every
    * `checkpointEvery` rounds: two joins per round COMPOUND the lazy
    * plan (and Catalyst's sizeInBytes estimate multiplies per join, the
    * exact BigInteger planning cliff `DedupClusters.resolve`
    * documents), so the checkpoint is rebuilt into a fresh LogicalRDD
    * with constant stats, exactly as the CC doubling phase does.
    *
    * Undirected edges mean every node has out-degree >= 1 — no
    * dangling-mass correction needed. */
  def pageRankScaled(edges: DataFrame, iters: Int = 5,
      scale: Long = 1000000000000L, checkpointEvery: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters must be in [1,20], got $iters")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1")
    // Materialize the directed edge list once: every iteration joins
    // against it, and without the lineage cut Spark would recompute the
    // upstream edge derivation (often itself a join) per round — the
    // same plan-growth cliff DedupClusters.resolve documents.
    val g = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    val deg = g.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val n = deg.count() // bounded driver scalar (node count)
    val base = (3 * scale) / (20 * n) // 0.15 * scale / n, truncated
    var ranks = deg.select(col("src").as("node"), col("outdeg"),
      lit(scale / n).as("r"))
    for (i <- 1 to iters) {
      val contrib = g.join(ranks, g("src") === ranks("node"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      ranks = deg.join(contrib, deg("src") === contrib("dst"), "left")
        .select(col("src").as("node"), col("outdeg"),
          (lit(base) + expr("(17 * coalesce(s, 0L)) div 20")).as("r"))
      if (i % checkpointEvery == 0 && i < iters) {
        val cp = ranks.localCheckpoint()
        ranks = cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
      }
    }
    ranks.select(col("node"), col("r").as("rank_scaled"))
  }
}
