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
}
