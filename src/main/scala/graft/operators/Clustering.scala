package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over an embedding column, and the
  * SemDeDup-style semantic dedup built on it (Abbas et al. 2023:
  * cluster the corpus, then drop near-identical items *within* each
  * cluster — the cluster bound is what makes the pairwise step
  * feasible at corpus scale).
  *
  * Scale shape, per Lloyd round:
  *   - assignment is ONE codegen'd kernel call per row in the scan
  *     stage ([[graft.functions.cat.Kernels.nearestCentroid]], the
  *     same kernel the IVF index uses) — the corpus never shuffles;
  *   - the update shuffles only (cluster, dim, partial-sum) triples —
  *     k·dim cells after map-side combine, regardless of corpus size;
  *   - the driver collects k·dim means (bounded ~10^4 doubles; beyond
  *     that ship centroids as a broadcast variable behind the same
  *     kernel), exactly MLlib's treeAggregate pattern.
  *
  * Everything is deterministic and cross-engine reproducible: seeds
  * are the embeddings of the k smallest ids (no RNG), per-dimension
  * means are exact decimal sums (order-independent) divided in
  * doubles, and assignment ranks unrounded cosines folded in dimension
  * order with ties to the lowest cluster id — a SQL oracle replaying
  * the same arithmetic reproduces every label bit-for-bit.
  */
object Clustering {

  /** Labels after `iters` Lloyd updates: seed with the k lowest-id
    * embeddings, run `iters` (assign → recompute means) rounds, then
    * emit the final assignment. Clusters that lose all members drop
    * out (their id simply stops being assignable), keeping engine and
    * oracle in lockstep. Returns (idCol, cluster). */
  def kmeans(df: DataFrame, k: Int, iters: Int, dim: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"))
    var cents: Array[(Long, Array[Double])] = base.orderBy("__id").limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) =>
        (i.toLong, r.getSeq[Float](1).map(_.toDouble).toArray)
      }
    for (_ <- 1 to iters) {
      val means = assign(base, cents, dim)
        .select(col("cluster"), posexplode(col("__v")).as(Seq("__p", "__x")))
        .groupBy("cluster", "__p")
        .agg((sum(col("__x").cast("double").cast("decimal(28,12)"))
          .cast("double") / count(lit(1))).as("__m"))
        .collect() // bounded: k*dim cells
      cents = means.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1).toArray.sortBy(_._1)
        .map { case (cl, cells) => (cl, cells.sortBy(_._2).map(_._3)) }
    }
    assign(base, cents, dim)
      .select(col("__id").as(idCol), col("cluster"))
  }

  /** One assignment pass: nearest-cosine centroid id via the inlined
    * literal matrix (ties -> lowest cluster id, kernel order). */
  private def assign(base: DataFrame, cents: Array[(Long, Array[Double])],
                     dim: Int): DataFrame = {
    val centsLit = array(cents.flatMap(_._2).map(lit).toIndexedSeq: _*)
    val idsLit = array(cents.map(c => lit(c._1)).toIndexedSeq: _*)
    base.withColumn("cluster", element_at(idsLit,
      graft.functions.cat.GraftExpr.nearestCentroid(col("__v"), centsLit, dim) + 1))
  }

  /** SemDeDup: drop every item that has a higher-similarity-than-`tau`
    * neighbor with a smaller id in its own k-means cluster. The
    * pairwise cosine runs only within clusters — with k ~ sqrt(N) the
    * candidate set is ~N^1.5/k^... bounded per cluster, never the
    * full corpus cross join. Returns (idCol, cluster, keep). */
  def semDedup(df: DataFrame, k: Int, iters: Int, dim: Int, tau: Double,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val labeled = df.select(col(idCol), col(vecCol))
      .join(kmeans(df, k, iters, dim, idCol, vecCol), idCol)
    val a = labeled.select(col(idCol).as("__ida"), col(vecCol).as("__va"),
      col("cluster"))
    val b = labeled.select(col(idCol).as("__idb"), col(vecCol).as("__vb"),
      col("cluster"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("__ida") < col("__idb"))
      .filter(round(graft.functions.cat.GraftExpr.cosineFF(
        col("__va"), col("__vb")), 6) >= tau)
      .select(col("__idb").as(idCol)).distinct()
      .withColumn("__drop", lit(1))
    labeled.join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cluster"), col("__drop").isNull.as("keep"))
  }
}
