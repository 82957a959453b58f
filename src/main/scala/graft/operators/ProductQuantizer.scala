package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.cat.GraftExpr

/** Product quantization ANN (Jégou et al. 2011, "Product Quantization
  * for Nearest Neighbor Search"): split each `dim`-vector into `m`
  * subspaces of `ds = dim/m` coordinates, k-means each subspace into
  * `ks` codewords, and store each vector as `m` small codes — 64 floats
  * (256 B) become 8 bytes at m=8, a 32x compression of the scanned
  * bytes. Queries score against codes via ADC: an m*ks lookup table of
  * per-subspace squared-L2 distances is built ONCE per query, after
  * which scoring a corpus row costs m table lookups instead of dim
  * multiplies.
  *
  * Scale shape:
  *   - training: per Lloyd round the corpus never shuffles — subspace
  *     assignment is m codegen'd kernel calls inside the scan stage,
  *     and the update aggregates (pos, code) cells with map-side
  *     combine: m*ks*ds cells cross the wire regardless of corpus
  *     size; the driver holds one m*ks*ds double array (bounded KBs);
  *   - encoding: map-side kernel calls, no shuffle;
  *   - search: the query side (lut per query) broadcasts; the encoded
  *     corpus streams ONCE with no vector bytes in flight, and the
  *     per-query top-k is a WindowGroupLimit, never a global sort.
  *
  * Everything is deterministic and cross-engine reproducible, same
  * discipline as [[Clustering]]: seeds are the `ks` lowest-id vectors
  * (each subspace seeded from the same rows), means are exact decimal
  * sums divided in doubles, distances fold (x-c)^2 in ascending
  * dimension order, argmin ties keep the lowest codeword, and the ADC
  * total folds subspaces in ascending order — so a SQL oracle replays
  * every score bit-for-bit.
  */
object ProductQuantizer {

  /** Flat codebooks, layout `[(sub*ks + code)*ds + i]`. */
  def train(df: DataFrame, m: Int, ks: Int, iters: Int, dim: Int,
            idCol: String = "vec_id", vecCol: String = "embedding"): Array[Double] = {
    val ds = dim / m
    require(m * ds == dim, s"m=$m must divide dim=$dim")
    val base = df.select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"))

    // seeds: subvectors of the ks lowest-id rows (code = rank)
    val seedRows = base.orderBy("__id").limit(ks).collect()
    var cb = new Array[Double](m * ks * ds)
    seedRows.zipWithIndex.foreach { case (r, code) =>
      val v = r.getSeq[Float](1)
      var sub = 0
      while (sub < m) {
        var i = 0
        while (i < ds) {
          cb((sub * ks + code) * ds + i) = v(sub * ds + i).toDouble
          i += 1
        }
        sub += 1
      }
    }

    for (_ <- 1 to iters) {
      // ONE job per round: codes for every subspace are kernel calls in
      // the scan stage; the aggregate keys on (pos, code) — pos implies
      // the subspace — and ships m*ks*ds cells after map-side combine.
      val cells = base
        .select(encodeCol(cb, m, ks, ds, col("__v")).as("__codes"),
          posexplode(col("__v")).as(Seq("__p", "__x")))
        .select(col("__p"),
          element_at(col("__codes"), (col("__p") / ds).cast("int") + 1).as("__code"),
          col("__x"))
        .groupBy("__p", "__code")
        .agg((sum(col("__x").cast("double").cast("decimal(28,12)"))
          .cast("double") / count(lit(1))).as("__m"))
        .collect()
      val next = cb.clone() // empty cells carry the previous codeword
      cells.foreach { r =>
        val p = r.getInt(0); val code = r.getInt(1)
        val sub = p / ds
        next((sub * ks + code) * ds + (p - sub * ds)) = r.getDouble(2)
      }
      cb = next
    }
    cb
  }

  /** `array<int>` of m codes — one codegen'd argmin kernel call per
    * subspace against that subspace's slice of the codebook literal.
    * Shared with [[AnnIndex]]'s persisted PQ layout so the maintained
    * index and the in-query chain encode bit-identically. */
  private[operators] def encodeCol(cb: Array[Double], m: Int, ks: Int, ds: Int,
                                   vec: Column): Column =
    array((0 until m).map { sub =>
      val slice = java.util.Arrays.copyOfRange(cb, sub * ks * ds, (sub + 1) * ks * ds)
      GraftExpr.nearestSubCentroidL2(vec, array(slice.toIndexedSeq.map(lit): _*),
        sub * ds, ds)
    }: _*)

  /** (idCol, codes) — the compressed corpus representation. */
  def encode(df: DataFrame, cb: Array[Double], m: Int, ks: Int, dim: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ds = dim / m
    df.select(col(idCol).as("cid"), encodeCol(cb, m, ks, ds, col(vecCol)).as("codes"))
  }

  /** IVF+PQ — the production composition (Jégou et al.'s IVFADC):
    * coarse-quantize the corpus into cells (one codegen'd
    * nearest-centroid call in the scan stage, zero corpus shuffle —
    * same discipline as [[Similarity.ivfTopK]]), PQ-encode it, then
    * let each query probe only its `nprobe` nearest cells and score
    * the probed candidates via the broadcast ADC lut. The exhaustive
    * [[pqTopK]] scan cost drops by ~|cells|/nprobe while the scanned
    * bytes stay 8-code-per-row; the only exchange in the plan is the
    * final per-query top-k window. Returns (qid, cid, adist, rank). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                centroids: DataFrame, nprobe: Int,
                m: Int, ks: Int, iters: Int, dim: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ds = dim / m
    // coarse cells: literal centroid matrix + kernel assignment
    val cents = centroids
      .select(col(idCol).cast("long").as("cen_id"), col(vecCol).as("v"))
      .orderBy("cen_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val centsLit = array(cents.flatMap(_._2).map(x => lit(x.toDouble)).toIndexedSeq: _*)
    val idsLit = array(cents.map(c => lit(c._1)).toIndexedSeq: _*)
    def cellOf(vec: Column): Column =
      element_at(idsLit,
        GraftExpr.nearestCentroid(vec, centsLit, dim) + 1)
    // PQ codebooks over the full corpus; corpus rows become (cell, codes)
    val cb = train(corpus, m, ks, iters, dim, idCol, vecCol)
    val cbLit = array(cb.toIndexedSeq.map(lit): _*)
    val enc = corpus.select(col(idCol).as("cid"), cellOf(col(vecCol)).as("cell"),
      encodeCol(cb, m, ks, ds, col(vecCol)).as("codes"))
    // probe side: nprobe nearest cells per query (unrounded cosine,
    // ties to lowest centroid id), lut per probe row — all broadcast
    val cen = broadcast(centroids.select(col(idCol).as("cen_id"),
      col(vecCol).as("cen_v")))
    val qa = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .crossJoin(cen)
      .withColumn("csim", Similarity.cosine(col("qv"), col("cen_v")))
    val wq = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cen_id").asc)
    val probes = broadcast(qa.withColumn("prank", row_number().over(wq))
      .filter(col("prank") <= nprobe)
      .select(col("qid"), col("cen_id").as("cell"),
        GraftExpr.pqLut(col("qv"), cbLit, m, ks, ds).as("__lut")))
    val scored = probes.join(enc, Seq("cell")).filter(col("qid") =!= col("cid"))
      .withColumn("adist", round(GraftExpr.pqAdcSum(col("__lut"), col("codes"), ks), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("adist"), col("rank"))
  }

  /** PQ-ADC exhaustive top-k: train on the corpus, encode it, broadcast
    * per-query luts, score code-only rows, keep k per query (asymmetric
    * distance, ascending; ties to the lower candidate id). Returns
    * (qid, cid, adist, rank). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int, ks: Int, iters: Int, dim: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ds = dim / m
    val cb = train(corpus, m, ks, iters, dim, idCol, vecCol)
    val cbLit = array(cb.toIndexedSeq.map(lit): _*)
    val enc = encode(corpus, cb, m, ks, dim, idCol, vecCol)
    val q = broadcast(queries.select(col(idCol).as("qid"),
      GraftExpr.pqLut(col(vecCol), cbLit, m, ks, ds).as("__lut")))
    val scored = q.join(enc, col("qid") =!= col("cid"))
      .withColumn("adist", round(GraftExpr.pqAdcSum(col("__lut"), col("codes"), ks), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("adist"), col("rank"))
  }
}
