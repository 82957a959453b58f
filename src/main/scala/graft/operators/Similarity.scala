package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — the query side is broadcast, so
  * the candidate corpus streams once with no shuffle of the vectors.
  * Scale path: sign-hyperplane LSH bucketing — candidates are met only
  * inside their bucket (an equi-join on the bucket id), the standard
  * trade of recall for a 2^b fan-in reduction.
  *
  * Dot products fold left over `zip_with` pairs in element order, so an
  * oracle engine summing in the same order reproduces the doubles
  * bit-for-bit.
  */
object Similarity {

  /** Sequential-fold dot product of two vectors, in double. Used for
    * projections against double-literal hyperplanes; the float-float
    * pair-scoring hot path goes through the codegen'd kernel below. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine of two `array<float>` columns — one codegen'd kernel call
    * folding in the same index order as the combinator form (bit-equal
    * result, proven by the unchanged oracles), instead of three
    * interpreted higher-order expressions per scored pair. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.cat.GraftExpr.cosineFF(a, b)

  /** Brute-force cosine top-k: for each query vector (`queries` must be
    * small — it is broadcast), the k nearest candidates by cosine,
    * rounded to 6dp for cross-engine determinism, tie-broken by id. */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv")))
    val c = candidates.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val scored = q.join(c, col("qid") =!= col("cid"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("cos"), col("rank"))
  }

  /** Seeded random hyperplanes for sign-LSH: `bits` gaussian weight
    * rows over `dim` coordinates, rounded to 6dp so the exact same
    * literals can be inlined into any oracle engine's SQL. Random
    * projections (vs the raw leading coordinates round 1 hashed on)
    * spread correlated embedding dimensions across buckets — real
    * embedding spaces concentrate variance in the first principal
    * components, so coordinate bits put most of the corpus into a
    * handful of buckets (skew + recall loss). */
  def randomHyperplanes(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(bits, dim)(math.rint(rnd.nextGaussian() * 1e6) / 1e6)
  }

  /** Sign-LSH bucket id: bit j set when the projection of the vector on
    * hyperplane j is >= 0. Projections fold in element order, so an
    * oracle summing the same inlined weights in the same order
    * reproduces every sign bit-for-bit.
    *
    * This combinator form is the CROSS-VALIDATION implementation (its
    * `bits` higher-order projection expressions stay interpreted —
    * HigherOrderFunction does not join whole-stage codegen); the
    * production paths below bucket through [[signBucketKernel]], the
    * codegen'd kernel computing the identical fold. SimilaritySpec
    * asserts the two agree bit-for-bit on the fixture. */
  def signBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (w, j) =>
      val proj = dot(vec, array(w.map(lit): _*))
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Codegen'd sign bucket — same planes, same element-order fold, one
    * kernel call per row (see [[graft.functions.cat.Kernels.signBucket]]). */
  def signBucketKernel(vec: Column, planes: Array[Array[Double]]): Column =
    graft.functions.cat.GraftExpr.signBuckets(vec, planes)

  /** LSH-bucketed ANN top-k: queries meet only candidates in their sign
    * bucket. Same scoring/ranking as brute force. */
  def lshTopK(candidates: DataFrame, queries: DataFrame, k: Int,
              planes: Array[Array[Double]],
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      signBucketKernel(col(vecCol), planes).as("bucket")))
    val c = candidates.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      signBucketKernel(col(vecCol), planes).as("bucket"))
    val scored = q.join(c, Seq("bucket")).filter(col("qid") =!= col("cid"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("cos"), col("rank"))
  }

  /** XOR masks for multi-probe LSH: every `bits`-wide mask with at most
    * `maxHamming` bits set, built combinatorially from bit-position
    * subsets — O(sum C(bits, 0..r)) work, never 2^bits, so any
    * `bits <= 63` is fine and `maxHamming == 0` is exactly `Seq(0)`.
    * Ordered by popcount then value (nearest buckets first,
    * deterministic for oracle SQL). */
  def probeMasks(bits: Int, maxHamming: Int): Seq[Long] = {
    require(bits >= 1 && bits <= 63, s"sign-LSH bucket width must be in [1,63], got $bits")
    val r = maxHamming.max(0).min(bits)
    def combos(start: Int, remaining: Int): Seq[Long] =
      if (remaining == 0) Seq(0L)
      else (start until bits).flatMap(p => combos(p + 1, remaining - 1).map(_ | (1L << p)))
    (0 to r).flatMap(h => combos(0, h).sorted)
  }

  /** Multi-probe sign-LSH ANN top-k: each query probes every bucket
    * within Hamming distance `maxHamming` of its own sign bucket
    * (multi-probe LSH, Lv et al., VLDB'07). Single-bucket sign-LSH
    * collides a true neighbor with probability q^bits (q = per-bit
    * agreement), which collapses on near-uniform data; probing the
    * sum(C(bits, 0..r)) nearest buckets raises recall to
    * P(Hamming <= r) at a bounded, knowable candidate cost — still a
    * pure equi-join. Crucially only the (tiny, broadcast) QUERY side
    * expands: each query row explodes to its probe buckets; the corpus
    * is bucketed exactly once and never reshuffled or rescanned. */
  def lshTopKMultiProbe(candidates: DataFrame, queries: DataFrame, k: Int,
                        planes: Array[Array[Double]], maxHamming: Int,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bits = planes.length
    val masks = probeMasks(bits, maxHamming)
    val q = broadcast(queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"),
        signBucketKernel(col(vecCol), planes).as("qb"))
      .select(col("qid"), col("qv"),
        explode(array(masks.map(m => col("qb").bitwiseXOR(lit(m))): _*)).as("bucket")))
    val c = candidates.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      signBucketKernel(col(vecCol), planes).as("bucket"))
    // no pair-dedup needed: a query's probe buckets are distinct values
    // (qb XOR distinct masks) and each candidate sits in exactly one
    // bucket, so every (qid, cid) pair collides at most once.
    val scored = q.join(c, Seq("bucket")).filter(col("qid") =!= col("cid"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("cos"), col("rank"))
  }

  /** Hyperplane weight for flat index `idx` derived from an integer
    * LCG, in [-1, 1). Pure integer arithmetic plus a power-of-two
    * division, so any engine reproduces it bit-for-bit from the formula
    * alone — no literal weight tables to inline into oracle SQL. */
  def lcgWeight(idx: Column): Column =
    ((lit(1103515245L) * idx + lit(12345L)) % lit(2147483648L)).cast("double") /
      lit(2147483648d) * lit(2d) - lit(1d)

  /** Sign bucket for hash table `table` using LCG-formula hyperplanes. */
  def lcgBucket(vec: Column, table: Int, bits: Int, dim: Int): Column =
    (0 until bits).map { j =>
      val base = table * bits * dim + j * dim
      val proj = aggregate(
        transform(vec, (x, i) => x.cast("double") * lcgWeight(lit(base) + i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Multi-table sign-LSH ANN top-k: OR-amplification across `tables`
    * independent hyperplane sets, optionally multi-probed within each
    * table. Single-table sign-LSH collides two vectors at angle θ with
    * probability (1 - θ/π)^bits — a few percent at moderate similarity
    * — so production ANN runs L tables and takes the union of bucket
    * collisions: recall 1-(1-p)^L at L× the (bucketed, equi-join)
    * candidate cost. On near-uniform data OR-amplification alone
    * saturates (measured 0.28 recall at L=16 on the fixture), so
    * `maxHamming` > 0 additionally probes every bucket within that
    * Hamming distance of the query's bucket in each table — the
    * combined lever reaches recall OR-amplification cannot. Probing
    * expands only the broadcast query side; candidates are bucketed
    * once per table. Collisions dedupe on the (qid, cid) pair before
    * scoring, so each survivor's cosine is computed once. */
  def lshTopKMultiTable(candidates: DataFrame, queries: DataFrame, k: Int,
                        tables: Int, bits: Int, dim: Int, maxHamming: Int = 0,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // one codegen'd kernel call computes every table's bucket in a
    // single pass over the vector; the Column-combinator form
    // (`lcgBucket`, kept for cross-validation) is tables*bits
    // interpreted higher-order expressions — HigherOrderFunction does
    // not participate in whole-stage codegen. `dim` must equal the
    // embedding length (the kernel reads the runtime length; the
    // oracle formula indexes with it).
    def banded(df: DataFrame, idAs: String, vecAs: String): DataFrame =
      df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
        posexplode(graft.functions.cat.GraftExpr.lshBuckets(col(vecCol), tables, bits))
          .as(Seq("tbl", "bucket")))
    val masks = probeMasks(bits, maxHamming)
    val q = broadcast(banded(queries, "qid", "qv")
      .select(col("qid"), col("qv"), col("tbl"),
        explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*))
          .as("bucket")))
    val c = banded(candidates, "cid", "cv")
    val coll = q.join(c, Seq("tbl", "bucket")).filter(col("qid") =!= col("cid"))
      .select("qid", "qv", "cid", "cv").dropDuplicates("qid", "cid")
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
    coll.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cid", "cos", "rank")
  }

  /** IVF-flat ANN top-k: coarse-quantize the corpus by
    * nearest-cosine centroid, then probe only the `nprobe` cells
    * nearest each query. `centroids` is a deterministic data sample
    * (k-means init without the iterations); it is collected once and
    * inlined as a literal matrix, so candidate assignment is one
    * codegen'd kernel call *in the scan stage* — zero shuffle for the
    * corpus; the only exchange in the plan is the final per-query
    * top-k window over the probed cells (~nprobe/k of the corpus).
    * The literal matrix suits centroid counts to ~10^4; beyond that
    * ship it as a broadcast variable behind the same kernel.
    * Assignment ranks by *unrounded* cosine (both engines fold
    * identical doubles in identical order, ties -> lowest centroid
    * id), matching [[graft.functions.cat.Kernels.nearestCentroid]]. */
  def ivfTopK(candidates: DataFrame, queries: DataFrame, k: Int,
              centroids: DataFrame, nprobe: Int, dim: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = centroids
      .select(col(idCol).cast("long").as("cen_id"), col(vecCol).as("v"))
      .orderBy("cen_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val centsLit = array(cents.flatMap(_._2).map(x => lit(x.toDouble)).toIndexedSeq: _*)
    val idsLit = array(cents.map(c => lit(c._1)).toIndexedSeq: _*)
    def cellOf(vec: Column): Column =
      element_at(idsLit,
        graft.functions.cat.GraftExpr.nearestCentroid(vec, centsLit, dim) + 1)
    val ca = candidates.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      cellOf(col(vecCol)).as("cell"))
    // probe side is tiny: broadcast cross join + window, mirroring SQL
    val cen = broadcast(centroids.select(col(idCol).as("cen_id"), col(vecCol).as("cen_v")))
    val qa = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .crossJoin(cen)
      .withColumn("csim", cosine(col("qv"), col("cen_v")))
    val wq = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cen_id").asc)
    val probes = broadcast(qa.withColumn("prank", row_number().over(wq))
      .filter(col("prank") <= nprobe)
      .select(col("qid"), col("qv"), col("cen_id").as("cell")))
    val scored = probes.join(ca, Seq("cell")).filter(col("qid") =!= col("cid"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cid", "cos", "rank")
  }

  /** Top-k neighbors over int8-QUANTIZED vectors — the compressed-scan
    * path. Each vector is quantized once (symmetric per-vector scale,
    * [[graft.functions.cat.Kernels.quantize127]]); cosine is invariant
    * to the per-vector scale, so ranking needs only exact int64 dot
    * products over the quantized values — no float accumulation, and
    * bit-identical scores on any engine.
    *
    * Why this matters at corpus scale: a stored int8 corpus is 4x
    * smaller than float32, so the exhaustive scan — the recall-1.0
    * baseline every ANN path is measured against — reads a quarter of
    * the bytes, and the inner loop is integer multiply-adds (SIMD-
    * friendly). The quantized values are carried as long here purely
    * for arithmetic headroom; a persisted layout stores the 1-byte
    * values. Query side broadcasts; the candidate corpus streams once
    * with no shuffle; per-query top-k is a WindowGroupLimit window.
    * Output: (qid, cid, qcos, rank). */
  def quantizedTopK(candidates: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.cat.GraftExpr
    def quant(df: DataFrame, ida: String, qa: String, na: String) =
      df.select(col(idCol).as(ida), GraftExpr.quantize127(col(vecCol)).as(qa))
        .withColumn(na, GraftExpr.dotLong(col(qa), col(qa)))
        .filter(col(na) > 0)
    val c = quant(candidates, "cid", "cq", "cn")
    val q = broadcast(quant(queries, "qid", "qq", "qn"))
    val w = Window.partitionBy("qid").orderBy(col("qcos").desc, col("cid").asc)
    c.join(q, col("cid") =!= col("qid"))
      .withColumn("qcos",
        GraftExpr.dotLong(col("qq"), col("cq")).cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("cn").cast("double"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("qcos"), col("rank").cast("int").as("rank"))
  }

  /** Embedding-cosine near-duplicate pairs within sign buckets:
    * candidate pairs share a bucket; keep cosine >= threshold. */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
                         planes: Array[Array[Double]],
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBucketKernel(col(vecCol), planes).as("bucket"))
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .withColumn("cos", round(cosine(col("x.v"), col("y.v")), 6))
      .filter(col("cos") >= threshold)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), col("cos"))
  }
}
