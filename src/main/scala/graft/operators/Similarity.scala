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

  /** Sequential-fold dot product of two float vectors, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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

  /** Sign-LSH bucket id from the first `bits` coordinates: bit d set
    * when embedding[d] >= 0. Deterministic, oracle-friendly; a seeded
    * random-rotation variant would pre-multiply the vectors. */
  def signBucket(vec: Column, bits: Int): Column =
    (0 until bits).map { d =>
      when(element_at(vec, d + 1) >= 0f, lit(1L << d)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN top-k: queries meet only candidates in their sign
    * bucket. Same scoring/ranking as brute force. */
  def lshTopK(candidates: DataFrame, queries: DataFrame, k: Int, bits: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      signBucket(col(vecCol), bits).as("bucket")))
    val c = candidates.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val scored = q.join(c, Seq("bucket")).filter(col("qid") =!= col("cid"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("cos"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs within sign buckets:
    * candidate pairs share a bucket; keep cosine >= threshold. */
  def cosineNearDupPairs(df: DataFrame, threshold: Double, bits: Int,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBucket(col(vecCol), bits).as("bucket"))
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .withColumn("cos", round(cosine(col("x.v"), col("y.v")), 6))
      .filter(col("cos") >= threshold)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), col("cos"))
  }
}
