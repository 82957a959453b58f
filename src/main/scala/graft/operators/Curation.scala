package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation layout operators: per-source caps and deterministic
  * shard assignment. Both decide from the [[Sampling.sampleHash]] mixed
  * per-row hash, so the outcome is a pure function of the data — stable
  * under any partitioning, re-runnable, and reproducible by the DuckDB
  * oracle with the same integer arithmetic.
  */
object Curation {

  /** Cap any single source's (domain's) contribution to the corpus at
    * `cap` documents, chosen by deterministic hash order (a reproducible
    * uniform draw within each source; ties broken by the key itself).
    * Web-scale corpora are dominated by a few mega-domains — boilerplate
    * mirrors, link farms — and capping per registered domain is a
    * standard curation gate (cf. Gopher / RefinedWeb pipelines).
    *
    * Scale shape: one hash-partition window on the source key.
    * `row_number <= cap` compiles to WindowGroupLimit, which pushes the
    * per-group limit into a partial (map-side) pass — the shuffle moves
    * at most `cap` rows per source per input partition, so a
    * billion-page domain contributes `cap × partitions`, not a billion,
    * to the exchange. A skewed mega-source never concentrates on one
    * reducer beyond that bound.
    */
  def perSourceCap(df: DataFrame, srcCol: String, keyCol: String, cap: Int,
                   salt: String): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = Window.partitionBy(col(srcCol))
      .orderBy(Sampling.sampleHash(col(keyCol), salt).asc, col(keyCol).asc)
    df.withColumn("__src_rn", row_number().over(w))
      .filter(col("__src_rn") <= cap)
      .drop("__src_rn")
  }

  /** Deterministic corpus shuffle + training-shard assignment: every row
    * gets a `shard` in [0, numShards) and a dense `shard_pos` giving its
    * position within the shard, both pure functions of the key hash —
    * the distributed equivalent of "shuffle the corpus with a fixed seed
    * and split it into N files", reproducible across runs and engines.
    *
    * Training pipelines need exactly this: a global shuffle that does
    * not depend on input order (hash order IS the shuffle order) and
    * contiguous shard files a data loader can stream.
    *
    * Scale shape: shard = hash mod N is map-side; the position is a
    * window partitioned BY SHARD — N independent groups that
    * parallelize, never a single global-order window (a
    * `row_number() OVER (ORDER BY hash)` would serialize the corpus
    * through one reducer; partitioning by shard keeps every exchange
    * group at corpus/N rows). Writing `partitionBy(shard)` then gives
    * one contiguous, internally-shuffled file set per shard.
    */
  def shardAssign(df: DataFrame, keyCol: String, numShards: Int,
                  salt: String): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__shuf_h").asc, col(keyCol).asc)
    df.withColumn("__shuf_h", Sampling.sampleHash(col(keyCol), salt))
      .withColumn("shard", (col("__shuf_h") % numShards).cast("int"))
      .withColumn("shard_pos", row_number().over(w) - 1)
      .drop("__shuf_h")
  }
}
