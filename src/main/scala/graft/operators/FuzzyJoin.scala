package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance record linkage via deletion-neighborhood blocking
  * (the FastSS / SymSpell scheme): two strings are within Levenshtein
  * distance 1 iff their deletion neighborhoods — the string itself
  * plus every single-character deletion — intersect. Generating the
  * neighborhood turns the fuzzy predicate into a plain EQUI-join on a
  * variant key, so the plan is explode → hash join → exact-distance
  * filter: candidates are bounded by variant-bucket collisions and the
  * corpus is NEVER all-pairs self-joined. Optional `blockCols` join
  * equality keys alongside the variant (classic blocked record
  * linkage): candidates must also agree on the block, which both
  * shrinks buckets and composes entity resolution per domain.
  *
  * Shape at scale: each side shuffles |s|+1 slim (variant, id) rows
  * per string; the exact `levenshtein` re-check runs only on bucket
  * collisions, so false candidates (distinct deletions colliding, e.g.
  * "ab"/"ba" sharing both "a" and "b") cost one codegen'd comparison,
  * not a shuffle. At 100 TB the variant key partitions like any other
  * join key; a skew cap is unnecessary because a variant bucket only
  * holds strings within distance 2 of each other.
  */
object FuzzyJoin {

  /** `s` itself (k = 0) plus every single-character deletion
    * (k = 1..len). Pure Column arithmetic — no UDF. */
  private[operators] def deletionVariants(s: Column): Column =
    transform(sequence(lit(0), length(s)), k =>
      when(k === 0, s)
        .otherwise(concat(s.substr(lit(1), k - 1),
          s.substr(k + 1, length(s) - k))))

  private def explodeSide(df: DataFrame, textCol: String, idCol: String,
                          prefix: String, blockCols: Seq[String]): DataFrame =
    df.select((col(idCol).as(s"${prefix}_id") +: col(textCol).as(s"${prefix}_text") +:
        blockCols.map(col)): _*)
      .withColumn("__v", explode(array_distinct(deletionVariants(col(s"${prefix}_text")))))

  /** All (left_id, right_id, dist) pairs whose texts are within
    * Levenshtein distance 1. IDs must be unique per side. The exact
    * re-check runs BEFORE the pair dedup: a pair meeting in several
    * shared variants costs a couple of extra codegen'd comparisons
    * map-side, but the dedup exchange then carries slim (id, id, dist)
    * triples instead of both text payloads — at corpus scale the
    * shuffle, not the comparison, is the cost. */
  def editDistance1Join(left: DataFrame, right: DataFrame,
                        textCol: String, idCol: String,
                        blockCols: Seq[String] = Nil): DataFrame = {
    val lv = explodeSide(left, textCol, idCol, "left", blockCols)
    val rv = explodeSide(right, textCol, idCol, "right", blockCols)
    lv.join(rv, "__v" +: blockCols)
      .filter(levenshtein(col("left_text"), col("right_text")) <= 1)
      .select(col("left_id"), col("right_id"),
        levenshtein(col("left_text"), col("right_text")).cast("long").as("dist"))
      .distinct() // a pair can meet in several shared variants
  }

  /** Self-linkage: unordered pairs of distinct rows within distance 1
    * (each pair reported once, `left_id < right_id`). The asymmetric
    * filter halves the candidate stream BEFORE the exact check and the
    * dedup exchange. `keepBlockCols` carries the blocking columns into
    * the output (both endpoints agree on them by construction) so a
    * downstream block-aware consumer — `DedupClusters.resolveBlocked`
    * — can exploit the confinement without re-joining the source. */
  def selfPairs(df: DataFrame, textCol: String, idCol: String,
                blockCols: Seq[String] = Nil,
                keepBlockCols: Boolean = false): DataFrame = {
    val lv = explodeSide(df, textCol, idCol, "left", blockCols)
    val rv = explodeSide(df, textCol, idCol, "right", blockCols)
    val keep = if (keepBlockCols) blockCols else Nil
    lv.join(rv, "__v" +: blockCols)
      .filter(col("left_id") < col("right_id"))
      .filter(levenshtein(col("left_text"), col("right_text")) <= 1)
      .select(col("left_id") +: col("right_id") +:
        levenshtein(col("left_text"), col("right_text")).cast("long").as("dist") +:
        keep.map(col): _*)
      .distinct()
  }
}
