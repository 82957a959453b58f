package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set algebra over KMV (k-minimum-values) sketches — the piece that
  * turns a distinct-count sketch into an OVERLAP estimator. The
  * `graft_kmv_distinct` UDAF answers "how many distinct x per group";
  * this answers "how much do two groups' distinct sets OVERLAP"
  * (union, intersection, Jaccard) from the same bottom-k state,
  * without ever joining the full sets — the Beyer et al. SIGMOD'07
  * construction.
  *
  * Why it matters at 100 TB: the exact overlap of two corpora's
  * shingle sets is a full shuffle-join of both (the decontamination
  * q3D shape, priced per query). The KMV route reads each corpus
  * once, keeps k hashes per corpus, and every pairwise overlap after
  * that is arithmetic on 2k longs — the shape of "contamination
  * matrix across 50 sources" (50 scans + 50² cheap merges, instead
  * of 50² joins).
  *
  * Estimator (union sketch = the k smallest of K_A ∪ K_B, threshold
  * L = its k-th value, all hashes uniform in [0, P)):
  *   |A ∪ B|  ≈  (k-1) · P / L            (the KMV distinct estimator)
  *   J(A,B)   ≈  |K_A ∩ K_B ∩ [0, L]| / k (fraction of the union
  *                                          sample present in both)
  *   |A ∩ B|  ≈  J · |A ∪ B|
  * Every quantity before the final three divisions is an exact
  * integer (min-k sets are commutative-idempotent monoids — partition
  * layout cannot change them), and the estimates are single IEEE
  * ops on those integers, so any engine reproduces the output
  * bit-for-bit: the whole operator is oracle-checkable.
  */
object SketchOps {

  private val P = 1000000007L

  /** The same two-LCG-round domain wrap [[Sampling.sampleHash]] and
    * `KmvDistinct` apply: a polynomial hash of a short string is
    * bounded by ~31^len, far from the uniform-[0,P) the estimator
    * assumes. Pure integer Column arithmetic, mirrored in oracles. */
  def mixHash(h: Column): Column =
    ((h * lit(48271L) + lit(11L)) % lit(P) * lit(48271L) + lit(11L)) % lit(P)

  /** Per-set bottom-k sketch rows from (set_id, h) element hashes:
    * one row per kept hash. Declarative min-k — Spark's
    * WindowGroupLimit rule prunes each partition to its local
    * bottom-k BEFORE the exchange, so the shuffle carries at most
    * k·partitions rows per set regardless of set size. */
  def bottomK(elems: DataFrame, setCol: String, hashCol: String,
              k: Int): DataFrame = {
    val w = Window.partitionBy(col(setCol)).orderBy(col(hashCol))
    elems.select(col(setCol), col(hashCol)).distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Overlap estimate between exactly two sets given as (set_id, h)
    * element-hash rows (`h` already domain-wrapped, e.g. via
    * [[mixHash]]). Returns ONE row:
    * (k, kth, common, union_est, jaccard_est, inter_est) where `kth`
    * is the union sketch's threshold and `common` the number of
    * sampled hashes present in both sets — the exact-integer state
    * the three estimates derive from. Side a/b assignment follows
    * the set ids' string sort order (deterministic; the estimates
    * are symmetric anyway). */
  def kmvOverlap(elems: DataFrame, setCol: String, hashCol: String,
                 k: Int): DataFrame = {
    val mink = bottomK(elems, setCol, hashCol, k)
    // ONE pass: both sketches fold into a single 2-element struct
    // array (sorted by the set id's string form), so the element
    // scan runs once — no per-side limit(1) branches recomputing it
    val perSet = mink.groupBy(col(setCol).as("__set"))
      .agg(sort_array(collect_list(col(hashCol))).as("hs"))
    val sized = perSet
      .agg(sort_array(collect_list(struct(
        col("__set").cast("string").as("s"), col("hs")))).as("ps"))
      .select(element_at(col("ps"), 1).getField("hs").as("hs_a"),
        element_at(col("ps"), 2).getField("hs").as("hs_b"))
      .withColumn("u", slice(sort_array(array_union(col("hs_a"), col("hs_b"))),
        1, k))
      .withColumn("kth", element_at(col("u"), size(col("u"))))
      .withColumn("common", size(filter(
        array_intersect(col("hs_a"), col("hs_b")),
        x => x <= col("kth"))))
    // degenerate branch: a union sketch SMALLER than k holds the whole
    // union, so the "estimates" are the exact values (standard KMV)
    val full = size(col("u")) >= k
    val unionEst = when(full,
      lit((k - 1).toDouble * P.toDouble) / col("kth").cast("double"))
      .otherwise(size(col("u")).cast("double"))
    val jaccardEst = when(full,
      col("common").cast("double") / lit(k.toDouble))
      .otherwise(col("common").cast("double") / size(col("u")).cast("double"))
    sized.select(
      lit(k).as("k"),
      col("kth"),
      col("common"),
      unionEst.as("union_est"),
      jaccardEst.as("jaccard_est"),
      (jaccardEst * unionEst).as("inter_est"))
  }
}
