package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contrastive-training pair generation: turn near-duplicate pairs
  * (the positives an embedding model should pull together) into
  * (anchor, positive, negative) triplets by drawing a deterministic
  * pseudo-random negative from the corpus for each pair — the standard
  * data-prep step for contrastive fine-tuning (SimCSE-style) run at
  * corpus scale.
  *
  * Negative selection must be reproducible AND scalable: a true random
  * draw breaks reruns, and indexing the corpus by global position
  * needs a global sort. Instead the corpus is hashed into `buckets`
  * buckets and each bucket elects one deterministic representative
  * (min (hash, id) — a per-bucket window, never global); an anchor
  * draws its negative as the representative of bucket
  * hash(anchor) % buckets, falling back to the next bucket if the
  * draw collides with the pair itself. The representative table is
  * `buckets` rows — broadcast — so triplet assembly is map-side over
  * the pairs; nothing anywhere is proportional to corpus × pairs.
  */
object TrainingPairs {

  /** Build (anchor, positive, negative) triplets from `pairs`
    * (`id_a`, `id_b`) with negatives drawn from `corpus(idCol)`.
    * Pairs whose draw AND fallback both collide are dropped (both
    * engines drop the same rows — determinism over completeness). */
  def contrastiveTriplets(pairs: DataFrame, corpus: DataFrame, idCol: String,
                          buckets: Int, salt: String): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val reps = corpus
      .select(col(idCol).as("rep_id"),
        Sampling.sampleHash(col(idCol), salt).as("__h"))
      .withColumn("__b", (col("__h") % buckets).cast("int"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__b")).orderBy(col("__h"), col("rep_id"))))
      .filter(col("__rn") === 1)
      .select(col("__b"), col("rep_id"))
    val r1 = broadcast(reps.select(col("__b").as("__nb"), col("rep_id").as("__rep1")))
    val r2 = broadcast(reps.select(col("__b").as("__nb2"), col("rep_id").as("__rep2")))
    pairs
      .withColumn("__nb",
        (Sampling.sampleHash(col("id_a"), salt + ":n") % buckets).cast("int"))
      .withColumn("__nb2", ((col("__nb") + 1) % buckets).cast("int"))
      .join(r1, Seq("__nb"), "left_outer")
      .join(r2, Seq("__nb2"), "left_outer")
      .withColumn("negative",
        when(col("__rep1") =!= col("id_a") && col("__rep1") =!= col("id_b"),
          col("__rep1"))
          .otherwise(when(col("__rep2") =!= col("id_a") && col("__rep2") =!= col("id_b"),
            col("__rep2"))))
      .filter(col("negative").isNotNull)
      .select(col("id_a").as("anchor"), col("id_b").as("positive"), col("negative"))
  }

  /** Hard-negative mining: for each anchor appearing in `pairs`, the
    * `k` most cosine-similar corpus vectors that are NOT the anchor
    * itself and NOT any of its positives — the negatives that actually
    * move a contrastive model, versus [[contrastiveTriplets]]'s cheap
    * random draws (easy negatives saturate the loss early; hard ones
    * keep the gradient alive).
    *
    * Scale shape: the anchor side is a bounded training batch —
    * broadcast with vectors attached — so the corpus streams ONCE
    * through a map-side scoring pass (same shape as
    * `Similarity.bruteForceTopK`); positives exclude via a left-anti
    * join on the slim pair list; per-anchor top-k is a
    * WindowGroupLimit, never a global sort. Cosine rounds to 6dp with
    * id tie-breaks, the repo's cross-engine determinism convention.
    * Output: (anchor, negative, cos, rank). */
  def hardNegatives(pairs: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pos = pairs.select(col("id_a"), col("id_b"))
      .unionAll(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val anchors = pos.select(col("id_a")).distinct()
      .join(corpus, col("id_a") === col(idCol))
      .select(col("id_a").as("qid"), col(vecCol).as("qv"))
    val cand = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val scored = broadcast(anchors).join(cand, col("qid") =!= col("cid"))
      .withColumn("cos", round(Similarity.cosine(col("qv"), col("cv")), 6))
      .join(pos.select(col("id_a").as("qid"), col("id_b").as("cid")),
        Seq("qid", "cid"), "left_anti")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("anchor"), col("cid").as("negative"),
        col("cos"), col("rank"))
  }

  /** [[hardNegatives]] at index speed: instead of scoring every anchor
    * against the WHOLE corpus (a full rescan per training batch), each
    * anchor probes the IVF+PQ index ([[ProductQuantizer.ivfPqTopK]] —
    * coarse cells bound the candidate set, 8-byte codes bound the
    * scanned bytes) for `kCand` approximate candidates, positives and
    * self drop out, and the survivors are re-ranked by EXACT cosine —
    * the standard ANN retrieve-then-refine shape. `kCand > k` is the
    * fetch headroom that keeps k negatives available after the
    * anchor's positives are excluded.
    *
    * Scale shape: the corpus is touched twice, both times map-side and
    * un-shuffled — once streaming through the index probe (cell +
    * code kernels in the scan stage), once streaming past the
    * BROADCAST candidate list to attach exact vectors for the
    * refinement (candidates are anchors × kCand rows — a bounded
    * training batch, never corpus-sized). Recall vs the brute-force
    * rescan is a measured floor in SimilaritySpec, not a hope.
    * Output: (anchor, negative, cos, rank) — same contract as
    * [[hardNegatives]]. */
  def hardNegativesAnn(pairs: DataFrame, corpus: DataFrame, idCol: String,
                       vecCol: String, k: Int, kCand: Int,
                       centroids: DataFrame, nprobe: Int,
                       m: Int, ks: Int, iters: Int, dim: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(kCand >= k, s"kCand=$kCand must be >= k=$k (fetch headroom)")
    val pos = pairs.select(col("id_a"), col("id_b"))
      .unionAll(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val anchorIds = pos.select(col("id_a")).distinct()
    val queries = corpus.join(broadcast(anchorIds), col(idCol) === col("id_a"))
      .select(corpus.columns.map(col): _*)
    val cand = ProductQuantizer.ivfPqTopK(corpus, queries, kCand,
        centroids, nprobe, m, ks, iters, dim, idCol, vecCol)
      .join(pos.select(col("id_a").as("qid"), col("id_b").as("cid")),
        Seq("qid", "cid"), "left_anti")
      .select(col("qid"), col("cid"))
    // refinement: corpus streams past the broadcast candidate list —
    // exact vectors attach to candidate rows only, nothing
    // corpus-sized ever shuffles
    val anchorsV = broadcast(queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv")))
    val refined = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
      .join(broadcast(cand), Seq("cid"))
      .join(anchorsV, Seq("qid"))
      .withColumn("cos", round(Similarity.cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    refined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("anchor"), col("cid").as("negative"),
        col("cos"), col("rank"))
  }
}
