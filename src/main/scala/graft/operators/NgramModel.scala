package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Count-based n-gram language-model tables over a text corpus.
  *
  * Reference analogue: none — engine-completeness operator for
  * training-data work (corpus statistics, perplexity-proxy filters,
  * contamination probes all start from n-gram count tables).
  *
  * Scale shape: adjacent-token pairs are materialized map-side inside
  * one `transform(sequence(...))` expression — no self-join of the
  * token stream — so the only shuffle carries slim (w1, w2) pairs that
  * map-side combine has already collapsed to per-partition partial
  * counts. The per-predecessor top-k is a rank window partitioned by
  * `w1` (Spark inserts a WindowGroupLimit partial pass, so each map
  * task forwards at most k rows per predecessor).
  */
object NgramModel {

  /** One row per adjacent token pair (`w1`, `w2`) per occurrence. */
  def bigramPairs(df: DataFrame, textCol: String): DataFrame = {
    val tk = TextFunctions.tokens(col(textCol))
    df.select(tk.as("tk"))
      .where(size(col("tk")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("tk")) - 1), i =>
        struct(element_at(col("tk"), i).as("w1"),
          element_at(col("tk"), i + 1).as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
  }

  /** Top collocations by pointwise-mutual-information ratio
    * n_ab · N / (n_a· · n_·b) over adjacent token pairs (the rational
    * PMI core without the log — monotone in PMI, and a ratio of exact
    * integer products that stays below 2^53, so it is bit-exact in any
    * engine; same trick as TfIdf's rational idf). Pairs below
    * `minCount` are dropped before scoring (standard collocation
    * practice and a skew guard: hapax pairs dominate the tail).
    *
    * Scale shape: marginals are slim re-aggregations of the pair-count
    * table (no second corpus scan); the scalar pair total rides a
    * 1-row broadcast; the global top-k is TakeOrderedAndProject —
    * each partition forwards at most k rows. */
  def pmiTopK(df: DataFrame, textCol: String, k: Int, minCount: Long = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = bigramPairs(df, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
    val total = counts.agg(sum("n_ab").as("__n"))
    val left = counts.groupBy("w1").agg(sum("n_ab").as("n_left"))
    val right = counts.groupBy("w2").agg(sum("n_ab").as("n_right"))
    counts.where(col("n_ab") >= minCount)
      .join(left, "w1").join(right, "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("n_ab"), col("n_left"), col("n_right"),
        (col("n_ab").cast("double") * col("__n").cast("double") /
          (col("n_left").cast("double") * col("n_right").cast("double")))
          .as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** One row per adjacent token pair PER DOCUMENT (`doc_id`, `w1`,
    * `w2`) — the doc-keyed sibling of [[bigramPairs]], for per-doc
    * model-fit scoring. */
  def docBigramPairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = TextFunctions.tokens(col(textCol))
    df.select(col(idCol).as("doc_id"), tk.as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("tk")) - 1), i =>
          struct(element_at(col("tk"), i).as("w1"),
            element_at(col("tk"), i + 1).as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"))
  }

  /** Per-document model-fit score under the corpus's OWN bigram model —
    * the perplexity-filter shape of CCNet-style curation with the
    * transcendental log replaced by an integer-scaled mean continuation
    * probability: score = (Σ over the doc's bigram occurrences of
    * (n(w1,w2) · scale) div n(w1,·)) div n_bigrams, in [0, scale].
    * Monotone in the mean continuation probability and DETERMINISTIC in
    * any engine — truncating integer arithmetic only, no float
    * summation order, no libm (two engines' `ln` may differ in ULPs;
    * two engines' integer division cannot). Formulaic/boilerplate docs
    * whose transitions the corpus has seen often score high;
    * out-of-distribution or noisy docs score low — either tail is a
    * curation signal. Docs with fewer than 2 tokens have no bigrams and
    * no row.
    *
    * Scale shape: the model is two slim re-aggregations of the
    * pair-count table (no second corpus scan); the doc side shuffles
    * slim (doc, w1, w2) triples into a join keyed on the pair, with the
    * model side AQE-decided (broadcast while the vocabulary is small,
    * shuffled join at web scale — same policy as TfIdf's vocabulary
    * join). Output: (doc_id, n_bigrams, lm_score). */
  def lmFitScore(df: DataFrame, idCol: String, textCol: String,
                 scale: Long = 1000000L): DataFrame = {
    val dp = docBigramPairs(df, idCol, textCol)
    val counts = dp.groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
    val left = counts.groupBy("w1").agg(sum("n_ab").as("n_w1"))
    dp.join(counts, Seq("w1", "w2")).join(left, Seq("w1"))
      .select(col("doc_id"), expr(s"(n_ab * ${scale}L) div n_w1").as("sp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(sp) div count(1)").as("lm_score"))
  }

  /** DSIR-shaped importance score: rank corpus documents by how much
    * they look like a TARGET domain, via hashed-unigram importance
    * ratios — the data-selection move behind importance resampling
    * (select pretraining data whose feature distribution matches the
    * target domain's). Features are tokens hashed into `buckets`
    * cells; each doc scores the mean over its token occurrences of
    * (n_target(f)+1)·scale div (n_corpus(f)+1) — add-one smoothed,
    * and in TRUNCATING INTEGER arithmetic like [[lmFitScore]]: a
    * monotone proxy of the target/corpus likelihood ratio with no log,
    * no float fold, bit-exact in any engine.
    *
    * Scale shape: the two feature tables are bounded by `buckets` rows
    * (broadcast always, regardless of corpus size); everything else is
    * one map-side explode + one groupBy(doc_id). The target side is
    * typically a small curated slice — its count table costs one scan
    * of the slice, not the corpus. Output: (doc_id, n_tokens,
    * importance). Docs with no tokens have no row. */
  def hashedImportanceScore(corpus: DataFrame, target: DataFrame,
                            idCol: String, textCol: String,
                            buckets: Int = 4096,
                            scale: Long = 1000000L): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    def feats(df: DataFrame) = df
      .filter(trim(col(textCol)) =!= "")
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col("doc_id"),
        (graft.functions.TextFunctions.polyHash(col("tok")) % buckets).as("f"))
    val corpusFeats = feats(corpus)
    val nC = corpusFeats.groupBy("f").agg(count(lit(1)).as("n_c"))
    val nT = feats(target).groupBy("f").agg(count(lit(1)).as("n_t"))
    corpusFeats
      .join(broadcast(nC.join(nT, Seq("f"), "left")), Seq("f"))
      .select(col("doc_id"),
        expr(s"((coalesce(n_t, 0L) + 1L) * ${scale}L) div (n_c + 1L)").as("sp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        expr("sum(sp) div count(1)").as("importance"))
  }

  /** Bigram continuation table: for each predecessor `w1`, the top-k
    * successors by count with the continuation probability
    * n / total(w1). The probability is a ratio of two exact integer
    * counts evaluated in double — bit-exact in any engine. */
  def bigramTopK(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = bigramPairs(df, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
    val byW1 = Window.partitionBy("w1")
    val rank = Window.partitionBy("w1").orderBy(col("n").desc, col("w2").asc)
    counts
      .withColumn("p", col("n").cast("double") / sum("n").over(byW1).cast("double"))
      .withColumn("rank", row_number().over(rank))
      .where(col("rank") <= k)
  }
}
