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
