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
