package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Inverted-index keyword search over a document corpus.
  *
  * Reference analogue: none — engine-completeness operator (corpus
  * slicing by required keywords is a standard curation step, and the
  * postings shape is the same one q3D decontamination builds).
  *
  * Scale shape: the postings stream is filtered to the probe terms
  * *before* any shuffle — the exchange carries at most one slim
  * (doc_id, term) row per probe term per document, never the full
  * token stream — and the AND semantics reduce to a count-distinct
  * per document equal to the probe count. The final attach back to the
  * document table is a semi-join on `doc_id`, which AQE broadcasts
  * whenever the match set is small (the common case for selective
  * keyword sets).
  */
object InvertedIndex {

  /** Distinct (id, term) postings restricted to `terms`. */
  def postings(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame =
    df.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .where(col("term").isin(terms: _*))
      .distinct()

  /** Documents whose text contains every one of `terms` (boolean AND
    * over whitespace tokens). Returns the full input rows. */
  def searchAll(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "searchAll requires at least one probe term")
    require(terms.distinct.size == terms.size, s"duplicate probe terms: $terms")
    val hits = postings(df, idCol, textCol, terms)
      .groupBy(idCol).agg(count(lit(1)).as("__nt"))
      .where(col("__nt") === terms.size)
      .select(idCol)
    df.join(hits, Seq(idCol), "left_semi")
  }
}
