package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Per-document distinctive-term extraction (tf-idf): the standard
  * corpus-analysis pass a curation pipeline runs to label topics,
  * detect boilerplate vocabularies, and build keyword indexes.
  *
  * The idf factor is the *rational* form N / df rather than
  * log(N / df): log is monotone, so the per-document ranking is
  * identical, and staying inside +,*,/ on integer-valued doubles keeps
  * every score a correctly-rounded IEEE-754 result any engine
  * reproduces bit-for-bit (ln is libm-dependent across engines).
  *
  * Scale shape: one explode + slim (doc_id, term) groupBy for term
  * frequencies; document frequencies aggregate *from the tf frame* (no
  * second corpus scan) into a vocabulary-sized frame; the per-document
  * top-k is a WindowGroupLimit window. The corpus text is scanned
  * exactly once and never shuffled — only (doc_id, term, count)
  * triples move. The tf-vocabulary join is left to AQE: at 100 TB the
  * distinct-term count can reach billions, so a forced broadcast of
  * the vocabulary side would OOM the driver — AQE broadcasts it only
  * when its runtime size is actually small. Only the 1-row corpus
  * count is broadcast unconditionally.
  */
object TfIdf {

  /** Top-`k` terms per document by tf-idf, ties broken by term.
    * Output: (doc_id, term, tf, df_docs, tfidf, rank). */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val docs = df.filter(length(trim(col(textCol))) > 0)
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df_docs"))
    val nDocs = docs.select(countDistinct(col(idCol)).as("__n"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf").cast("double") * col("__n") / col("df_docs").cast("double"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df_docs"),
        col("tfidf"), col("rank").cast("int").as("rank"))
  }
}
