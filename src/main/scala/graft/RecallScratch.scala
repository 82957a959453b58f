package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

// temporary measurement harness; deleted after q29 re-parameterization
object RecallScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val n = emb.count()
      val queries = emb.filter(col("vec_id") < 8)
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(Similarity.bruteForceTopK(emb, queries, 5))
      for ((tables, bits, r) <- Seq((16, 8, 0), (4, 8, 2), (8, 8, 2), (4, 8, 3), (16, 8, 2))) {
        val t0 = System.nanoTime()
        val mt = pairs(Similarity.lshTopKMultiTable(emb, queries, 5, tables, bits, 64, r))
        val dt = (System.nanoTime() - t0) / 1e9
        val rec = (exact & mt).size.toDouble / exact.size
        println(f"[recall] $sf n=$n multitable tables=$tables bits=$bits r=$r recall=$rec%.3f time=$dt%.2fs")
      }
    }
    spark.stop()
  }
}
