package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Similarity search over the `embeddings` table: brute-force cosine
  * top-k (broadcast query side) and the sign-LSH bucketed scale path.
  * Oracles compute the same sequential-fold dot products in DuckDB.
  */
object VectorQueries {

  private val DuckDot =
    "list_sum(list_transform(range(1, len(%s) + 1), i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE)))"

  private def dot(a: String, b: String) = DuckDot.format(a, a, b)
  private def norm2(a: String) = DuckDot.format(a, a, a)

  private val DuckCos =
    s"round(${dot("q.embedding", "c.embedding")} / " +
      s"(sqrt(${norm2("q.embedding")}) * sqrt(${norm2("c.embedding")})), 6)"

  private val DuckBucket8 = (0 until 8)
    .map(d => s"CASE WHEN %s.embedding[${d + 1}] >= 0 THEN ${1L << d} ELSE 0 END")
    .mkString(" + ")

  val all: Map[String, QueryDef] = Map(

    // Brute-force cosine top-5 for 8 query vectors.
    "q28_cosine_topk" -> QueryDef(
      (s, dir) => {
        val emb = Tables.computeTable(s, dir, "embeddings")
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8), k = 5)
          .orderBy("qid", "rank")
      },
      s"""WITH scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid, $DuckCos AS cos
         |  FROM embeddings q, embeddings c
         |  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
         |  FROM scored)
         |SELECT qid, cid, cos, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin),

    // Sign-LSH bucketed ANN top-5 (8-bit buckets).
    "q29_ann_lsh" -> QueryDef(
      (s, dir) => {
        val emb = Tables.computeTable(s, dir, "embeddings")
        Similarity.lshTopK(emb, emb.filter(col("vec_id") < 8), k = 5, bits = 8)
          .orderBy("qid", "rank")
      },
      s"""WITH b AS (
         |  SELECT vec_id, embedding,
         |         ${DuckBucket8.replace("%s", "b0")} AS bucket
         |  FROM embeddings b0),
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid, $DuckCos AS cos
         |  FROM b q JOIN b c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 8),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
         |  FROM scored)
         |SELECT qid, cid, cos, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin),

    // Embedding-cosine near-duplicate pairs within sign buckets.
    "q2A_cosine_neardup" -> QueryDef(
      (s, dir) => Similarity.cosineNearDupPairs(
          Tables.computeTable(s, dir, "embeddings"), threshold = 0.3, bits = 8)
        .orderBy("id_a", "id_b"),
      s"""WITH b AS (
         |  SELECT vec_id, embedding,
         |         ${DuckBucket8.replace("%s", "b0")} AS bucket
         |  FROM embeddings b0),
         |scored AS (
         |  SELECT q.vec_id AS id_a, c.vec_id AS id_b, $DuckCos AS cos
         |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id < c.vec_id)
         |SELECT id_a, id_b, cos FROM scored WHERE cos >= 0.3
         |ORDER BY id_a, id_b""".stripMargin)
  )
}
