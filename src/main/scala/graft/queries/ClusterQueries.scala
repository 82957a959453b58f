package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Clustering
import graft.sources.Tables

/** Embedding clustering and semantic dedup: deterministic Lloyd
  * k-means (q3N) and SemDeDup within-cluster near-dup dropping (q3O).
  * The oracles replay the identical arithmetic — LCG-free seeds (the k
  * lowest-id embeddings), exact decimal mean sums, unrounded cosine
  * argmax with ties to the lowest cluster id — so every label is
  * reproduced bit-for-bit by DuckDB.
  */
object ClusterQueries {

  private val K = 8
  private val Iters = 2
  private val Dim = 64
  private val Tau = 0.5

  /** Unrounded cosine; `cast` marks which side still holds float32
    * (the corpus column) vs already-double centroid lists. */
  private def cos(a: String, b: String, castB: Boolean): String = {
    def t(v: String, c: Boolean) = if (c) s"CAST($v AS DOUBLE)" else v
    val dot = s"list_sum(list_transform(range(1, ${Dim + 1}), " +
      s"__i -> CAST($a[__i] AS DOUBLE) * ${t(s"$b[__i]", castB)}))"
    def n2(v: String, c: Boolean) = s"list_sum(list_transform(range(1, ${Dim + 1}), " +
      s"__i -> ${t(s"$v[__i]", c)} * ${t(s"$v[__i]", c)}))"
    s"$dot / (sqrt(${n2(a, true)}) * sqrt(${n2(b, castB)}))"
  }

  /** One Lloyd assignment: nearest centroid by unrounded cosine, ties
    * to the lowest cluster id. */
  private def duckAssign(out: String, cenTbl: String): String =
    s"""$out AS (
       |  SELECT vec_id, embedding, cl FROM (
       |    SELECT e.vec_id, e.embedding, c.cl,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cos("e.embedding", "c.cen", castB = false)} DESC,
       |                      c.cl) AS __rn
       |    FROM embeddings e, $cenTbl c) __t
       |  WHERE __rn = 1)""".stripMargin

  /** One Lloyd update: per-dimension mean as an exact decimal sum
    * (order-independent) divided in doubles — the same arithmetic the
    * Spark side's partial-aggregated decimal sum produces. */
  private def duckMeans(out: String, asgTbl: String): String =
    s"""${out}_cells AS (
       |  SELECT cl, __p,
       |         CAST(SUM(CAST(CAST(embedding[__p] AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
       |           / COUNT(*) AS __m
       |  FROM $asgTbl, range(1, ${Dim + 1}) t(__p)
       |  GROUP BY cl, __p),
       |$out AS (SELECT cl, list(__m ORDER BY __p) AS cen FROM ${out}_cells GROUP BY cl)""".stripMargin

  /** Seeds + `Iters` update rounds + final assignment, as a WITH-chain
    * prefix ending in table `af`. */
  private val duckLloyd: String = {
    val rounds = (1 to Iters).map { i =>
      duckAssign(s"a$i", s"c${i - 1}") + ",\n" + duckMeans(s"c$i", s"a$i")
    }.mkString(",\n")
    s"""WITH c0 AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl,
       |         list_transform(embedding, __x -> CAST(__x AS DOUBLE)) AS cen
       |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $K) __s),
       |$rounds,
       |${duckAssign("af", s"c$Iters")}""".stripMargin
  }

  val all: Map[String, QueryDef] = Map(

    // Deterministic Lloyd k-means labels (k=8, 2 update rounds).
    "q3N_kmeans" -> QueryDef(
      (s, dir) => Clustering.kmeans(
          Tables.computeTable(s, dir, "embeddings"), K, Iters, Dim)
        .orderBy("vec_id"),
      s"""$duckLloyd
         |SELECT vec_id, cl AS cluster FROM af ORDER BY vec_id""".stripMargin),

    // SemDeDup: within each k-means cluster drop every member with a
    // smaller-id neighbor above cosine tau. The pairwise step never
    // leaves a cluster — that bound is the whole point at scale.
    "q3O_semdedup" -> QueryDef(
      (s, dir) => Clustering.semDedup(
          Tables.computeTable(s, dir, "embeddings"), K, Iters, Dim, Tau)
        .orderBy("vec_id"),
      s"""$duckLloyd,
         |d AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM af a JOIN af b ON a.cl = b.cl AND a.vec_id < b.vec_id
         |  WHERE round(${cos("a.embedding", "b.embedding", castB = true)}, 6) >= $Tau)
         |SELECT af.vec_id, af.cl AS cluster, d.vec_id IS NULL AS keep
         |FROM af LEFT JOIN d ON af.vec_id = d.vec_id
         |ORDER BY af.vec_id""".stripMargin)
  )
}
