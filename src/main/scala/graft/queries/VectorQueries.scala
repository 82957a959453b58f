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

  /** Unrounded cosine over arbitrary column expressions (assignment
    * ranking must match the kernel's raw doubles, see
    * `Similarity.ivfTopK`). */
  private def duckCosRaw(a: String, b: String): String =
    s"${dot(a, b)} / (sqrt(${norm2(a)}) * sqrt(${norm2(b)}))"

  /** The exact hyperplane literals the Spark plan uses, inlined so the
    * oracle's projections are the same doubles folded in the same
    * order — every sign bit matches. */
  private val Planes = Similarity.randomHyperplanes(dim = 64, bits = 8)

  // Product-quantization parameters (q4I): declared BEFORE `all` —
  // object vals initialize in order, and the oracle string is built
  // when the map is.
  private val PqM = 8
  private val PqKs = 16
  private val PqIters = 2
  private val PqDs = 8

  private val DuckBucket8 = Planes.zipWithIndex.map { case (w, j) =>
    val wlist = w.mkString("[", ", ", "]")
    s"(CASE WHEN list_sum(list_transform(range(1, ${w.length + 1}), " +
      s"i -> CAST(%s.embedding[i] AS DOUBLE) * ($wlist)[i])) >= 0 " +
      s"THEN ${1L << j} ELSE 0 END)"
  }.mkString(" + ")

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

    // Multi-probe sign-LSH ANN top-5 (8-bit buckets, Hamming radius 3):
    // each query probes the 93 buckets within Hamming distance 3 of its
    // own sign bucket. Only the broadcast query side expands; the corpus
    // is bucketed exactly once. Single-bucket sign-LSH measured 0.03
    // recall@5 on the near-uniform fixture (the worst case for LSH);
    // radius-3 probing measures 0.575 — the floor SimilaritySpec asserts.
    "q29_ann_lsh" -> QueryDef(
      (s, dir) => {
        val emb = Tables.computeTable(s, dir, "embeddings")
        Similarity.lshTopKMultiProbe(emb, emb.filter(col("vec_id") < 8), k = 5,
          planes = Planes, maxHamming = 3)
          .orderBy("qid", "rank")
      }, {
        val masks = Similarity.probeMasks(bits = 8, maxHamming = 3)
          .mkString("[", ", ", "]")
        s"""WITH b AS (
           |  SELECT vec_id, embedding,
           |         ${DuckBucket8.replace("%s", "b0")} AS bucket
           |  FROM embeddings b0),
           |probes AS (
           |  SELECT q.vec_id, q.embedding, xor(q.bucket, pm.m) AS bucket
           |  FROM b q, UNNEST($masks) AS pm(m)
           |  WHERE q.vec_id < 8),
           |scored AS (
           |  SELECT q.vec_id AS qid, c.vec_id AS cid, $DuckCos AS cos
           |  FROM probes q JOIN b c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
           |  FROM scored)
           |SELECT qid, cid, cos, CAST(rank AS INTEGER) AS rank
           |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
      }),

    // Multi-table LSH ANN: OR-amplified recall, LCG-formula hyperplanes
    // (bit-exact in both engines from the formula alone).
    "q2B_ann_multitable" -> QueryDef(
      (s, dir) => {
        val emb = Tables.computeTable(s, dir, "embeddings")
        Similarity.lshTopKMultiTable(emb, emb.filter(col("vec_id") < 8), k = 5,
          tables = 16, bits = 8, dim = 64)
          .orderBy("qid", "rank")
      }, {
        def proj(idxBase: String): String =
          "list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * " +
            s"(CAST((1103515245 * ($idxBase + i - 1) + 12345) % 2147483648 AS DOUBLE)" +
            " / 2147483648.0 * 2 - 1)))"
        val bucketExpr = (0 until 8).map { j =>
          s"(CASE WHEN ${proj(s"t * 512 + ${j * 64}")} >= 0 THEN ${1L << j} ELSE 0 END)"
        }.mkString("\n           + ")
        s"""WITH buckets AS (
           |  SELECT vec_id, t,
           |         $bucketExpr AS bucket
           |  FROM embeddings, UNNEST(range(0, 16)) AS u(t)),
           |cand AS (
           |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
           |  FROM buckets q JOIN buckets c
           |    ON q.t = c.t AND q.bucket = c.bucket AND c.vec_id <> q.vec_id
           |  WHERE q.vec_id < 8),
           |scored AS (
           |  SELECT cand.qid, cand.cid, $DuckCos AS cos
           |  FROM cand
           |  JOIN embeddings q ON q.vec_id = cand.qid
           |  JOIN embeddings c ON c.vec_id = cand.cid),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
           |  FROM scored)
           |SELECT qid, cid, cos, CAST(rank AS INTEGER) AS rank
           |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
      }),

    // IVF-flat ANN: map-side coarse quantization (kernel argmax against
    // an inlined centroid sample), nprobe-cell probing.
    "q2C_ann_ivf" -> QueryDef(
      (s, dir) => {
        val emb = Tables.computeTable(s, dir, "embeddings")
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8), k = 5,
          centroids = emb.filter(col("vec_id") % 64 === 0), nprobe = 2, dim = 64)
          .orderBy("qid", "rank")
      },
      s"""WITH cen AS (
         |  SELECT vec_id AS cen_id, embedding AS cen_v FROM embeddings
         |  WHERE vec_id % 64 = 0),
         |ca AS (
         |  SELECT cid, cv, cen_id AS cell FROM (
         |    SELECT e.vec_id AS cid, e.embedding AS cv, c.cen_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${duckCosRaw("e.embedding", "c.cen_v")} DESC, c.cen_id) AS rn
         |    FROM embeddings e, cen c)
         |  WHERE rn = 1),
         |qa AS (
         |  SELECT qid, qv, cen_id AS cell FROM (
         |    SELECT q.vec_id AS qid, q.embedding AS qv, c.cen_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${duckCosRaw("q.embedding", "c.cen_v")} DESC, c.cen_id) AS rn
         |    FROM embeddings q, cen c WHERE q.vec_id < 8)
         |  WHERE rn <= 2),
         |scored AS (
         |  SELECT qid, cid, round(${duckCosRaw("qv", "cv")}, 6) AS cos
         |  FROM qa JOIN ca USING (cell) WHERE qid <> cid),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
         |  FROM scored)
         |SELECT qid, cid, cos, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin),

    // Embedding-cosine near-duplicate pairs within sign buckets.
    "q2A_cosine_neardup" -> QueryDef(
      (s, dir) => Similarity.cosineNearDupPairs(
          Tables.computeTable(s, dir, "embeddings"), threshold = 0.3, planes = Planes)
        .orderBy("id_a", "id_b"),
      s"""WITH b AS (
         |  SELECT vec_id, embedding,
         |         ${DuckBucket8.replace("%s", "b0")} AS bucket
         |  FROM embeddings b0),
         |scored AS (
         |  SELECT q.vec_id AS id_a, c.vec_id AS id_b, $DuckCos AS cos
         |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id < c.vec_id)
         |SELECT id_a, id_b, cos FROM scored WHERE cos >= 0.3
         |ORDER BY id_a, id_b""".stripMargin),

    // Int8-quantized exhaustive top-k — the compressed-scan recall-1.0
    // baseline. Quantization (floor(x*127/max|x| + 0.5)) and the int64
    // dot products are exact integer/IEEE arithmetic, so the oracle
    // reproduces every score bit-for-bit.
    "q3W_quantized_topk" -> QueryDef(
      (s, dir) => {
        val emb = Tables.computeTable(s, dir, "embeddings")
        Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 8), k = 5)
          .orderBy("qid", "rank")
      },
      """WITH mx AS (
        |  SELECT vec_id, embedding,
        |         list_max(list_transform(embedding, __x -> abs(CAST(__x AS DOUBLE)))) AS m
        |  FROM embeddings),
        |qz AS (
        |  SELECT vec_id,
        |         list_transform(embedding,
        |           __x -> CAST(floor(CAST(__x AS DOUBLE) * (127.0 / m) + 0.5) AS BIGINT)) AS qv
        |  FROM mx WHERE m > 0),
        |nz AS (
        |  SELECT vec_id, qv,
        |         CAST(list_sum(list_transform(range(1, len(qv) + 1),
        |           __i -> qv[__i] * qv[__i])) AS BIGINT) AS nrm
        |  FROM qz),
        |scored AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid,
        |         CAST(CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
        |           __i -> q.qv[__i] * c.qv[__i])) AS BIGINT) AS DOUBLE)
        |           / (sqrt(CAST(q.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) AS qcos
        |  FROM nz q, nz c
        |  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id AND q.nrm > 0 AND c.nrm > 0),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, cid) AS rank
        |  FROM scored)
        |SELECT qid, cid, qcos, CAST(rank AS INTEGER) AS rank
        |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin),

    // Contrastive triplets: cosine near-dup pairs become
    // (anchor, positive) with a deterministic hash-drawn negative from
    // the bucket-representative table (64 buckets, broadcast; next
    // bucket on collision). The draw is a pure function of the data —
    // bit-reproducible, and assembled map-side over the pairs.
    "q47_contrastive_triplets" -> QueryDef(
      (s, dir) => {
        val emb = Tables.computeTable(s, dir, "embeddings")
        val pairs = Similarity.cosineNearDupPairs(emb, threshold = 0.3,
          planes = Planes).select("id_a", "id_b")
        graft.operators.TrainingPairs.contrastiveTriplets(pairs, emb, "vec_id",
            buckets = 64, salt = "trip")
          .orderBy("anchor", "positive")
      },
      s"""WITH b AS (
         |  SELECT vec_id, embedding,
         |         ${DuckBucket8.replace("%s", "b0")} AS bucket
         |  FROM embeddings b0),
         |scored AS (
         |  SELECT q.vec_id AS id_a, c.vec_id AS id_b, $DuckCos AS cos
         |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id < c.vec_id),
         |pairs AS (SELECT id_a, id_b FROM scored WHERE cos >= 0.3),
         |hh AS (
         |  SELECT vec_id, ${QueryDef.duckSampleHash("vec_id", "trip")} AS h
         |  FROM embeddings),
         |rb AS (SELECT vec_id, h, CAST(h % 64 AS INTEGER) AS bk FROM hh),
         |reps AS (
         |  SELECT bk, vec_id AS rep FROM (
         |    SELECT bk, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY bk ORDER BY h, vec_id) AS rn
         |    FROM rb) WHERE rn = 1),
         |pn AS (
         |  SELECT id_a, id_b,
         |         CAST(${QueryDef.duckSampleHash("id_a", "trip:n")} % 64 AS INTEGER) AS nb
         |  FROM pairs),
         |j AS (
         |  SELECT id_a, id_b, r1.rep AS rep1, r2.rep AS rep2
         |  FROM pn LEFT JOIN reps r1 ON r1.bk = pn.nb
         |          LEFT JOIN reps r2 ON r2.bk = (pn.nb + 1) % 64),
         |t AS (
         |  SELECT id_a AS anchor, id_b AS positive,
         |         CASE WHEN rep1 IS NOT NULL AND rep1 <> id_a AND rep1 <> id_b
         |                THEN rep1
         |              WHEN rep2 IS NOT NULL AND rep2 <> id_a AND rep2 <> id_b
         |                THEN rep2
         |         END AS negative
         |  FROM j)
         |SELECT anchor, positive, negative FROM t
         |WHERE negative IS NOT NULL ORDER BY anchor, positive""".stripMargin),

    // Hard-negative mining: per anchor, the 2 most cosine-similar
    // corpus vectors that are neither the anchor nor any of its
    // positives — the negatives that keep a contrastive loss's
    // gradient alive after easy random draws saturate. Anchor batch
    // broadcasts with vectors; the corpus streams once; positives
    // exclude via left-anti on the slim pair list.
    "q5J_hard_negatives" -> QueryDef(
      (s, dir) => {
        val emb = Tables.computeTable(s, dir, "embeddings")
        val pairs = Similarity.cosineNearDupPairs(emb, threshold = 0.3,
          planes = Planes).select("id_a", "id_b")
        graft.operators.TrainingPairs.hardNegatives(pairs, emb,
            "vec_id", "embedding", k = 2)
          .orderBy("anchor", "rank")
      },
      s"""WITH b AS (
         |  SELECT vec_id, embedding,
         |         ${DuckBucket8.replace("%s", "b0")} AS bucket
         |  FROM embeddings b0),
         |scored0 AS (
         |  SELECT q.vec_id AS id_a, c.vec_id AS id_b, $DuckCos AS cos
         |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id < c.vec_id),
         |pairs AS (SELECT id_a, id_b FROM scored0 WHERE cos >= 0.3),
         |pos AS (SELECT id_a, id_b FROM pairs
         |        UNION ALL SELECT id_b, id_a FROM pairs),
         |anch AS (SELECT DISTINCT id_a FROM pos),
         |hn AS (
         |  SELECT q.vec_id AS anchor, c.vec_id AS negative, $DuckCos AS cos
         |  FROM (SELECT e.* FROM embeddings e JOIN anch a ON e.vec_id = a.id_a) q
         |  JOIN embeddings c ON q.vec_id <> c.vec_id
         |  WHERE NOT EXISTS (SELECT 1 FROM pos p
         |                    WHERE p.id_a = q.vec_id AND p.id_b = c.vec_id)),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor
         |            ORDER BY cos DESC, negative) AS rank
         |  FROM hn)
         |SELECT anchor, negative, cos, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 2 ORDER BY anchor, rank""".stripMargin),

    // Product-quantization ADC top-k (Jégou et al.): per-subspace Lloyd
    // codebooks, 8-byte codes, per-query lookup tables. The oracle
    // replays the entire pipeline — subspace seeds, decimal means,
    // ascending-order (x-c)^2 folds, lowest-code ties — bit-for-bit.
    "q4I_pq_topk" -> QueryDef(
      (s, dir) => {
        val emb = Tables.computeTable(s, dir, "embeddings")
        graft.operators.ProductQuantizer.pqTopK(emb,
            emb.filter(col("vec_id") < 8), k = 5,
            m = PqM, ks = PqKs, iters = PqIters, dim = 64)
          .orderBy("qid", "rank")
      },
      duckPq),

    // IVF+PQ (IVFADC): coarse cells bound the candidate set, PQ codes
    // bound the scanned bytes — the production large-corpus ANN
    // composition. Same coarse quantizer as q2C, same codebooks as
    // q4I; the oracle composes both CTE chains.
    "q4K_ann_ivfpq" -> QueryDef(
      (s, dir) => {
        val emb = Tables.computeTable(s, dir, "embeddings")
        graft.operators.ProductQuantizer.ivfPqTopK(emb,
            emb.filter(col("vec_id") < 8), k = 5,
            centroids = emb.filter(col("vec_id") % 64 === 0), nprobe = 2,
            m = PqM, ks = PqKs, iters = PqIters, dim = 64)
          .orderBy("qid", "rank")
      },
      s"""WITH $duckPqCtes,
         |kcen AS (
         |  SELECT vec_id AS cen_id, embedding AS cen_v FROM embeddings
         |  WHERE vec_id % 64 = 0),
         |kca AS (
         |  SELECT cid, cen_id AS cell FROM (
         |    SELECT e.vec_id AS cid, c.cen_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${duckCosRaw("e.embedding", "c.cen_v")} DESC, c.cen_id) AS rn
         |    FROM embeddings e, kcen c) __t
         |  WHERE rn = 1),
         |kqa AS (
         |  SELECT qid, qv, cen_id AS cell FROM (
         |    SELECT q.vec_id AS qid, q.embedding AS qv, c.cen_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${duckCosRaw("q.embedding", "c.cen_v")} DESC, c.cen_id) AS rn
         |    FROM embeddings q, kcen c WHERE q.vec_id < 8) __t
         |  WHERE rn <= 2),
         |kpairs AS (
         |  SELECT x.qid, ca.cid, a.sub,
         |         ${duckSubL2("x.qv", "a.sub", "c.cen")} AS dm
         |  FROM kqa x JOIN kca ca ON x.cell = ca.cell
         |       JOIN paf a ON a.vec_id = ca.cid
         |       JOIN pcb$PqIters c ON a.sub = c.sub AND a.code = c.code
         |  WHERE ca.cid <> x.qid),
         |kscored AS (
         |  SELECT qid, cid, round(list_sum(list(dm ORDER BY sub)), 6) AS adist
         |  FROM kpairs GROUP BY qid, cid),
         |kranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY qid
         |    ORDER BY adist, cid) AS rank
         |  FROM kscored)
         |SELECT qid, cid, adist, CAST(rank AS INTEGER) AS rank
         |FROM kranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin),

    // Hard-negative mining at INDEX speed: anchors probe the IVF+PQ
    // index (q4K's coarse cells + codebooks) for kCand approximate
    // candidates, positives/self drop, survivors re-rank by EXACT
    // cosine — the ANN retrieve-then-refine shape that replaces q5J's
    // per-batch full-corpus rescan. The oracle composes q5J's pair
    // CTEs with q4K's PQ chain, then replays candidate selection
    // (rounded adist, cid ties), the anti-join, and the exact re-rank.
    // Correctness gate only — the recall-vs-brute-force floor (>= 0.9
    // at wider probe/headroom settings) is SimilaritySpec's job.
    "q5R_ann_hard_negatives" -> QueryDef(
      (s, dir) => {
        val emb = Tables.computeTable(s, dir, "embeddings")
        val pairs = Similarity.cosineNearDupPairs(emb, threshold = 0.3,
          planes = Planes).select("id_a", "id_b")
        graft.operators.TrainingPairs.hardNegativesAnn(pairs, emb,
            "vec_id", "embedding", k = 2, kCand = 16,
            centroids = emb.filter(col("vec_id") % 64 === 0), nprobe = 2,
            m = PqM, ks = PqKs, iters = PqIters, dim = 64)
          .orderBy("anchor", "rank")
      },
      s"""WITH b AS (
         |  SELECT vec_id, embedding,
         |         ${DuckBucket8.replace("%s", "b0")} AS bucket
         |  FROM embeddings b0),
         |scored0 AS (
         |  SELECT q.vec_id AS id_a, c.vec_id AS id_b, $DuckCos AS cos
         |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id < c.vec_id),
         |pairs AS (SELECT id_a, id_b FROM scored0 WHERE cos >= 0.3),
         |pos AS (SELECT id_a, id_b FROM pairs
         |        UNION ALL SELECT id_b, id_a FROM pairs),
         |anch AS (SELECT DISTINCT id_a FROM pos),
         |$duckPqCtes,
         |kcen AS (
         |  SELECT vec_id AS cen_id, embedding AS cen_v FROM embeddings
         |  WHERE vec_id % 64 = 0),
         |kca AS (
         |  SELECT cid, cen_id AS cell FROM (
         |    SELECT e.vec_id AS cid, c.cen_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${duckCosRaw("e.embedding", "c.cen_v")} DESC, c.cen_id) AS rn
         |    FROM embeddings e, kcen c) __t
         |  WHERE rn = 1),
         |aqa AS (
         |  SELECT qid, qv, cen_id AS cell FROM (
         |    SELECT q.vec_id AS qid, q.embedding AS qv, c.cen_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${duckCosRaw("q.embedding", "c.cen_v")} DESC, c.cen_id) AS rn
         |    FROM (SELECT e.* FROM embeddings e JOIN anch a ON e.vec_id = a.id_a) q,
         |         kcen c) __t
         |  WHERE rn <= 2),
         |apairs AS (
         |  SELECT x.qid, ca.cid, a.sub,
         |         ${duckSubL2("x.qv", "a.sub", "c.cen")} AS dm
         |  FROM aqa x JOIN kca ca ON x.cell = ca.cell
         |       JOIN paf a ON a.vec_id = ca.cid
         |       JOIN pcb$PqIters c ON a.sub = c.sub AND a.code = c.code
         |  WHERE ca.cid <> x.qid),
         |ascored AS (
         |  SELECT qid, cid, round(list_sum(list(dm ORDER BY sub)), 6) AS adist
         |  FROM apairs GROUP BY qid, cid),
         |acand AS (
         |  SELECT qid, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY adist, cid) AS rank
         |    FROM ascored) __r
         |  WHERE rank <= 16),
         |aneg AS (
         |  SELECT qid, cid FROM acand
         |  WHERE NOT EXISTS (SELECT 1 FROM pos p
         |                    WHERE p.id_a = acand.qid AND p.id_b = acand.cid)),
         |rer AS (
         |  SELECT n.qid AS anchor, n.cid AS negative, $DuckCos AS cos
         |  FROM aneg n JOIN embeddings q ON q.vec_id = n.qid
         |       JOIN embeddings c ON c.vec_id = n.cid),
         |rr AS (
         |  SELECT *, row_number() OVER (PARTITION BY anchor
         |    ORDER BY cos DESC, negative) AS rank
         |  FROM rer)
         |SELECT anchor, negative, cos, CAST(rank AS INTEGER) AS rank
         |FROM rr WHERE rank <= 2 ORDER BY anchor, rank""".stripMargin),

    // Persisted, incrementally-maintained IVF index (round-16): the
    // production shape of q2C. Build freezes the coarse quantizer and
    // materializes cell assignments as a cell-clustered snapshot
    // table; two CDC epochs then hit the CORPUS (an append and a
    // keyed delete) and `refresh` advances the index by consuming the
    // change feed — one equality delete masks the touched ids, only
    // the appended batch is assigned (O(batch), never O(corpus)).
    // AnnIndexSpec pins that the maintained index answers row-for-row
    // like a from-scratch rebuild at the corpus head (round-17: that
    // assertion used to run IN-QUERY, paying a second full build per
    // bench rep). The oracle replays IVF search over the final corpus
    // in DuckDB.
    // Streaming ANN index maintenance (round-16): the same index as
    // q7N, but maintained by TAILING the corpus change-feed stream —
    // `readChangeFeed` → foreachBatch(AnnIndex.applyFeedBatch), the
    // production continuous-ingest shape. The stream replays BOTH CDC
    // epochs in micro-batches (AvailableNow), the consumer collapses
    // newest-action-per-id and applies one equality delete + one
    // batch-sized append per batch. AnnIndexSpec pins the stream-fed
    // == from-scratch-rebuild row equality; the DuckDB oracle replays
    // IVF search over the final corpus.
    "q7P_ann_index_stream" -> QueryDef(
      (s, dir) => {
        import graft.sources.SnapshotTable
        import graft.operators.AnnIndex
        def scratch(name: String): String = {
          val base = new java.io.File(
            sys.props.getOrElse("java.io.tmpdir", "/tmp"),
            s"graft-snap/${new java.io.File(dir).getName}/$name").getAbsolutePath
          val p = new org.apache.hadoop.fs.Path(base)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
          base
        }
        val emb = Tables.computeTable(s, dir, "embeddings")
        val cenRows = emb.filter((col("vec_id") % 64 === 0) &&
          col("vec_id") < 450)
        val corpus = scratch("t7P_corpus")
        val idx = scratch("t7P_index")
        SnapshotTable.write(s, emb.filter(col("vec_id") < 450),
          corpus, "overwrite", Seq("vec_id"))
        val builtAt = AnnIndex.build(s, corpus, idx, centroids = cenRows,
          dim = 64)
        // CDC epochs land on the corpus while the index is offline
        SnapshotTable.write(s, emb.filter(col("vec_id") >= 450),
          corpus, "append", Seq("vec_id"))
        SnapshotTable.deleteByKey(s, corpus, "vec_id",
          s.range(0, 10).toDF("vec_id"))
        // ...then a change-feed STREAM catches the index up, one
        // version per micro-batch so the collapse logic is exercised
        val ckpt = scratch("t7P_ckpt")
        val q = s.readStream.format("graft_snapshot")
          .option("readChangeFeed", "true")
          .option("startingVersion", (builtAt + 1).toString)
          .option("maxVersionsPerTrigger", "1")
          .load(corpus)
          .writeStream
          .foreachBatch((b: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
            AnnIndex.applyFeedBatch(b.toDF(), idx))
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val queries = emb.filter(col("vec_id") >= 10 && col("vec_id") < 18)
        // the maintained==rebuilt row-for-row pin lives in AnnIndexSpec
        // ("stream-fed maintenance … matches a rebuild") — the bench
        // pays ONE build; the oracle hash below stays the gate
        AnnIndex.searchTopK(s, idx, queries, k = 5, nprobe = 2)
          .orderBy("qid", "rank")
      },
      s"""WITH corpus AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 10),
         |cen AS (
         |  SELECT vec_id AS cen_id, embedding AS cen_v FROM embeddings
         |  WHERE vec_id % 64 = 0 AND vec_id < 450),
         |ca AS (
         |  SELECT cid, cv, cen_id AS cell FROM (
         |    SELECT e.vec_id AS cid, e.embedding AS cv, c.cen_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${duckCosRaw("e.embedding", "c.cen_v")} DESC, c.cen_id) AS rn
         |    FROM corpus e, cen c)
         |  WHERE rn = 1),
         |qa AS (
         |  SELECT qid, qv, cen_id AS cell FROM (
         |    SELECT q.vec_id AS qid, q.embedding AS qv, c.cen_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${duckCosRaw("q.embedding", "c.cen_v")} DESC, c.cen_id) AS rn
         |    FROM corpus q, cen c WHERE q.vec_id < 18)
         |  WHERE rn <= 2),
         |scored AS (
         |  SELECT qid, cid, round(${duckCosRaw("qv", "cv")}, 6) AS cos
         |  FROM qa JOIN ca USING (cell) WHERE qid <> cid),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
         |  FROM scored)
         |SELECT qid, cid, cos, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin),

    // The ANN index driven ENTIRELY through SQL (round-16): the corpus
    // is an ordinary catalog table with an ARRAY<FLOAT> column; CALL
    // ann_build freezes the quantizer (the `centroids` smallest ids),
    // SQL INSERT + DELETE land CDC epochs (the DELETE rides deletion
    // vectors — refresh consumes a dv epoch here, vs q7N's eq epoch),
    // CALL ann_refresh advances the index O(batch), and CALL
    // ann_search returns the top-k result set for a query TABLE. The
    // oracle replays IVF search over the final corpus.
    "q7R_ann_procedures" -> QueryDef(
      (s, dir) => {
        val root = new java.io.File(
          sys.props.getOrElse("java.io.tmpdir", "/tmp"),
          s"graft-snap/${new java.io.File(dir).getName}/t7R").getAbsolutePath
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        val cat = "graft_ann_" + Integer.toHexString(root.hashCode)
        s.conf.set(s"spark.sql.catalog.$cat",
          "graft.sources.connector.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).mkdirs(p)
        Tables.computeTable(s, dir, "embeddings")
          .createOrReplaceTempView("t7R_emb")
        s.sql(s"CREATE TABLE $cat.corpus (vec_id BIGINT, embedding ARRAY<FLOAT>)")
        s.sql(s"""INSERT INTO $cat.corpus
                  |SELECT vec_id, embedding FROM t7R_emb
                  |WHERE vec_id < 450""".stripMargin)
        s.sql(s"CALL $cat.system.ann_build('corpus', 'ix', 'vec_id', " +
          "'embedding', 64, 8)")
        // CDC epochs in plain SQL: late arrivals + a dv-backed DELETE
        s.sql(s"""INSERT INTO $cat.corpus
                  |SELECT vec_id, embedding FROM t7R_emb
                  |WHERE vec_id >= 450""".stripMargin)
        s.sql(s"DELETE FROM $cat.corpus WHERE vec_id < 10")
        s.sql(s"CALL $cat.system.ann_refresh('corpus', 'ix')")
        s.sql(s"""CREATE TABLE $cat.q AS
                  |SELECT vec_id, embedding FROM $cat.corpus
                  |WHERE vec_id >= 10 AND vec_id < 18""".stripMargin)
        s.sql(s"CALL $cat.system.ann_search('corpus', 'ix', 'q', 5, 2)")
          .orderBy("qid", "rank")
      },
      s"""WITH corpus AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 10),
         |cen AS (
         |  SELECT vec_id AS cen_id, embedding AS cen_v FROM embeddings
         |  WHERE vec_id < 8),
         |ca AS (
         |  SELECT cid, cv, cen_id AS cell FROM (
         |    SELECT e.vec_id AS cid, e.embedding AS cv, c.cen_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${duckCosRaw("e.embedding", "c.cen_v")} DESC, c.cen_id) AS rn
         |    FROM corpus e, cen c)
         |  WHERE rn = 1),
         |qa AS (
         |  SELECT qid, qv, cen_id AS cell FROM (
         |    SELECT q.vec_id AS qid, q.embedding AS qv, c.cen_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${duckCosRaw("q.embedding", "c.cen_v")} DESC, c.cen_id) AS rn
         |    FROM corpus q, cen c WHERE q.vec_id < 18)
         |  WHERE rn <= 2),
         |scored AS (
         |  SELECT qid, cid, round(${duckCosRaw("qv", "cv")}, 6) AS cos
         |  FROM qa JOIN ca USING (cell) WHERE qid <> cid),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
         |  FROM scored)
         |SELECT qid, cid, cos, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin),

    // Persisted IVF+PQ index (round-17): the q4K IVFADC composition
    // as a MAINTAINED on-disk index. Build trains the PQ codebooks
    // over the build-time corpus and freezes them next to the coarse
    // quantizer; `assign/` stores one packed 8-byte code per vector —
    // the index never duplicates the corpus's embedding bytes (at
    // 100 TB the flat index IS a second corpus; this is the storage
    // story). Two CDC epochs then hit the corpus and `refresh`
    // advances the index O(batch): the appended rows PQ-encode
    // against the frozen codebooks, the deleted ids retire via one
    // equality delete. Search ranks probed cells' candidates by the
    // broadcast-lut ADC sum over codes — no vector bytes in flight.
    // The oracle replays the whole chain in DuckDB: codebooks trained
    // on the BUILD corpus, assignment + IVF+ADC search over the FINAL
    // corpus. AnnIndexSpec pins maintained == same-codebooks rebuild
    // and index == in-query ProductQuantizer.ivfPqTopK.
    "q7S_ann_index_pq" -> QueryDef(
      (s, dir) => {
        import graft.sources.SnapshotTable
        import graft.operators.AnnIndex
        def scratch(name: String): String = {
          val base = new java.io.File(
            sys.props.getOrElse("java.io.tmpdir", "/tmp"),
            s"graft-snap/${new java.io.File(dir).getName}/$name").getAbsolutePath
          val p = new org.apache.hadoop.fs.Path(base)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
          base
        }
        val emb = Tables.computeTable(s, dir, "embeddings")
        val cenRows = emb.filter((col("vec_id") % 64 === 0) &&
          col("vec_id") < 450)
        val corpus = scratch("t7S_corpus")
        val idx = scratch("t7S_index")
        SnapshotTable.write(s, emb.filter(col("vec_id") < 450),
          corpus, "overwrite", Seq("vec_id"))
        AnnIndex.build(s, corpus, idx, centroids = cenRows, dim = 64,
          pq = Some(AnnIndex.PqSpec(PqM, PqKs, PqIters)))
        SnapshotTable.write(s, emb.filter(col("vec_id") >= 450),
          corpus, "append", Seq("vec_id"))
        SnapshotTable.deleteByKey(s, corpus, "vec_id",
          s.range(0, 10).toDF("vec_id"))
        AnnIndex.refresh(s, idx)
        val queries = emb.filter(col("vec_id") >= 10 && col("vec_id") < 18)
        AnnIndex.searchTopK(s, idx, queries, k = 5, nprobe = 2)
          .orderBy("qid", "rank")
      },
      s"""WITH bcorp AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 450),
         |corpus AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 10),
         |${duckPqCtesFor("bcorp", "corpus")},
         |kcen AS (
         |  SELECT vec_id AS cen_id, embedding AS cen_v FROM embeddings
         |  WHERE vec_id % 64 = 0 AND vec_id < 450),
         |kca AS (
         |  SELECT cid, cen_id AS cell FROM (
         |    SELECT e.vec_id AS cid, c.cen_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${duckCosRaw("e.embedding", "c.cen_v")} DESC, c.cen_id) AS rn
         |    FROM corpus e, kcen c) __t
         |  WHERE rn = 1),
         |kqa AS (
         |  SELECT qid, qv, cen_id AS cell FROM (
         |    SELECT q.vec_id AS qid, q.embedding AS qv, c.cen_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${duckCosRaw("q.embedding", "c.cen_v")} DESC, c.cen_id) AS rn
         |    FROM corpus q, kcen c WHERE q.vec_id < 18) __t
         |  WHERE rn <= 2),
         |kpairs AS (
         |  SELECT x.qid, ca.cid, a.sub,
         |         ${duckSubL2("x.qv", "a.sub", "c.cen")} AS dm
         |  FROM kqa x JOIN kca ca ON x.cell = ca.cell
         |       JOIN paf a ON a.vec_id = ca.cid
         |       JOIN pcb$PqIters c ON a.sub = c.sub AND a.code = c.code
         |  WHERE ca.cid <> x.qid),
         |kscored AS (
         |  SELECT qid, cid, round(list_sum(list(dm ORDER BY sub)), 6) AS adist
         |  FROM kpairs GROUP BY qid, cid),
         |kranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY qid
         |    ORDER BY adist, cid) AS rank
         |  FROM kscored)
         |SELECT qid, cid, adist, CAST(rank AS INTEGER) AS rank
         |FROM kranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin),

    "q7N_ann_index_cdc" -> QueryDef(
      (s, dir) => {
        import graft.sources.SnapshotTable
        import graft.operators.AnnIndex
        def scratch(name: String): String = {
          val base = new java.io.File(
            sys.props.getOrElse("java.io.tmpdir", "/tmp"),
            s"graft-snap/${new java.io.File(dir).getName}/$name").getAbsolutePath
          val p = new org.apache.hadoop.fs.Path(base)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
          base
        }
        val emb = Tables.computeTable(s, dir, "embeddings")
        val cenRows = emb.filter((col("vec_id") % 64 === 0) &&
          col("vec_id") < 450)
        val corpus = scratch("t7N_corpus")
        val idx = scratch("t7N_index")
        SnapshotTable.write(s, emb.filter(col("vec_id") < 450),
          corpus, "overwrite", Seq("vec_id"))
        AnnIndex.build(s, corpus, idx, centroids = cenRows, dim = 64)
        // CDC epochs against the corpus: late arrivals + a keyed purge
        SnapshotTable.write(s, emb.filter(col("vec_id") >= 450),
          corpus, "append", Seq("vec_id"))
        SnapshotTable.deleteByKey(s, corpus, "vec_id",
          s.range(0, 10).toDF("vec_id"))
        AnnIndex.refresh(s, idx)
        val queries = emb.filter(col("vec_id") >= 10 && col("vec_id") < 18)
        // the maintained==rebuilt row-for-row pin lives in AnnIndexSpec
        // ("build → CDC epochs → refresh answers exactly like a
        // rebuild") — the bench pays ONE build; the oracle hash below
        // stays the gate
        AnnIndex.searchTopK(s, idx, queries, k = 5, nprobe = 2)
          .orderBy("qid", "rank")
      },
      s"""WITH corpus AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 10),
         |cen AS (
         |  SELECT vec_id AS cen_id, embedding AS cen_v FROM embeddings
         |  WHERE vec_id % 64 = 0 AND vec_id < 450),
         |ca AS (
         |  SELECT cid, cv, cen_id AS cell FROM (
         |    SELECT e.vec_id AS cid, e.embedding AS cv, c.cen_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${duckCosRaw("e.embedding", "c.cen_v")} DESC, c.cen_id) AS rn
         |    FROM corpus e, cen c)
         |  WHERE rn = 1),
         |qa AS (
         |  SELECT qid, qv, cen_id AS cell FROM (
         |    SELECT q.vec_id AS qid, q.embedding AS qv, c.cen_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${duckCosRaw("q.embedding", "c.cen_v")} DESC, c.cen_id) AS rn
         |    FROM corpus q, cen c WHERE q.vec_id < 18)
         |  WHERE rn <= 2),
         |scored AS (
         |  SELECT qid, cid, round(${duckCosRaw("qv", "cv")}, 6) AS cos
         |  FROM qa JOIN ca USING (cell) WHERE qid <> cid),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
         |  FROM scored)
         |SELECT qid, cid, cos, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin)
  )

  /** Squared L2 between embedding subspace `sub` (1-based dims) and a
    * codeword list, folded in ascending dimension order — textually the
    * same multiply the kernel does. */
  private def duckSubL2(emb: String, sub: String, cen: String): String =
    s"list_sum(list_transform(range(1, ${PqDs + 1}), __i -> " +
      s"(CAST($emb[$sub*$PqDs + __i] AS DOUBLE) - $cen[__i]) * " +
      s"(CAST($emb[$sub*$PqDs + __i] AS DOUBLE) - $cen[__i])))"

  /** One PQ Lloyd assignment CTE: per (vector, subspace), the argmin-L2
    * codeword from `cbTbl` (unrounded ranking, ties to lowest code). */
  private def duckPqAssign(out: String, cbTbl: String,
                           src: String = "embeddings"): String =
    s"""$out AS (
       |  SELECT vec_id, embedding, sub, code FROM (
       |    SELECT e.vec_id, e.embedding, c.sub, c.code,
       |           row_number() OVER (PARTITION BY e.vec_id, c.sub
       |             ORDER BY ${duckSubL2("e.embedding", "c.sub", "c.cen")} ASC,
       |                      c.code) AS __rn
       |    FROM $src e, $cbTbl c) __t
       |  WHERE __rn = 1)""".stripMargin

  /** One PQ Lloyd update: exact decimal per-cell means; codewords with
    * no members carry the previous round's value (coalesce). */
  private def duckPqMeans(out: String, asgTbl: String, prevCb: String): String =
    s"""${out}_cells AS (
       |  SELECT sub, code, __p,
       |         CAST(SUM(CAST(CAST(embedding[sub*$PqDs + __p] AS DOUBLE)
       |           AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS __m
       |  FROM $asgTbl, range(1, ${PqDs + 1}) t(__p)
       |  GROUP BY sub, code, __p),
       |$out AS (
       |  SELECT p.sub, p.code, coalesce(n.cen, p.cen) AS cen
       |  FROM $prevCb p LEFT JOIN
       |    (SELECT sub, code, list(__m ORDER BY __p) AS cen
       |     FROM ${out}_cells GROUP BY sub, code) n
       |    ON p.sub = n.sub AND p.code = n.code)""".stripMargin

  /** PQ training + encoding CTE chain: seeds → `PqIters` rounds →
    * final assignment `paf` (codes per vec_id, sub), codebooks in
    * `pcb<PqIters>`. Trains over `trainSrc` and assigns `encodeSrc` —
    * distinct sources replay a PERSISTED index whose frozen codebooks
    * predate later CDC epochs (q7S); q4I/q4K use the default
    * both-are-embeddings shape. */
  private def duckPqCtesFor(trainSrc: String, encodeSrc: String): String = {
    val rounds = (1 to PqIters).map { i =>
      duckPqAssign(s"pa$i", s"pcb${i - 1}", trainSrc) + ",\n" +
        duckPqMeans(s"pcb$i", s"pa$i", s"pcb${i - 1}")
    }.mkString(",\n")
    s"""pseeds AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, embedding
       |  FROM (SELECT vec_id, embedding FROM $trainSrc
       |        ORDER BY vec_id LIMIT $PqKs) __s),
       |pcb0 AS (
       |  SELECT s.sub, d.code,
       |         list_transform(range(1, ${PqDs + 1}),
       |           __i -> CAST(d.embedding[s.sub*$PqDs + __i] AS DOUBLE)) AS cen
       |  FROM range(0, $PqM) s(sub), pseeds d),
       |$rounds,
       |${duckPqAssign("paf", s"pcb$PqIters", encodeSrc)}""".stripMargin
  }

  private lazy val duckPqCtes: String =
    duckPqCtesFor("embeddings", "embeddings")

  /** Full PQ oracle: seeds → `PqIters` train rounds → encode → ADC
    * scoring (per-subspace dists summed in subspace order) → top-5. */
  private lazy val duckPq: String = {
    s"""WITH $duckPqCtes,
       |ppairs AS (
       |  SELECT q.vec_id AS qid, a.vec_id AS cid, a.sub,
       |         ${duckSubL2("q.embedding", "a.sub", "c.cen")} AS dm
       |  FROM paf a JOIN pcb$PqIters c ON a.sub = c.sub AND a.code = c.code
       |       CROSS JOIN embeddings q
       |  WHERE q.vec_id < 8 AND a.vec_id <> q.vec_id),
       |pscored AS (
       |  SELECT qid, cid, round(list_sum(list(dm ORDER BY sub)), 6) AS adist
       |  FROM ppairs GROUP BY qid, cid),
       |pranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY adist, cid) AS rank
       |  FROM pscored)
       |SELECT qid, cid, adist, CAST(rank AS INTEGER) AS rank
       |FROM pranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }
}
