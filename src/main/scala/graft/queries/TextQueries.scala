package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{DedupClusters, TextDedup}
import graft.sources.Tables
import graft.streaming.Replay.BoundedReplay

/** Training-data text operators over the `documents` table: exact and
  * near-duplicate detection (n-gram Jaccard, MinHash+LSH, SimHash),
  * token counting, quality scoring, language id, and fingerprinting —
  * each with a DuckDB oracle that reproduces the arithmetic exactly.
  */
object TextQueries {

  /** Shared DuckDB CTEs: distinct word-5-gram shingles per doc, hashed
    * (the index carries the 8-byte polynomial hash, mirroring
    * `TextDedup.shingleIndex`), then the document-frequency cap
    * mirroring `TextDedup.capShingleDf`. */
  private def shingleCte(maxDf: Int, src: String = "documents"): String =
    s"""sh1 AS (
      |  SELECT DISTINCT doc_id, array_to_string(tk[i:i+4], ' ') AS s
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM $src) t,
      |       UNNEST(range(1, len(tk) - 3)) AS u(i)
      |  WHERE len(tk) >= 5),
      |sh0 AS (SELECT doc_id, ${duckPolyHash("s")} AS h FROM sh1),
      |hot AS (SELECT h FROM sh0 GROUP BY h HAVING COUNT(*) > $maxDf),
      |sh AS (SELECT * FROM sh0 WHERE h NOT IN (SELECT h FROM hot))""".stripMargin

  private def duckPolyHash(e: String, base: Int = 31, p: Long = 1000000007L): String =
    QueryDef.duckPolyHash(e, base, p)

  /** q5X sketch size: 256 bottom hashes per corpus ≈ 6% relative
    * error on the union estimate. */
  private val KmvK = 256

  /** The q5M oracle: the full BPE merge trajectory unrolled as chained
    * DuckDB CTEs — see the q5M entry comment for the encoding and the
    * MATERIALIZED rationale. Generated, because each merge round is
    * the same three CTEs (pair counts → argmax → re-segmentation)
    * parameterized only by round number.
    *
    * Sentinel encoding is BRACKETED — every symbol is stored as
    * `chr(1) || sym || chr(2)` — so the per-round `replace` is
    * boundary-exact: the search pattern ends in chr(2), hence `r`
    * can never match a strict prefix of a longer symbol (symbols
    * [a, bc] with merge (a, b) stay unmerged), and because each
    * symbol carries its OWN closing sentinel, adjacent occurrences
    * share no delimiter and left-to-right non-overlapping `replace`
    * reproduces greedy merge semantics exactly ([a,b,a,b] + (a,b) →
    * [ab, ab]). Assumes corpus words contain neither U+0001 nor
    * U+0002 (true of the fixtures; the Spark side uses real arrays,
    * so a violation would surface as a loud hash mismatch, never a
    * silent agreement). */
  private def bpeChainCtes(numMerges: Int,
                           trainPred: String = "",
                           byteLevel: Boolean = false,
                           textExpr: String = "text"): Seq[String] = {
    val seg0 =
      if (!byteLevel)
        Seq(s"""seg0 AS MATERIALIZED (
          |  SELECT word, $symEncode AS s, n
          |  FROM wc)""".stripMargin)
      else Seq(
        // byte-level seg0: per char the code point, per code point its
        // UTF-8 bytes (pure arithmetic), per byte its GPT-2-alphabet
        // character — then reassembled in (char, byte) order into the
        // same bracketed sentinel string the merge rounds consume.
        """cps AS MATERIALIZED (
          |  SELECT word, i, unicode(cs[i]) AS cp
          |  FROM (SELECT word, string_split_regex(word, '') AS cs FROM wc) t,
          |       UNNEST(range(1, len(cs) + 1)) AS u(i))""".stripMargin,
        """bts AS MATERIALIZED (
          |  SELECT word, i, j, bs[j] AS b
          |  FROM (SELECT word, i,
          |          CASE WHEN cp < 128 THEN [cp]
          |               WHEN cp < 2048 THEN [192 + cp // 64, 128 + cp % 64]
          |               WHEN cp < 65536 THEN [224 + cp // 4096, 128 + (cp // 64) % 64, 128 + cp % 64]
          |               ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64, 128 + (cp // 64) % 64, 128 + cp % 64]
          |          END AS bs
          |        FROM cps) t, UNNEST(range(1, len(bs) + 1)) AS v(j))""".stripMargin,
        s"""seg0 AS MATERIALIZED (
          |  SELECT w.word,
          |         chr(1) || string_agg($gpt2Sym, chr(2) || chr(1) ORDER BY m.i, m.j) || chr(2) AS s,
          |         w.n AS n
          |  FROM bts m JOIN wc w USING (word)
          |  GROUP BY w.word, w.n)""".stripMargin)
    val base = Seq(
      s"""toks AS MATERIALIZED (
        |  SELECT string_split_regex(trim($textExpr), '\\s+') AS tk
        |  FROM documents WHERE trim($textExpr) <> ''$trainPred)""".stripMargin,
      """wc AS MATERIALIZED (
        |  SELECT tok AS word, COUNT(*) AS n
        |  FROM toks, UNNEST(tk) AS u(tok) GROUP BY 1)""".stripMargin) ++ seg0
    val rounds = (1 to numMerges).flatMap { k =>
      Seq(
        s"""p$k AS MATERIALIZED (
           |  SELECT sym[i] AS l, sym[i + 1] AS r, CAST(SUM(n) AS BIGINT) AS cnt
           |  FROM (SELECT $symDecode AS sym, n FROM seg${k - 1}) t,
           |       UNNEST(range(1, len(sym))) AS u(i)
           |  GROUP BY 1, 2)""".stripMargin,
        s"m$k AS MATERIALIZED (SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1)",
        s"""seg$k AS MATERIALIZED (
           |  SELECT word, $symMergeReplace AS s, n
           |  FROM seg${k - 1}, m$k m)""".stripMargin)
    }
    base ++ rounds
  }

  /** GPT-2 byte→unicode alphabet as SQL arithmetic over byte `m.b`:
    * printable latin-1 bytes (33–126, 161–172, 174–255) keep their
    * own code point; the k-th excluded byte (k 0-based, by byte
    * order) maps to chr(256 + k), where k = (bytes ≤ b) − (printable
    * bytes ≤ b) − 1. Mirrors `Bpe.byteToUnicode` exactly. */
  private val gpt2Sym =
    """CASE WHEN (m.b BETWEEN 33 AND 126) OR (m.b BETWEEN 161 AND 172)
      |            OR (m.b BETWEEN 174 AND 255) THEN chr(CAST(m.b AS INTEGER))
      |       ELSE chr(CAST(255 + (m.b + 1) - (GREATEST(0, LEAST(m.b, 126) - 32)
      |            + GREATEST(0, LEAST(m.b, 172) - 160)
      |            + GREATEST(0, LEAST(m.b, 255) - 173)) AS INTEGER)) END""".stripMargin

  /** The q5U oracle: the byte-level merge trajectory (GPT-2 alphabet)
    * over the accent-injected corpus — `replace(text, 'a', chr(228))`
    * plants the 2-byte UTF-8 char 'ä' so byte-level genuinely
    * diverges from char-level (its two bytes start as separate
    * symbols and must be merged back by frequency). */
  private def bpeByteOracleSql(numMerges: Int): String = {
    val unions = (1 to numMerges).map { k =>
      s"""SELECT CAST($k AS INTEGER) AS step, l AS "left", r AS "right",
         |       cnt AS pair_count FROM m$k""".stripMargin
    }.mkString("\nUNION ALL\n")
    "WITH " + bpeChainCtes(numMerges, byteLevel = true,
      textExpr = "replace(text, 'a', chr(228))").mkString(",\n") +
      "\n" + unions + "\nORDER BY step"
  }

  /** `^sym1$^sym2$...` where ^=chr(1), $=chr(2): symbol list → the
    * bracketed sentinel string (see [[bpeChainCtes]]). */
  private val symEncode =
    "chr(1) || array_to_string(string_split_regex(word, ''), chr(2) || chr(1)) || chr(2)"

  /** Bracketed sentinel string `s` → symbol list. */
  private val symDecode = "string_split(s[2:-2], chr(2) || chr(1))"

  /** One boundary-exact greedy merge of (m.l, m.r) over `s`. */
  private val symMergeReplace =
    """replace(s, chr(1) || m.l || chr(2) || chr(1) || m.r || chr(2),
      |                 chr(1) || m.l || m.r || chr(2))""".stripMargin

  private def bpeOracleSql(numMerges: Int): String = {
    val unions = (1 to numMerges).map { k =>
      s"""SELECT CAST($k AS INTEGER) AS step, l AS "left", r AS "right",
         |       cnt AS pair_count FROM m$k""".stripMargin
    }.mkString("\nUNION ALL\n")
    "WITH " + bpeChainCtes(numMerges).mkString(",\n") + "\n" + unions + "\nORDER BY step"
  }

  /** The q5S oracle: tokenize `documents` under the learned
    * segmentation (the same CTE chain as q5M, which carries each word
    * through every re-segmentation round) — one output row per subword
    * with [[graft.operators.Bpe.encode]]'s `pos = wpos * 1e6 + spos`
    * packing. Every corpus word is in the vocab by construction, so
    * the Spark side's char-fallback OOV branch stays cold here (it is
    * spec-pinned in CorpusStatsSpec instead). */
  private def bpeEncodeOracleSql(numMerges: Int): String =
    "WITH " + (bpeChainCtes(numMerges) ++ Seq(
      """docw AS MATERIALIZED (
        |  SELECT doc_id, tk[i] AS word, CAST(i - 1 AS BIGINT) AS wpos
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |        FROM documents WHERE trim(text) <> '') t,
        |       UNNEST(range(1, len(tk) + 1)) AS u(i))""".stripMargin,
      s"""segf AS MATERIALIZED (
         |  SELECT word, $symDecode AS sym FROM seg$numMerges)""".stripMargin
    )).mkString(",\n") +
      """
        |SELECT d.doc_id, sg.sym[j] AS token,
        |       CAST(d.wpos * 1000000 + (j - 1) AS BIGINT) AS pos
        |FROM docw d, segf sg, UNNEST(range(1, len(sg.sym) + 1)) AS v(j)
        |WHERE d.word = sg.word
        |ORDER BY doc_id, pos""".stripMargin

  /** The q5T oracle: learn the merge chain on HALF the corpus
    * (doc_id % 2 = 0), then tokenize ALL documents by replaying the
    * frozen merges in rank order over every distinct word — odd docs
    * contain words the trainer never saw, so the replay (not a
    * training-segmentation lookup) is what's being gated. The replay
    * chain (e0..eN) is the same chained-replace fold as the training
    * chain, applied to the full-corpus word set. */
  private def bpeFrozenOracleSql(numMerges: Int): String = {
    val replay = (1 to numMerges).map { k =>
      s"""e$k AS MATERIALIZED (
         |  SELECT word, $symMergeReplace AS s
         |  FROM e${k - 1}, m$k m)""".stripMargin
    }
    "WITH " + (bpeChainCtes(numMerges, " AND doc_id % 2 = 0") ++ Seq(
      """docw AS MATERIALIZED (
        |  SELECT doc_id, tk[i] AS word, CAST(i - 1 AS BIGINT) AS wpos
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |        FROM documents WHERE trim(text) <> '') t,
        |       UNNEST(range(1, len(tk) + 1)) AS u(i))""".stripMargin,
      s"""e0 AS MATERIALIZED (
        |  SELECT word, $symEncode AS s
        |  FROM (SELECT DISTINCT word FROM docw))""".stripMargin
    ) ++ replay ++ Seq(
      s"""segf AS MATERIALIZED (
         |  SELECT word, $symDecode AS sym FROM e$numMerges)""".stripMargin
    )).mkString(",\n") +
      """
        |SELECT d.doc_id, sg.sym[j] AS token,
        |       CAST(d.wpos * 1000000 + (j - 1) AS BIGINT) AS pos
        |FROM docw d, segf sg, UNNEST(range(1, len(sg.sym) + 1)) AS v(j)
        |WHERE d.word = sg.word
        |ORDER BY doc_id, pos""".stripMargin
  }

  val all: Map[String, QueryDef] = Map(

    // Exact dedup (content-fingerprint groupBy); duplicates synthesized
    // by self-union. The oracle groups by the same fingerprint.
    "q20_exact_dedup" -> QueryDef(
      (s, dir) => {
        val d = Tables.computeTable(s, dir, "documents").select("doc_id", "text")
        val dup = d.withColumn("doc_id", col("doc_id") + 1000000)
        TextDedup.exactDedup(d.unionAll(dup), "doc_id", "text")
          .orderBy("keeper_id")
      },
      s"""WITH u AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |SELECT min(doc_id) AS keeper_id, COUNT(*) AS n_dups,
        |       CAST(length(text) AS INTEGER) AS len
        |FROM u
        |GROUP BY CAST(length(text) AS INTEGER), ${duckPolyHash("text")},
        |         ${duckPolyHash("text", 37, 999999937L)}
        |ORDER BY keeper_id""".stripMargin),

    // Token counting: whitespace + BPE-ish regex.
    "q21_token_count" -> QueryDef(
      (s, dir) => Tables.computeTable(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.wordCount(col("text")).as("ws_tokens"),
          TextFunctions.bpeTokenCount(col("text")).as("bpe_tokens"),
          length(col("text")).as("n_chars_calc"))
        .orderBy("doc_id"),
      """SELECT doc_id,
        |       CAST(CASE WHEN trim(text) = '' THEN 0
        |            ELSE len(string_split_regex(trim(text), '\s+')) END AS INTEGER) AS ws_tokens,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INTEGER) AS bpe_tokens,
        |       CAST(length(text) AS INTEGER) AS n_chars_calc
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Quality scoring: ratios + fixed linear combination.
    "q22_text_quality" -> QueryDef(
      (s, dir) => Tables.computeTable(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.wordCount(col("text")).as("n_words"),
          TextFunctions.alphaRatio(col("text")).as("alpha_ratio"),
          TextFunctions.punctRatio(col("text")).as("punct_ratio"),
          TextFunctions.stopwordRatio(col("text")).as("stop_ratio"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id"),
      """WITH f AS (
        |  SELECT doc_id,
        |         CAST(CASE WHEN trim(text) = '' THEN 0
        |              ELSE len(string_split_regex(trim(text), '\s+')) END AS INTEGER) AS n_words,
        |         CASE WHEN length(text) = 0 THEN 0.0
        |              ELSE CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
        |                   / CAST(length(text) AS DOUBLE) END AS alpha_ratio,
        |         CASE WHEN length(text) = 0 THEN 0.0
        |              ELSE CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE)
        |                   / CAST(length(text) AS DOUBLE) END AS punct_ratio,
        |         CASE WHEN trim(text) = '' THEN 0.0
        |              ELSE CAST(len(regexp_extract_all(lower(text),
        |                     '\b(the|and|of|to|is|in|that|for|with|on)\b')) AS DOUBLE)
        |                   / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) END AS stop_ratio
        |  FROM documents)
        |SELECT doc_id, n_words, alpha_ratio, punct_ratio, stop_ratio,
        |       alpha_ratio * 0.5 + stop_ratio * 0.3 + punct_ratio * 0.2 AS quality
        |FROM f ORDER BY doc_id""".stripMargin),

    // Language id: stopword-count argmax with fixed tie order.
    "q23_langid" -> QueryDef(
      (s, dir) => {
        val scores = TextFunctions.LangStopwords.map { case (lang, pat) =>
          lang -> TextFunctions.langScore(col("text"), pat)
        }
        Tables.computeTable(s, dir, "documents")
          .select(Seq(col("doc_id")) ++
            scores.map { case (l, e) => e.as(s"score_$l") } :+
            TextFunctions.langId(col("text")).as("lang_pred"): _*)
          .orderBy("doc_id")
      }, {
        val counts = TextFunctions.LangStopwords.map { case (lang, pat) =>
          s"CAST(len(regexp_extract_all(lower(text), '$pat')) AS INTEGER) AS score_$lang"
        }.mkString(",\n         ")
        val langs = TextFunctions.LangStopwords.map(_._1)
        val best = s"greatest(${langs.map("score_" + _).mkString(", ")})"
        val caseChain = langs.map(l => s"WHEN score_$l = $best AND score_$l > 0 THEN '$l'")
          .mkString(" ")
        s"""WITH f AS (
           |  SELECT doc_id,
           |         $counts
           |  FROM documents)
           |SELECT doc_id, ${langs.map("score_" + _).mkString(", ")},
           |       CASE $caseChain ELSE 'und' END AS lang_pred
           |FROM f ORDER BY doc_id""".stripMargin
      }),

    // Document fingerprint: polynomial rolling hash over characters.
    "q24_fingerprint" -> QueryDef(
      (s, dir) => Tables.computeTable(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.polyHash(col("text")).as("fingerprint"))
        .orderBy("doc_id"),
      s"""SELECT doc_id, ${duckPolyHash("text")} AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin),

    // n-gram Jaccard near-dup via inverted shingle index, df-capped.
    "q25_ngram_jaccard" -> QueryDef(
      (s, dir) => TextDedup.ngramJaccardPairs(
          Tables.computeTable(s, dir, "documents"), "doc_id", "text", k = 5,
          threshold = 0.8, maxDf = 20)
        .orderBy("doc_a", "doc_b"),
      s"""WITH ${shingleCte(20)},
         |counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
         |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, shared, ca.n AS n_a, cb.n AS n_b,
         |       CAST(shared AS DOUBLE) / (ca.n + cb.n - shared) AS jaccard
         |FROM pairs
         |JOIN counts ca ON doc_a = ca.doc_id
         |JOIN counts cb ON doc_b = cb.doc_id
         |WHERE CAST(shared AS DOUBLE) / (ca.n + cb.n - shared) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin),

    // EXACT-threshold Jaccard join over 5-gram shingle sets via prefix
    // filtering (AllPairs/PPJoin): every qualifying pair, no df caps,
    // no misses — the exact complement to q25/q26's capped/approximate
    // paths, at the same shingle granularity as q25. The oracle is the
    // UNCAPPED brute force; the Spark side must find exactly those
    // pairs through the rarest-prefix inverted index.
    "q5W_jaccard_prefix_join" -> QueryDef(
      (s, dir) => TextDedup.shingleJaccardPrefixJoin(
          Tables.computeTable(s, dir, "documents"), "doc_id", "text",
          k = 5, threshold = 0.8)
        .orderBy("doc_a", "doc_b"),
      s"""WITH sh1 AS (
        |  SELECT doc_id, array_to_string(tk[i:i+4], ' ') AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
        |        FROM documents) t,
        |       UNNEST(range(1, len(tk) - 3)) AS u(i)
        |  WHERE len(tk) >= 5),
        |sh AS (SELECT DISTINCT doc_id, ${duckPolyHash("s")} AS h FROM sh1),
        |counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
        |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, CAST(shared AS INT) AS shared,
        |       CAST(ca.n AS INT) AS n_a, CAST(cb.n AS INT) AS n_b,
        |       CAST(shared AS DOUBLE) / (ca.n + cb.n - shared) AS jaccard
        |FROM pairs
        |JOIN counts ca ON doc_a = ca.doc_id
        |JOIN counts cb ON doc_b = cb.doc_id
        |WHERE CAST(shared AS DOUBLE) / (ca.n + cb.n - shared) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin),

    // KMV sketch SET ALGEBRA (operators/SketchOps): union /
    // intersection / Jaccard estimates between two corpora's shingle
    // sets from bottom-k hash sketches (k = KmvK, ~1/√k relative
    // error on the union) — each corpus scanned once,
    // the overlap then arithmetic on 2k longs (the "contamination
    // matrix across N sources" shape: N scans, not N² joins; the
    // exact counterpart q3D pays a full shuffle-join per pair). The
    // exact overlap rides along as displayed ground truth, and every
    // estimate is a single IEEE op on exact integers, so the whole
    // row hash-gates bit-for-bit.
    "q5X_kmv_overlap" -> QueryDef(
      (s, dir) => {
        val docs = Tables.computeTable(s, dir, "documents")
        val m = TextDedup.shingleIndex(docs, "doc_id", "text", k = 5)
          .select((col("doc_id") % 2).as("corpus"),
            graft.operators.SketchOps.mixHash(col("sh_hash")).as("h"))
          .distinct()
        val est = graft.operators.SketchOps.kmvOverlap(m, "corpus", "h", k = KmvK)
        // exact ground truth from the same distinct (corpus, h) rows:
        // each h appears in 1 or 2 corpora, so rows - distinct = |A∩B|
        val ex = m.agg(
          count(when(col("corpus") === 0, 1)).as("n_a_exact"),
          count(when(col("corpus") === 1, 1)).as("n_b_exact"),
          countDistinct(col("h")).as("n_union_exact"),
          (count(lit(1)) - countDistinct(col("h"))).as("n_inter_exact"))
        est.crossJoin(ex).select(
          col("k"), col("kth"), col("common"),
          col("union_est"), col("jaccard_est"), col("inter_est"),
          col("n_a_exact"), col("n_b_exact"),
          col("n_union_exact"), col("n_inter_exact"),
          (col("n_inter_exact").cast("double")
            / col("n_union_exact").cast("double")).as("jaccard_exact"))
      },
      s"""WITH sh1 AS (
        |  SELECT doc_id, array_to_string(tk[i:i+4], ' ') AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
        |        FROM documents) t,
        |       UNNEST(range(1, len(tk) - 3)) AS u(i)
        |  WHERE len(tk) >= 5),
        |m AS (
        |  SELECT DISTINCT doc_id % 2 AS corpus,
        |         ((${duckPolyHash("s")} * 48271 + 11) % 1000000007
        |           * 48271 + 11) % 1000000007 AS h
        |  FROM sh1),
        |mk AS (
        |  SELECT corpus, h FROM (
        |    SELECT corpus, h,
        |           row_number() OVER (PARTITION BY corpus ORDER BY h) AS rn
        |    FROM m) WHERE rn <= $KmvK),
        |u AS (SELECT h FROM (SELECT DISTINCT h FROM mk) ORDER BY h LIMIT $KmvK),
        |uk AS (SELECT COUNT(*) AS usz, MAX(h) AS kth FROM u),
        |cm AS (
        |  SELECT COUNT(*) AS common
        |  FROM (SELECT h FROM mk WHERE corpus = 0) a
        |  JOIN (SELECT h FROM mk WHERE corpus = 1) b USING (h)
        |  CROSS JOIN uk WHERE a.h <= uk.kth),
        |ex AS (
        |  SELECT COUNT(*) FILTER (corpus = 0) AS n_a_exact,
        |         COUNT(*) FILTER (corpus = 1) AS n_b_exact,
        |         COUNT(DISTINCT h) AS n_union_exact,
        |         COUNT(*) - COUNT(DISTINCT h) AS n_inter_exact
        |  FROM m)
        |SELECT CAST($KmvK AS INT) AS k, uk.kth,
        |       CAST(cm.common AS INT) AS common,
        |       CASE WHEN uk.usz >= $KmvK
        |            THEN CAST(${KmvK - 1} AS DOUBLE) * 1000000007 / CAST(uk.kth AS DOUBLE)
        |            ELSE CAST(uk.usz AS DOUBLE) END AS union_est,
        |       CASE WHEN uk.usz >= $KmvK
        |            THEN CAST(cm.common AS DOUBLE) / $KmvK.0
        |            ELSE CAST(cm.common AS DOUBLE) / CAST(uk.usz AS DOUBLE)
        |            END AS jaccard_est,
        |       (CASE WHEN uk.usz >= $KmvK
        |             THEN CAST(cm.common AS DOUBLE) / $KmvK.0
        |             ELSE CAST(cm.common AS DOUBLE) / CAST(uk.usz AS DOUBLE) END)
        |       * (CASE WHEN uk.usz >= $KmvK
        |               THEN CAST(${KmvK - 1} AS DOUBLE) * 1000000007 / CAST(uk.kth AS DOUBLE)
        |               ELSE CAST(uk.usz AS DOUBLE) END) AS inter_est,
        |       ex.n_a_exact, ex.n_b_exact, ex.n_union_exact, ex.n_inter_exact,
        |       CAST(ex.n_inter_exact AS DOUBLE)
        |         / CAST(ex.n_union_exact AS DOUBLE) AS jaccard_exact
        |FROM uk CROSS JOIN cm CROSS JOIN ex""".stripMargin),

    // MinHash + LSH banding, df- and bucket-capped, exact-verified.
    "q26_minhash_lsh" -> QueryDef(
      (s, dir) => TextDedup.minhashLshPairs(
          Tables.computeTable(s, dir, "documents"), "doc_id", "text",
          k = 5, numHashes = 32, rowsPerBand = 4, threshold = 0.8,
          maxDf = 20, maxBucket = 20)
        .orderBy("doc_a", "doc_b"),
      s"""WITH ${shingleCte(20)},
         |mh AS (
         |  SELECT doc_id, j, min(((2 * j + 1) * h + j * j + 7) % 1000000007) AS mh
         |  FROM sh0, UNNEST(range(0, 32)) AS u(j)
         |  GROUP BY doc_id, j),
         |bands0 AS (
         |  SELECT doc_id, CAST(j // 4 AS INTEGER) AS band,
         |         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j) AS sig
         |  FROM mh GROUP BY doc_id, j // 4),
         |hotb AS (SELECT band, sig FROM bands0 GROUP BY band, sig HAVING COUNT(*) > 20),
         |bands AS (SELECT * FROM bands0 b WHERE NOT EXISTS (
         |  SELECT 1 FROM hotb h WHERE h.band = b.band AND h.sig = b.sig)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
         |counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |shared AS (
         |  SELECT c.doc_a, c.doc_b, COUNT(*) AS sh_n
         |  FROM cand c
         |  JOIN sh s1 ON s1.doc_id = c.doc_a
         |  JOIN sh s2 ON s2.doc_id = c.doc_b AND s2.h = s1.h
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |       CAST(sh_n AS DOUBLE) / (ca.n + cb.n - sh_n) AS jaccard
         |FROM shared
         |JOIN counts ca ON doc_a = ca.doc_id
         |JOIN counts cb ON doc_b = cb.doc_id
         |WHERE CAST(sh_n AS DOUBLE) / (ca.n + cb.n - sh_n) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin),

    // Dup-cluster resolution: near-dup pairs -> connected components ->
    // (doc_id, cluster_keeper). Oracle = recursive transitive closure.
    "q38_dup_clusters" -> QueryDef(
      (s, dir) => {
        val pairs = TextDedup.ngramJaccardPairs(
          Tables.computeTable(s, dir, "documents"), "doc_id", "text",
          k = 5, threshold = 0.8, maxDf = 20)
        DedupClusters.resolve(pairs).orderBy("doc_id")
      },
      s"""WITH RECURSIVE ${shingleCte(20)},
         |counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
         |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |good AS (
         |  SELECT doc_a, doc_b FROM pairs
         |  JOIN counts ca ON doc_a = ca.doc_id
         |  JOIN counts cb ON doc_b = cb.doc_id
         |  WHERE CAST(shared AS DOUBLE) / (ca.n + cb.n - shared) >= 0.8),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM good
         |  UNION ALL SELECT doc_b, doc_a FROM good),
         |reach(node, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.node)
         |SELECT node AS doc_id, min(r) AS cluster_keeper
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin),

    // Benchmark decontamination: corpus docs sharing any 13-gram with
    // the benchmark subset (the subset itself plus its near-dups).
    "q3D_decontamination" -> QueryDef(
      (s, dir) => {
        val corpus = Tables.computeTable(s, dir, "documents")
        val benchmark = corpus.filter(col("doc_id") % 17 === 5)
        TextDedup.contaminatedDocs(corpus, benchmark, "doc_id", "text", k = 13)
          .orderBy("doc_id")
      },
      s"""WITH s13 AS (
         |  SELECT DISTINCT doc_id, array_to_string(tk[i:i+12], ' ') AS s
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
         |        FROM documents) t,
         |       UNNEST(range(1, len(tk) - 11)) AS u(i)
         |  WHERE len(tk) >= 13),
         |sh13 AS (SELECT doc_id, ${duckPolyHash("s")} AS h FROM s13),
         |bs AS (SELECT DISTINCT h FROM sh13 WHERE doc_id % 17 = 5)
         |SELECT DISTINCT doc_id FROM sh13 JOIN bs USING (h)
         |ORDER BY doc_id""".stripMargin),

    // Deterministic stratified corpus mixing: per-language keep rates
    // decided by a salted row hash — reproducible in any engine and
    // stable under partitioning (unlike RNG-based df.sample).
    "q3C_corpus_mix" -> QueryDef(
      (s, dir) => {
        val d = Tables.computeTable(s, dir, "documents")
        graft.operators.Sampling.stratifiedHashSample(d, "doc_id", "lang",
            rates = Seq("en" -> 3, "de" -> 2), defaultNum = 1, den = 4, salt = "mix1")
          .groupBy("lang").agg(count(lit(1)).as("kept"),
            min("doc_id").as("first_id"), max("doc_id").as("last_id"))
          .orderBy("lang")
      },
      s"""WITH h AS (
         |  SELECT doc_id, lang,
         |         (((${duckPolyHash("(CAST(doc_id AS VARCHAR) || ':mix1')")}
         |            * 48271 + 11) % 1000000007) * 48271 + 11) % 1000000007 AS hh
         |  FROM documents)
         |SELECT lang, COUNT(*) AS kept, min(doc_id) AS first_id, max(doc_id) AS last_id
         |FROM h
         |WHERE hh % 4 < CASE lang WHEN 'en' THEN 3 WHEN 'de' THEN 2 ELSE 1 END
         |GROUP BY lang ORDER BY lang""".stripMargin),

    // PII redaction: URL/email/phone scrubbing with stable tokens.
    // Synthetic PII is appended per doc (the fixture has none), so the
    // redaction provably fires on every row.
    "q3B_pii_redaction" -> QueryDef(
      (s, dir) => {
        val withPii = Tables.computeTable(s, dir, "documents")
          .select(col("doc_id"), concat(col("text"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" contact user"), col("doc_id"), lit("@example.com now")))
              .when(col("doc_id") % 3 === 1,
                concat(lit(" see https://ex.example/p?id="), col("doc_id"), lit(" today")))
              .otherwise(concat(lit(" call +1 (555) 010-"),
                (col("doc_id") % 10000).cast("string"), lit(" soon")))).as("text"))
        withPii.select(col("doc_id"),
            TextFunctions.redactPii(col("text")).as("clean"),
            (length(col("text")) - length(TextFunctions.redactPii(col("text"))))
              .as("removed_chars"))
          .orderBy("doc_id")
      },
      s"""WITH withpii AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 3 = 0
         |           THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
         |         WHEN doc_id % 3 = 1
         |           THEN ' see https://ex.example/p?id=' || CAST(doc_id AS VARCHAR) || ' today'
         |         ELSE ' call +1 (555) 010-' || CAST(doc_id % 10000 AS VARCHAR) || ' soon'
         |    END AS text
         |  FROM documents),
         |red AS (
         |  SELECT doc_id, text,
         |         regexp_replace(regexp_replace(regexp_replace(text,
         |           'https?://[^\\s]+', '<URL>', 'g'),
         |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |           '\\+?[0-9][0-9()\\- ]{7,}[0-9]', '<PHONE>', 'g') AS clean
         |  FROM withpii)
         |SELECT doc_id, clean,
         |       CAST(length(text) - length(clean) AS INTEGER) AS removed_chars
         |FROM red ORDER BY doc_id""".stripMargin),

    // Corpus curation end-to-end: language gate -> quality/token gates
    // -> near-dup cluster resolution -> keeper-only corpus. The
    // composite proves the LLM-pipeline operators chain in one lazy
    // plan: the scalar gates stay in the scan stage, dedup runs on the
    // (smaller) gated corpus, and only cluster losers are anti-joined
    // away.
    "q39_corpus_curation" -> QueryDef(
      (s, dir) => {
        val scored = Tables.computeTable(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            TextFunctions.wordCount(col("text")).as("n_words"),
            TextFunctions.langId(col("text")).as("lang_pred"),
            TextFunctions.qualityScore(col("text")).as("quality"))
        val gated = scored.filter(col("lang_pred") === "en" &&
          col("quality") >= 0.41 && col("n_words") >= 20)
        val pairs = TextDedup.ngramJaccardPairs(
          gated.select("doc_id", "text"), "doc_id", "text",
          k = 5, threshold = 0.8, maxDf = 20)
        val losers = DedupClusters.resolve(pairs)
          .filter(col("doc_id") =!= col("cluster_keeper")).select("doc_id")
        gated.join(losers, Seq("doc_id"), "left_anti")
          .select("doc_id", "lang_pred", "n_words", "quality")
          .orderBy("doc_id")
      }, {
        val counts = TextFunctions.LangStopwords.map { case (lang, pat) =>
          s"CAST(len(regexp_extract_all(lower(text), '$pat')) AS INTEGER) AS score_$lang"
        }.mkString(",\n         ")
        val langs = TextFunctions.LangStopwords.map(_._1)
        val best = s"greatest(${langs.map("score_" + _).mkString(", ")})"
        val caseChain = langs.map(l => s"WHEN score_$l = $best AND score_$l > 0 THEN '$l'")
          .mkString(" ")
        s"""WITH RECURSIVE feat AS (
           |  SELECT doc_id, text,
           |         CAST(CASE WHEN trim(text) = '' THEN 0
           |              ELSE len(string_split_regex(trim(text), '\\s+')) END AS INTEGER) AS n_words,
           |         CASE WHEN length(text) = 0 THEN 0.0
           |              ELSE CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
           |                   / CAST(length(text) AS DOUBLE) END AS ar,
           |         CASE WHEN length(text) = 0 THEN 0.0
           |              ELSE CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE)
           |                   / CAST(length(text) AS DOUBLE) END AS pr,
           |         CASE WHEN trim(text) = '' THEN 0.0
           |              ELSE CAST(len(regexp_extract_all(lower(text),
           |                     '${TextFunctions.LangStopwords.head._2}')) AS DOUBLE)
           |                   / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) END AS sr,
           |         $counts
           |  FROM documents),
           |scored AS (
           |  SELECT doc_id, text, n_words,
           |         CASE $caseChain ELSE 'und' END AS lang_pred,
           |         ar * 0.5 + sr * 0.3 + pr * 0.2 AS quality
           |  FROM feat),
           |gated AS (
           |  SELECT doc_id, text, n_words, lang_pred, quality FROM scored
           |  WHERE lang_pred = 'en' AND quality >= 0.41 AND n_words >= 20),
           |${shingleCte(20, src = "gated")},
           |counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
           |pairs AS (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
           |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |good AS (
           |  SELECT doc_a, doc_b FROM pairs
           |  JOIN counts ca ON doc_a = ca.doc_id
           |  JOIN counts cb ON doc_b = cb.doc_id
           |  WHERE CAST(shared AS DOUBLE) / (ca.n + cb.n - shared) >= 0.8),
           |edges AS (
           |  SELECT doc_a AS src, doc_b AS dst FROM good
           |  UNION ALL SELECT doc_b, doc_a FROM good),
           |reach(node, r) AS (
           |  SELECT src, src FROM edges
           |  UNION
           |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.node),
           |losers AS (
           |  SELECT node AS doc_id FROM reach GROUP BY node HAVING node <> min(r))
           |SELECT doc_id, lang_pred, n_words, quality
           |FROM gated WHERE doc_id NOT IN (SELECT doc_id FROM losers)
           |ORDER BY doc_id""".stripMargin
      }),

    // SimHash near-dup: banded Hamming blocking.
    "q27_simhash" -> QueryDef(
      (s, dir) => TextDedup.simhashPairs(
          Tables.computeTable(s, dir, "documents"), "doc_id", "text", maxHamming = 2)
        .orderBy("doc_a", "doc_b"),
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, tok
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
         |        FROM documents WHERE trim(text) <> '') t,
         |       UNNEST(tk) AS u(tok)),
         |hs AS (
         |  SELECT doc_id, ${duckPolyHash("tok")} AS h1,
         |         ${duckPolyHash("tok", 37, 999999937L)} AS h2
         |  FROM toks),
         |bits AS (
         |  SELECT doc_id, b,
         |         SUM(CASE WHEN (CASE WHEN b < 30 THEN (h1 >> CAST(b AS INTEGER))
         |                        ELSE (h2 >> CAST(b - 30 AS INTEGER)) END) % 2 = 1
         |                  THEN 1 ELSE -1 END) AS sgn
         |  FROM hs, UNNEST(range(0, 60)) AS u(b)
         |  GROUP BY 1, 2),
         |sig AS (
         |  SELECT doc_id,
         |         SUM(CASE WHEN sgn > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
         |             ELSE CAST(0 AS BIGINT) END) AS simhash
         |  FROM bits GROUP BY 1),
         |banded AS (
         |  SELECT doc_id, simhash, CAST(b AS INTEGER) AS band,
         |         (simhash >> CAST(b * 15 AS INTEGER)) % 32768 AS bandval
         |  FROM sig, UNNEST(range(0, 4)) AS u(b)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |         x.simhash AS sh_a, y.simhash AS sh_b
         |  FROM banded x JOIN banded y
         |    ON x.band = y.band AND x.bandval = y.bandval AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
         |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 2
         |ORDER BY doc_a, doc_b""".stripMargin),

    // Within-document repetition (Gopher-style): fraction of word
    // trigram occurrences duplicating an earlier one; the standard
    // boilerplate/spam drop rule. Pure map-side arithmetic.
    "q3J_repetition" -> QueryDef(
      (s, dir) => Tables.computeTable(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.dupShingleFraction(col("text"), 3).as("dup_frac"))
        .withColumn("keep", col("dup_frac") <= 0.2)
        .orderBy("doc_id"),
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |         CASE WHEN len(t) >= 3
        |              THEN list_transform(range(1, len(t) - 1),
        |                     __gi -> array_to_string(t[__gi:__gi+2], ' '))
        |              ELSE [] END AS grams
        |  FROM toks),
        |f AS (
        |  SELECT doc_id,
        |         CASE WHEN len(grams) = 0 THEN CAST(0.0 AS DOUBLE)
        |              ELSE CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
        |                   / len(grams) END AS dup_frac
        |  FROM g)
        |SELECT doc_id, dup_frac, dup_frac <= 0.2 AS keep
        |FROM f ORDER BY doc_id""".stripMargin),

    // Incremental exact dedup: a new batch (doc_id % 10 = 7) lands
    // against the existing corpus — keep batch rows whose content
    // fingerprint is unseen in the corpus AND first within the batch.
    "q3K_incremental_dedup" -> QueryDef(
      (s, dir) => {
        val docs = Tables.computeTable(s, dir, "documents")
        TextDedup.incrementalDedup(
            batch = docs.filter(col("doc_id") % 10 === 7),
            corpus = docs.filter(col("doc_id") % 10 =!= 7),
            idCol = "doc_id", textCol = "text")
          .orderBy("doc_id")
      },
      s"""WITH fp AS (
         |  SELECT doc_id, CAST(length(text) AS INTEGER) AS len,
         |         ${duckPolyHash("text")} AS h1,
         |         ${duckPolyHash("text", 37, 999999937L)} AS h2
         |  FROM documents),
         |newb AS (SELECT * FROM fp WHERE doc_id % 10 = 7),
         |corpus AS (SELECT len, h1, h2 FROM fp WHERE doc_id % 10 <> 7)
         |SELECT n.doc_id, n.len FROM newb n
         |WHERE NOT EXISTS (SELECT 1 FROM corpus c
         |        WHERE c.len = n.len AND c.h1 = n.h1 AND c.h2 = n.h2)
         |  AND NOT EXISTS (SELECT 1 FROM newb m
         |        WHERE m.len = n.len AND m.h1 = n.h1 AND m.h2 = n.h2
         |          AND m.doc_id < n.doc_id)
         |ORDER BY doc_id""".stripMargin),

    // Per-source (domain) cap: at most 10 docs per source, chosen by
    // deterministic hash order — the standard web-corpus gate against
    // mega-domain dominance. WindowGroupLimit bounds the shuffle.
    "q3P_source_cap" -> QueryDef(
      (s, dir) => graft.operators.Curation.perSourceCap(
          Tables.computeTable(s, dir, "documents"),
          srcCol = "source", keyCol = "doc_id", cap = 10, salt = "cap1")
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("id_sum"))
        .orderBy("source"),
      s"""WITH h AS (
         |  SELECT doc_id, source,
         |         ${QueryDef.duckSampleHash("doc_id", "cap1")} AS hh
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source,
         |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rn
         |  FROM h)
         |SELECT source, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS id_sum
         |FROM r WHERE rn <= 10 GROUP BY source ORDER BY source""".stripMargin),

    // Deterministic corpus shuffle -> training shards: shard = mixed
    // hash mod 8, position = hash order within the shard. The checksum
    // SUM(shard_pos * doc_id) pins the exact per-shard ordering.
    "q3Q_shard_assign" -> QueryDef(
      (s, dir) => graft.operators.Curation.shardAssign(
          Tables.computeTable(s, dir, "documents"),
          keyCol = "doc_id", numShards = 8, salt = "shuf1")
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("shard_pos").cast("long") * col("doc_id")).as("pos_id_sum"))
        .orderBy("shard"),
      s"""WITH h AS (
         |  SELECT doc_id, ${QueryDef.duckSampleHash("doc_id", "shuf1")} AS hh
         |  FROM documents),
         |sh AS (SELECT doc_id, hh, CAST(hh % 8 AS INTEGER) AS shard FROM h),
         |p AS (
         |  SELECT doc_id, shard,
         |         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hh, doc_id) - 1 AS shard_pos
         |  FROM sh)
         |SELECT shard, COUNT(*) AS n_docs,
         |       CAST(SUM(shard_pos * doc_id) AS BIGINT) AS pos_id_sum
         |FROM p GROUP BY shard ORDER BY shard""".stripMargin),

    // Per-document distinctive terms (tf-idf, rational idf): top-5
    // terms per doc. The rational N/df idf keeps every score inside
    // +,*,/ on integer-valued doubles — bit-exact in any engine.
    "q3V_tfidf" -> QueryDef(
      (s, dir) => graft.operators.TfIdf.topTerms(
          Tables.computeTable(s, dir, "documents"), "doc_id", "text", k = 5)
        .orderBy("doc_id", "rank"),
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0),
        |toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM docs),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY 1),
        |nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM docs),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_docs,
        |         CAST(tf.tf AS DOUBLE) * CAST(nd.n AS DOUBLE)
        |           / CAST(dfreq.df_docs AS DOUBLE) AS tfidf
        |  FROM tf JOIN dfreq USING (term), nd),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |            ORDER BY tfidf DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, term, tf, df_docs, tfidf, CAST(rank AS INTEGER) AS rank
        |FROM ranked WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin),

    // Graded benchmark contamination: per corpus doc, the fraction of
    // its distinct 13-grams appearing in any benchmark doc — the
    // thresholdable refinement of q3D's binary rule.
    "q3X_contamination_frac" -> QueryDef(
      (s, dir) => {
        val corpus = Tables.computeTable(s, dir, "documents")
        TextDedup.contaminationFraction(corpus,
            corpus.filter(col("doc_id") % 17 === 5), "doc_id", "text", k = 13)
          .orderBy("doc_id")
      },
      s"""WITH s13 AS (
         |  SELECT DISTINCT doc_id, array_to_string(tk[i:i+12], ' ') AS s
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
         |        FROM documents) t,
         |       UNNEST(range(1, len(tk) - 11)) AS u(i)
         |  WHERE len(tk) >= 13),
         |sh13 AS (SELECT doc_id, ${duckPolyHash("s")} AS h FROM s13),
         |bs AS (SELECT DISTINCT h FROM sh13 WHERE doc_id % 17 = 5)
         |SELECT doc_id, COUNT(*) AS n_grams,
         |       CAST(SUM(CASE WHEN bs.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_matched,
         |       CAST(SUM(CASE WHEN bs.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |         / CAST(COUNT(*) AS DOUBLE) AS contamination
         |FROM sh13 LEFT JOIN bs USING (h)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // C4-style chunk-level exact dedup: 16-word chunks kept at first
    // corpus-wide occurrence, documents reassembled from survivors.
    // Duplicates synthesized by self-union (as q20) so the drop rule
    // provably fires: every +1M copy must vanish entirely.
    "q3Y_chunk_dedup" -> QueryDef(
      (s, dir) => {
        val d = Tables.computeTable(s, dir, "documents").select("doc_id", "text")
        val dup = d.withColumn("doc_id", col("doc_id") + 1000000)
        TextDedup.chunkDedup(d.unionAll(dup), "doc_id", "text", chunkWords = 16)
          .orderBy("doc_id")
      },
      s"""WITH u AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
         |t AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
         |  FROM u WHERE length(trim(text)) > 0),
         |ch AS (
         |  SELECT doc_id, CAST(i AS INTEGER) AS cpos,
         |         array_to_string(tk[i * 16 + 1 : i * 16 + 16], ' ') AS chunk
         |  FROM t, UNNEST(range(0, (len(tk) + 15) // 16)) AS u2(i)),
         |fp AS (
         |  SELECT doc_id, cpos, chunk, length(chunk) AS cl,
         |         ${duckPolyHash("chunk")} AS h1,
         |         ${duckPolyHash("chunk", 37, 999999937L)} AS h2
         |  FROM ch),
         |keep AS (
         |  SELECT doc_id, cpos, chunk,
         |         row_number() OVER (PARTITION BY cl, h1, h2
         |                            ORDER BY doc_id, cpos) AS rn
         |  FROM fp)
         |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_chunks_kept,
         |       string_agg(chunk, ' ' ORDER BY cpos) AS text_dedup
         |FROM keep WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // Per-doc LM-fit score under the corpus's own bigram model: the
    // perplexity-filter curation signal with log replaced by an
    // integer-scaled mean continuation probability — truncating
    // integer arithmetic end-to-end, so the score is bit-exact in any
    // engine (two libms' ln may differ in ULPs; integer division
    // cannot).
    "q5A_lm_score" -> QueryDef(
      (s, dir) => graft.operators.NgramModel.lmFitScore(
          Tables.computeTable(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents WHERE length(trim(text)) > 0),
        |dp AS (
        |  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
        |  FROM t, UNNEST(range(1, len(tk))) AS a(i)
        |  WHERE len(tk) >= 2),
        |counts AS (SELECT w1, w2, COUNT(*) AS n_ab FROM dp GROUP BY 1, 2),
        |lft AS (SELECT w1, CAST(SUM(n_ab) AS BIGINT) AS n_w1
        |        FROM counts GROUP BY 1),
        |sc AS (
        |  SELECT d.doc_id, (c.n_ab * 1000000) // l.n_w1 AS sp
        |  FROM dp d JOIN counts c USING (w1, w2) JOIN lft l USING (w1))
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |       CAST(SUM(sp) // COUNT(*) AS BIGINT) AS lm_score
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // Incremental near-dup: a batch of re-keyed document copies
    // (doc_id % 7, +1M) checks against the existing corpus — batch
    // bands join corpus bands only, the corpus never self-joins (the
    // q3K incremental-ingest pattern at near-dup strength). Exact
    // copies verify at jaccard 1.0 and planted near-dups surface
    // across sides. The oracle replays the full pipeline over the
    // union with batch ids distinguished by the +1M offset.
    "q59_incremental_lsh" -> QueryDef(
      (s, dir) => {
        val d = Tables.computeTable(s, dir, "documents").select("doc_id", "text")
        val batch = d.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000)
        TextDedup.incrementalLshPairs(batch, d, "doc_id", "text",
            k = 5, numHashes = 32, rowsPerBand = 4, threshold = 0.8,
            maxDf = 20, maxBucket = 20)
          .orderBy("batch_id", "corpus_id")
      },
      s"""WITH u AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0),
         |${shingleCte(20, "u")},
         |mh AS (
         |  SELECT doc_id, j, min(((2 * j + 1) * h + j * j + 7) % 1000000007) AS mh
         |  FROM sh0, UNNEST(range(0, 32)) AS u2(j)
         |  GROUP BY doc_id, j),
         |bands0 AS (
         |  SELECT doc_id, CAST(j // 4 AS INTEGER) AS band,
         |         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j) AS sig
         |  FROM mh GROUP BY doc_id, j // 4),
         |hotb AS (SELECT band, sig FROM bands0 GROUP BY band, sig HAVING COUNT(*) > 20),
         |bands AS (SELECT * FROM bands0 b WHERE NOT EXISTS (
         |  SELECT 1 FROM hotb h WHERE h.band = b.band AND h.sig = b.sig)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS batch_id, y.doc_id AS corpus_id
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.sig = y.sig
         |   AND x.doc_id >= 1000000 AND y.doc_id < 1000000),
         |counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |shared AS (
         |  SELECT c.batch_id, c.corpus_id, COUNT(*) AS sh_n
         |  FROM cand c
         |  JOIN sh s1 ON s1.doc_id = c.batch_id
         |  JOIN sh s2 ON s2.doc_id = c.corpus_id AND s2.h = s1.h
         |  GROUP BY 1, 2)
         |SELECT batch_id, corpus_id,
         |       CAST(sh_n AS DOUBLE) / (ca.n + cb.n - sh_n) AS jaccard
         |FROM shared
         |JOIN counts ca ON batch_id = ca.doc_id
         |JOIN counts cb ON corpus_id = cb.doc_id
         |WHERE CAST(sh_n AS DOUBLE) / (ca.n + cb.n - sh_n) >= 0.8
         |ORDER BY batch_id, corpus_id""".stripMargin),

    // Span-level exact dedup (the Lee-et-al ExactSubstr shape): every
    // 15-token SLIDING window kept only at its first corpus-wide
    // occurrence; later occurrences scrub their covered tokens and
    // docs reassemble from survivors. Catches repeats at ANY alignment
    // (chunk dedup q3Y only catches aligned chunks) including
    // intra-doc runs. Duplicates synthesized by self-union: every +1M
    // copy long enough to have windows must scrub to (near) empty
    // while first occurrences stay whole unless they share a >= 15
    // token exact span with an earlier doc.
    "q57_span_dedup" -> QueryDef(
      (s, dir) => {
        val d = Tables.computeTable(s, dir, "documents").select("doc_id", "text")
        val dup = d.withColumn("doc_id", col("doc_id") + 1000000)
        TextDedup.spanScrub(d.unionAll(dup), "doc_id", "text", w = 15)
          .orderBy("doc_id")
      },
      s"""WITH u AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
         |base AS (
         |  SELECT doc_id,
         |         CAST(CASE WHEN trim(text) = '' THEN 0
         |              ELSE len(string_split_regex(trim(text), '\\s+'))
         |              END AS INTEGER) AS n_tokens
         |  FROM u),
         |t AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
         |  FROM u WHERE length(trim(text)) > 0),
         |pos AS (
         |  SELECT doc_id, CAST(i AS INTEGER) AS i, tk[i] AS tok
         |  FROM t, UNNEST(range(1, len(tk) + 1)) AS a(i)),
         |win AS (
         |  SELECT doc_id, CAST(s AS INTEGER) AS s,
         |         array_to_string(tk[s : s + 14], ' ') AS wtext
         |  FROM t, UNNEST(range(1, len(tk) - 13)) AS b(s)
         |  WHERE len(tk) >= 15),
         |fp AS (
         |  SELECT doc_id, s, length(wtext) AS wl,
         |         ${duckPolyHash("wtext")} AS h1,
         |         ${duckPolyHash("wtext", 37, 999999937L)} AS h2
         |  FROM win),
         |rem AS (
         |  SELECT doc_id, s FROM (
         |    SELECT doc_id, s, row_number() OVER (PARTITION BY wl, h1, h2
         |                                         ORDER BY doc_id, s) AS rn
         |    FROM fp) WHERE rn > 1),
         |kept AS (
         |  SELECT p.doc_id, p.i, p.tok FROM pos p
         |  WHERE NOT EXISTS (SELECT 1 FROM rem r
         |                    WHERE r.doc_id = p.doc_id
         |                      AND r.s BETWEEN p.i - 14 AND p.i)),
         |agg AS (
         |  SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS nk,
         |         string_agg(tok, ' ' ORDER BY i) AS ts
         |  FROM kept GROUP BY doc_id)
         |SELECT b.doc_id, b.n_tokens,
         |       b.n_tokens - COALESCE(a.nk, 0) AS n_removed,
         |       COALESCE(a.ts, '') AS text_scrubbed
         |FROM base b LEFT JOIN agg a USING (doc_id)
         |ORDER BY b.doc_id""".stripMargin),

    // Flagship documents-to-training-shards pipeline: chunk-level exact
    // dedup -> benchmark-contamination gate on the DEDUPED text ->
    // per-source cap -> deterministic shard assignment, all one lazy
    // plan (the LLM-data analogue of q40's flight flagship). The
    // per-shard checksum SUM(shard_pos * doc_id) pins the exact member
    // set AND ordering of every shard.
    "q41_shard_pipeline" -> QueryDef(
      (s, dir) => {
        val docs = Tables.computeTable(s, dir, "documents")
        val dedup = TextDedup.chunkDedup(docs, "doc_id", "text", chunkWords = 16)
        val contam = TextDedup.contaminationFraction(
            dedup.select(col("doc_id"), col("text_dedup").as("text")),
            docs.filter(col("doc_id") % 17 === 5), "doc_id", "text", k = 13)
          .select(col("doc_id"), col("contamination"))
        val gated = dedup.join(docs.select("doc_id", "source"), Seq("doc_id"))
          .join(contam, Seq("doc_id"), "left_outer")
          .filter(coalesce(col("contamination"), lit(0.0)) <= 0.1)
          .select("doc_id", "n_chunks_kept", "source")
        val capped = graft.operators.Curation.perSourceCap(
          gated, "source", "doc_id", cap = 20, salt = "pipe1")
        graft.operators.Curation.shardAssign(capped, "doc_id", numShards = 4,
            salt = "pipe1")
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chunks_kept").as("chunks_total"),
            sum(col("shard_pos").cast("long") * col("doc_id")).as("pos_id_sum"))
          .orderBy("shard")
      },
      s"""WITH t AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
         |  FROM documents WHERE length(trim(text)) > 0),
         |ch AS (
         |  SELECT doc_id, CAST(i AS INTEGER) AS cpos,
         |         array_to_string(tk[i * 16 + 1 : i * 16 + 16], ' ') AS chunk
         |  FROM t, UNNEST(range(0, (len(tk) + 15) // 16)) AS u2(i)),
         |fp AS (
         |  SELECT doc_id, cpos, chunk, length(chunk) AS cl,
         |         ${duckPolyHash("chunk")} AS h1,
         |         ${duckPolyHash("chunk", 37, 999999937L)} AS h2
         |  FROM ch),
         |keep AS (
         |  SELECT doc_id, cpos, chunk,
         |         row_number() OVER (PARTITION BY cl, h1, h2
         |                            ORDER BY doc_id, cpos) AS rn
         |  FROM fp),
         |dedup AS (
         |  SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_chunks_kept,
         |         string_agg(chunk, ' ' ORDER BY cpos) AS text_dedup
         |  FROM keep WHERE rn = 1 GROUP BY doc_id),
         |dg AS (
         |  SELECT DISTINCT doc_id, array_to_string(tk2[i:i+12], ' ') AS s
         |  FROM (SELECT doc_id, string_split_regex(trim(text_dedup), '\\s+') AS tk2
         |        FROM dedup) x,
         |       UNNEST(range(1, len(tk2) - 11)) AS u(i)
         |  WHERE len(tk2) >= 13),
         |dh AS (SELECT doc_id, ${duckPolyHash("s")} AS h FROM dg),
         |bg AS (
         |  SELECT DISTINCT doc_id, array_to_string(tk3[i:i+12], ' ') AS s
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk3
         |        FROM documents WHERE doc_id % 17 = 5) y,
         |       UNNEST(range(1, len(tk3) - 11)) AS u(i)
         |  WHERE len(tk3) >= 13),
         |bh AS (SELECT DISTINCT ${duckPolyHash("s")} AS h FROM bg),
         |contam AS (
         |  SELECT dh.doc_id,
         |         CAST(SUM(CASE WHEN bh.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |           / CAST(COUNT(*) AS DOUBLE) AS cfrac
         |  FROM dh LEFT JOIN bh USING (h) GROUP BY dh.doc_id),
         |gated AS (
         |  SELECT d.doc_id, d.n_chunks_kept, doc.source
         |  FROM dedup d JOIN documents doc USING (doc_id)
         |  LEFT JOIN contam c ON d.doc_id = c.doc_id
         |  WHERE COALESCE(c.cfrac, 0.0) <= 0.1),
         |hh AS (
         |  SELECT doc_id, n_chunks_kept, source,
         |         ${QueryDef.duckSampleHash("doc_id", "pipe1")} AS h
         |  FROM gated),
         |capped AS (
         |  SELECT * FROM (
         |    SELECT doc_id, n_chunks_kept, h,
         |           ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
         |    FROM hh) WHERE rn <= 20),
         |sh AS (
         |  SELECT doc_id, n_chunks_kept, CAST(h % 4 AS INTEGER) AS shard,
         |         ROW_NUMBER() OVER (PARTITION BY CAST(h % 4 AS INTEGER)
         |                            ORDER BY h, doc_id) - 1 AS shard_pos
         |  FROM capped)
         |SELECT shard, COUNT(*) AS n_docs,
         |       CAST(SUM(n_chunks_kept) AS BIGINT) AS chunks_total,
         |       CAST(SUM(shard_pos * doc_id) AS BIGINT) AS pos_id_sum
         |FROM sh GROUP BY shard ORDER BY shard""".stripMargin),

    // GPT-style sequence packing: per shard, documents concatenate in
    // deterministic hash order and the token stream is cut into
    // 2048-token training sequences; every document reports its offset
    // and the packs it spans. Pure window arithmetic — bit-exact.
    "q42_sequence_packing" -> QueryDef(
      (s, dir) => {
        val docs = Tables.computeTable(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            TextFunctions.wordCount(col("text")).as("n_tokens"))
          .drop("text")
        graft.operators.Curation.packSequences(docs, "doc_id", "n_tokens",
            numShards = 4, budget = 2048L, salt = "pack1")
          .select("doc_id", "shard", "n_tokens", "seq_start",
            "pack_first", "pack_last")
          .orderBy("doc_id")
      },
      s"""WITH tok AS (
         |  SELECT doc_id,
         |         CAST(CASE WHEN trim(text) = '' THEN 0
         |              ELSE len(string_split_regex(trim(text), '\\s+')) END AS INTEGER)
         |           AS n_tokens
         |  FROM documents),
         |h AS (
         |  SELECT doc_id, n_tokens,
         |         ${QueryDef.duckSampleHash("doc_id", "pack1")} AS hh
         |  FROM tok),
         |p AS (
         |  SELECT doc_id, n_tokens, CAST(hh % 4 AS INTEGER) AS shard,
         |         CAST(SUM(CAST(n_tokens AS BIGINT))
         |              OVER (PARTITION BY CAST(hh % 4 AS INTEGER)
         |                    ORDER BY hh, doc_id
         |                    ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT)
         |           AS seq_start
         |  FROM h)
         |SELECT doc_id, shard, n_tokens, seq_start,
         |       CAST(seq_start // 2048 AS BIGINT) AS pack_first,
         |       CAST((seq_start + greatest(n_tokens, 1) - 1) // 2048 AS BIGINT)
         |         AS pack_last
         |FROM p ORDER BY doc_id""".stripMargin),

    // Fractional upsampling (5/2 = 2.5 epochs of the English slice):
    // hash-decided 2-or-3 copies per doc, aggregated per language with
    // a copy-sensitive checksum pinning exactly which rows got the
    // extra repeat.
    "q48_weighted_upsample" -> QueryDef(
      (s, dir) => graft.operators.Sampling.weightedRepeat(
          Tables.computeTable(s, dir, "documents")
            .filter(col("lang") === "en").select("doc_id", "lang"),
          "doc_id", num = 5, den = 2, salt = "up1")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_rows_out"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("doc_id") * (col("copy_id") + 1)).as("copy_checksum"))
        .orderBy("lang"),
      s"""WITH en AS (
         |  SELECT doc_id, lang,
         |         ${QueryDef.duckSampleHash("doc_id", "up1")} AS h
         |  FROM documents WHERE lang = 'en'),
         |c AS (
         |  SELECT doc_id, lang,
         |         2 + CASE WHEN h % 2 < 1 THEN 1 ELSE 0 END AS copies
         |  FROM en),
         |x AS (
         |  SELECT doc_id, lang, CAST(k AS INTEGER) AS copy_id
         |  FROM c, UNNEST(range(0, copies)) AS u(k))
         |SELECT lang, COUNT(*) AS n_rows_out,
         |       COUNT(DISTINCT doc_id) AS n_docs,
         |       CAST(SUM(doc_id * (copy_id + 1)) AS BIGINT) AS copy_checksum
         |FROM x GROUP BY lang ORDER BY lang""".stripMargin),

    // Vocabulary heavy hitters: exact counts of every bigram occurring
    // >= 40 times, found via a count-min-sketch pre-filter so the
    // exact groupBy only shuffles candidate terms (the CMS never
    // under-counts, so the exact HAVING sees every true heavy hitter).
    // The oracle is plain exact counting — the sketch must be
    // semantically invisible.
    "q4T_heavy_hitters" -> QueryDef(
      (s, dir) => {
        val pairs = graft.operators.NgramModel.bigramPairs(
          Tables.computeTable(s, dir, "documents"), "text")
          .select(concat_ws(" ", col("w1"), col("w2")).as("term"))
        graft.operators.HeavyHitters.exactOverThreshold(pairs, "term",
            threshold = 40)
          .orderBy(col("n").desc, col("term"))
      },
      """WITH toks AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents WHERE length(trim(text)) > 0),
        |pairs AS (
        |  SELECT tk[i] || ' ' || tk[i + 1] AS term
        |  FROM toks, UNNEST(range(1, len(tk))) AS u(i)
        |  WHERE len(tk) >= 2)
        |SELECT term, COUNT(*) AS n FROM pairs GROUP BY term
        |HAVING COUNT(*) >= 40 ORDER BY n DESC, term""".stripMargin),

    // The STREAMING count-min sketch under a DuckDB oracle (§2.10
    // closure, like q54): document tokens replay through MemoryStream
    // in two halves and the complete-mode cell table must equal the
    // batch sketch — which the oracle recomputes from scratch with the
    // same per-row polynomial hashes (duckPolyHash at each depth row's
    // (base, prime), folded into the width). Cell sums are a
    // commutative monoid, so the two-batch replay is exact, not
    // approximate. MemoryStream + collect is harness plumbing; the
    // operator under test is the unbounded-universe-safe streaming
    // aggregation (state bounded at depth × width cells forever).
    "q55_stream_cms" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val docs = Tables.computeTable(s, dir, "documents")
          .select(col("doc_id").cast("long"), col("text").cast("string"))
          .as[(Long, String)].boundedCollect()
        val (c1, c2) = docs.partition(_._1 % 2 == 0)
        val in = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String)](64)
        val terms = in.toDF().toDF("doc_id", "text")
          .filter(length(trim(col("text"))) > 0)
          .select(explode(split(trim(col("text")), "\\s+")).as("term"))
        val out = graft.streaming.StreamingFlows.cmsCells(terms, "term",
          depth = 3, width = 64)
        val q = graft.streaming.StreamMeter.startWithPartitions(s, 8)(
          out.writeStream.format("memory").queryName("q55_cms_sink")
          .outputMode("complete").start())
        try {
          import graft.streaming.StreamMeter.timed
          if (c1.nonEmpty) { in.addData(c1.toSeq: _*); timed("q55_stream_cms")(q.processAllAvailable()) }
          if (c2.nonEmpty) { in.addData(c2.toSeq: _*); timed("q55_stream_cms")(q.processAllAvailable()) }
        } finally q.stop()
        s.table("q55_cms_sink").select("i", "cell", "n").orderBy("i", "cell")
      },
      s"""WITH toks AS (
        |  SELECT string_split_regex(trim(text), '\\s+') AS tk
        |  FROM documents WHERE length(trim(text)) > 0),
        |terms AS (
        |  SELECT tk[i] AS term
        |  FROM toks, UNNEST(range(1, len(tk) + 1)) AS u(i)),
        |cells AS (
        |  SELECT CAST(0 AS INTEGER) AS i,
        |         CAST(${duckPolyHash("term", 31, 1000000007L)} % 64 AS INTEGER) AS cell
        |  FROM terms
        |  UNION ALL
        |  SELECT CAST(1 AS INTEGER),
        |         CAST(${duckPolyHash("term", 37, 999999937L)} % 64 AS INTEGER)
        |  FROM terms
        |  UNION ALL
        |  SELECT CAST(2 AS INTEGER),
        |         CAST(${duckPolyHash("term", 41, 1000000021L)} % 64 AS INTEGER)
        |  FROM terms)
        |SELECT i, cell, COUNT(*) AS n FROM cells
        |GROUP BY i, cell ORDER BY i, cell""".stripMargin),

    // The STREAMING SimHash near-dup flow under a DuckDB oracle — the
    // LAST stateful flow to graduate from spec-pinned to hash-gated
    // (q54 funnel, q55 CMS, q58 sessions closed in r7). Documents
    // replay through MemoryStream in two chronological chunks
    // (event_time derived as base + doc_id seconds — the table has no
    // timestamp — so chunk 2 sits entirely past chunk 1's watermark
    // and nothing is late-dropped). With the horizon past the replayed
    // span and an unbounded bucket cap, the flow's emission set is
    // EXACTLY the batch simhashPairs semantics: every Hamming<=2 pair
    // sharing a band, emitted once at the pair's FIRST matching band —
    // which the oracle reproduces as MIN(band) over the banded
    // self-join. MemoryStream + collect is harness plumbing (a
    // deployment reads Kafka); the operator under test is the
    // per-bucket stateful pair emission.
    "q5B_stream_neardup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val docs = Tables.computeTable(s, dir, "documents")
          .select(col("doc_id").cast("long"), col("text").cast("string"))
          .as[(Long, String)].boundedCollect().sortBy(_._1)
        val baseMs = 1704067200000L // 2024-01-01 00:00 UTC
        def ts(id: Long) = new java.sql.Timestamp(baseMs + id * 1000L)
        val mid = if (docs.isEmpty) 0L else docs(docs.length / 2)._1
        val (c1, c2) = docs.partition(_._1 < mid)
        val in = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, java.sql.Timestamp, String)](64)
        val out = graft.streaming.StreamingFlows.simhashNearDups(
          in.toDF().toDF("doc_id", "event_time", "text"),
          maxHamming = 2,
          horizonMinutes = 60 * 24 * 60, // never forget within the replay
          maxBucket = Int.MaxValue)      // exactness: no prospective cap
        val q = graft.streaming.StreamMeter.startWithPartitions(s, 8)(
          out.writeStream.format("memory").queryName("q5B_neardup_sink")
          .outputMode("append").start())
        try {
          import graft.streaming.StreamMeter.timed
          if (c1.nonEmpty) {
            in.addData(c1.map(d => (d._1, ts(d._1), d._2)).toSeq: _*)
            timed("q5B_stream_neardup")(q.processAllAvailable())
          }
          if (c2.nonEmpty) {
            in.addData(c2.map(d => (d._1, ts(d._1), d._2)).toSeq: _*)
            timed("q5B_stream_neardup")(q.processAllAvailable())
          }
        } finally q.stop()
        s.table("q5B_neardup_sink")
          .select(col("doc_id"), col("dup_of"), col("hamming"), col("band"))
          .orderBy("doc_id", "dup_of")
      },
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, tok
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
         |        FROM documents WHERE trim(text) <> '') t,
         |       UNNEST(tk) AS u(tok)),
         |hs AS (
         |  SELECT doc_id, ${duckPolyHash("tok")} AS h1,
         |         ${duckPolyHash("tok", 37, 999999937L)} AS h2
         |  FROM toks),
         |bits AS (
         |  SELECT doc_id, b,
         |         SUM(CASE WHEN (CASE WHEN b < 30 THEN (h1 >> CAST(b AS INTEGER))
         |                        ELSE (h2 >> CAST(b - 30 AS INTEGER)) END) % 2 = 1
         |                  THEN 1 ELSE -1 END) AS sgn
         |  FROM hs, UNNEST(range(0, 60)) AS u(b)
         |  GROUP BY 1, 2),
         |sig AS (
         |  SELECT doc_id,
         |         SUM(CASE WHEN sgn > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
         |             ELSE CAST(0 AS BIGINT) END) AS simhash
         |  FROM bits GROUP BY 1),
         |banded AS (
         |  SELECT doc_id, simhash, CAST(b AS INTEGER) AS band,
         |         (simhash >> CAST(b * 15 AS INTEGER)) % 32768 AS bandval
         |  FROM sig, UNNEST(range(0, 4)) AS u(b)),
         |cand AS (
         |  SELECT y.doc_id AS doc_id, x.doc_id AS dup_of,
         |         x.simhash AS sh_a, y.simhash AS sh_b,
         |         CAST(MIN(x.band) AS INTEGER) AS band
         |  FROM banded x JOIN banded y
         |    ON x.band = y.band AND x.bandval = y.bandval AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT doc_id, dup_of,
         |       CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming, band
         |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 2
         |ORDER BY doc_id, dup_of""".stripMargin),

    // RAG-style chunking: 32-token windows, 8-token overlap (stride
    // 24). Pure map-side array arithmetic — split, one posexplode of
    // the start sequence, slice — no shuffle at any scale; fan-out is
    // ~n/stride chunks per doc. The oracle replays the same window
    // rule with range() + list_slice.
    "q5D_chunk_overlap" -> QueryDef(
      (s, dir) => graft.operators.Curation.chunkWithOverlap(
          Tables.computeTable(s, dir, "documents"), "doc_id", "text",
          chunkTokens = 32, overlap = 8)
        .orderBy("doc_id", "chunk_id"),
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents WHERE trim(text) <> ''),
        |s AS (SELECT doc_id, tk, len(tk) AS n FROM t),
        |c AS (
        |  SELECT doc_id, tk, n, CAST(k AS BIGINT) AS token_start,
        |         CAST(k // 24 AS BIGINT) AS chunk_id
        |  FROM s, UNNEST(range(0, greatest(n - 8 - 1, 0) + 1, 24)) AS u(k))
        |SELECT doc_id, chunk_id, token_start,
        |       CAST(least(32, n - token_start) AS BIGINT) AS n_chunk_tokens,
        |       array_to_string(list_slice(tk, CAST(token_start + 1 AS INTEGER),
        |         CAST(token_start + 32 AS INTEGER)), ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin),

    // Square-root temperature mixing (alpha = 0.5): per-language keep
    // probability sqrt(n_min/n_lang), drawn per row by the shared
    // integer sample hash and compared SQUARED in decimal128 — no
    // float, no libm, so DuckDB (HUGEINT) replays the exact row set.
    // The head language keeps sqrt-proportionally less; the smallest
    // keeps everything.
    "q5E_temperature_mix" -> QueryDef(
      (s, dir) => graft.operators.Curation.sqrtTemperatureMix(
          Tables.computeTable(s, dir, "documents"), "lang", "doc_id",
          salt = "mixT")
        .groupBy("lang").agg(count(lit(1)).as("kept"),
          sum("doc_id").as("id_checksum"))
        .orderBy("lang"),
      s"""WITH h AS (
         |  SELECT doc_id, lang,
         |         (((${duckPolyHash("(CAST(doc_id AS VARCHAR) || ':mixT')")}
         |            * 48271 + 11) % 1000000007) * 48271 + 11) % 1000000007 AS u
         |  FROM documents),
         |c AS (SELECT lang, COUNT(*) AS n_src FROM documents GROUP BY lang),
         |m AS (SELECT MIN(n_src) AS n_min FROM c)
         |SELECT h.lang, COUNT(*) AS kept,
         |       CAST(SUM(h.doc_id) AS BIGINT) AS id_checksum
         |FROM h JOIN c ON h.lang = c.lang, m
         |WHERE CAST(u AS HUGEINT) * u * n_src
         |      < CAST(1000000007 AS HUGEINT) * 1000000007 * n_min
         |GROUP BY h.lang ORDER BY h.lang""".stripMargin),

    // DSIR-shaped data selection: score every corpus doc by a
    // hashed-unigram importance ratio against a target domain (the
    // 'en' slice) — add-one smoothed (n_t+1)·scale div (n_c+1), mean
    // over token occurrences, all truncating integer arithmetic (the
    // q5A trick: no log, no float fold, bit-exact anywhere). The
    // feature tables are bucket-bounded (4096 rows) so the model join
    // broadcasts at any corpus size.
    "q5F_importance_score" -> QueryDef(
      (s, dir) => {
        val docs = Tables.computeTable(s, dir, "documents")
        graft.operators.NgramModel.hashedImportanceScore(
            docs, docs.filter(col("lang") === "en"), "doc_id", "text")
          .orderBy("doc_id")
      },
      s"""WITH toks AS (
         |  SELECT doc_id, tok
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
         |        FROM documents WHERE trim(text) <> '') t,
         |       UNNEST(tk) AS u(tok)),
         |fx AS (SELECT doc_id, ${duckPolyHash("tok")} % 4096 AS f FROM toks),
         |nc AS (SELECT f, COUNT(*) AS n_c FROM fx GROUP BY f),
         |nt AS (SELECT fx.f AS f, COUNT(*) AS n_t
         |       FROM fx JOIN documents d ON fx.doc_id = d.doc_id
         |       WHERE d.lang = 'en' GROUP BY 1),
         |sc AS (SELECT fx.doc_id,
         |              ((COALESCE(n_t, 0) + 1) * 1000000) // (n_c + 1) AS sp
         |       FROM fx JOIN nc ON fx.f = nc.f LEFT JOIN nt ON fx.f = nt.f)
         |SELECT doc_id, COUNT(*) AS n_tokens,
         |       CAST(SUM(sp) // COUNT(*) AS BIGINT) AS importance
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // BPE tokenizer training (Sennrich-style subword merges) on the
    // corpus word-frequency table: corpus touched once (wordCounts),
    // then the inherently-sequential merge loop runs driver-locally
    // over the collected vocab-sized table (Bpe.learnMergesLocal).
    // The oracle unrolls the full 12-merge trajectory as chained
    // DuckDB CTEs: each round one pair-count aggregation over the
    // current segmentation, a deterministic argmax (ORDER BY cnt
    // DESC, l, r — DuckDB's binary collation ≡ Spark's UTF8String
    // order), and a greedy left-to-right re-segmentation. The
    // re-segmentation trick: a segmentation is rendered as BRACKETED
    // symbols ("\x01a\x02\x01b\x02"), so replacing "\x01l\x02\x01r\x02"
    // with "\x01lr\x02" is exactly the greedy non-overlapping
    // left-to-right merge — boundary-exact on BOTH sides (r cannot
    // match a prefix of a longer symbol), and since each symbol
    // carries its own closing sentinel, adjacent occurrences share
    // no delimiter ("a a a a" → ["aa","aa"]). CTEs are MATERIALIZED:
    // seg(k) is read
    // by both p(k+1) and seg(k+1), and inlining would re-evaluate the
    // whole prefix 2^12 times. The same trajectory is additionally
    // dual-implementation-pinned merge-for-merge in CorpusStatsSpec.
    "q5M_bpe_merges" -> QueryDef(
      (s, dir) => {
        val (merges, _) = graft.operators.Bpe.learnMerges(
          Tables.computeTable(s, dir, "documents"), "text", numMerges = 12)
        merges.orderBy("step")
      },
      bpeOracleSql(numMerges = 12)),

    // BPE tokenization under the learned vocab: the distributed encode
    // path (two broadcast-joined posexplodes, corpus never shuffles)
    // against the same trajectory unrolled in DuckDB. Gates both the
    // segmentation transfer (learn → encode) and the pos packing.
    "q5S_bpe_encode" -> QueryDef(
      (s, dir) => {
        val docs = Tables.computeTable(s, dir, "documents")
        val (_, seg) = graft.operators.Bpe.learnMerges(
          docs, "text", numMerges = 12)
        graft.operators.Bpe.encode(docs, "doc_id", "text", seg)
          .orderBy("doc_id", "pos")
      },
      bpeEncodeOracleSql(numMerges = 12)),

    // Frozen-vocab tokenization: merges learned on half the corpus,
    // applied to all of it — unseen words merge as far as the frozen
    // pairs reach (rank-order replay, not char fallback). THE
    // production shape: learn once, encode any amount of new data.
    "q5T_bpe_frozen_vocab" -> QueryDef(
      (s, dir) => {
        val docs = Tables.computeTable(s, dir, "documents")
        val (merges, _) = graft.operators.Bpe.learnMerges(
          docs.filter(col("doc_id") % 2 === 0), "text", numMerges = 12)
        val ranked = merges.orderBy("step")
          .select("left", "right").collect()
          .map(r => (r.getString(0), r.getString(1))).toSeq
        graft.operators.Bpe.encodeFrozen(docs, "doc_id", "text", ranked)
          .orderBy("doc_id", "pos")
      },
      bpeFrozenOracleSql(numMerges = 12)),

    // Byte-level BPE (GPT-2 shape): symbols are UTF-8 BYTES in the
    // GPT-2 byte->unicode alphabet, so multi-byte characters start
    // split and merges may cross character boundaries. The fixture is
    // pure ASCII (where byte-level degenerates to char-level), so both
    // sides deterministically inject the 2-byte char U+00E4 before
    // learning — the trajectory then genuinely exercises byte
    // semantics: 0xC3/0xA4 begin as separate symbols and only a
    // frequency-won merge rejoins them.
    "q5U_bpe_bytes" -> QueryDef(
      (s, dir) => {
        val docs = Tables.computeTable(s, dir, "documents")
          .withColumn("text", translate(col("text"), "a", "\u00e4"))
        val (merges, _) = graft.operators.Bpe.learnMerges(
          docs, "text", numMerges = 12, mode = graft.operators.Bpe.ByteLevel)
        merges.orderBy("step")
      },
      bpeByteOracleSql(numMerges = 12)),

    // Bigram language-model table: top-3 continuations per predecessor
    // with exact counts and the continuation probability (a ratio of
    // two exact integer counts — bit-exact in any engine).
    "q4U_bigram_lm" -> QueryDef(
      (s, dir) => graft.operators.NgramModel.bigramTopK(
          Tables.computeTable(s, dir, "documents"), "text", k = 3)
        .orderBy("w1", "rank"),
      """WITH toks AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents WHERE length(trim(text)) > 0),
        |pairs AS (
        |  SELECT tk[i] AS w1, tk[i + 1] AS w2
        |  FROM toks, UNNEST(range(1, len(tk))) AS u(i)
        |  WHERE len(tk) >= 2),
        |counts AS (SELECT w1, w2, COUNT(*) AS n FROM pairs GROUP BY 1, 2),
        |ranked AS (
        |  SELECT w1, w2, n,
        |         CAST(n AS DOUBLE)
        |           / CAST(SUM(n) OVER (PARTITION BY w1) AS DOUBLE) AS p,
        |         row_number() OVER (PARTITION BY w1
        |                            ORDER BY n DESC, w2) AS rank
        |  FROM counts)
        |SELECT w1, w2, n, p, CAST(rank AS INTEGER) AS rank
        |FROM ranked WHERE rank <= 3 ORDER BY w1, rank""".stripMargin),

    // Inverted-index keyword search: documents containing ALL probe
    // terms. Postings are filtered to the probe set before any shuffle;
    // the AND is a count-distinct-equals-probes per doc.
    "q4V_keyword_search" -> QueryDef(
      (s, dir) => graft.operators.InvertedIndex.searchAll(
          Tables.computeTable(s, dir, "documents"), "doc_id", "text",
          Seq("vector", "merge", "slow"))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id"),
      """SELECT doc_id, lang, source, n_chars
        |FROM (SELECT *, string_split_regex(trim(text), '\s+') AS tk
        |      FROM documents)
        |WHERE list_contains(tk, 'vector') AND list_contains(tk, 'merge')
        |  AND list_contains(tk, 'slow')
        |ORDER BY doc_id""".stripMargin),

    // Collocation mining: top-25 adjacent pairs by rational PMI
    // (n_ab·N / (n_left·n_right) — monotone in PMI, exact-integer
    // ratio). Marginals re-aggregate the pair-count table; the global
    // top-k is TakeOrderedAndProject.
    "q4Z_pmi_collocations" -> QueryDef(
      (s, dir) => graft.operators.NgramModel.pmiTopK(
        Tables.computeTable(s, dir, "documents"), "text", k = 25, minCount = 2),
      """WITH toks AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents WHERE length(trim(text)) > 0),
        |pairs AS (
        |  SELECT tk[i] AS w1, tk[i + 1] AS w2
        |  FROM toks, UNNEST(range(1, len(tk))) AS u(i)
        |  WHERE len(tk) >= 2),
        |counts AS (SELECT w1, w2, COUNT(*) AS n_ab FROM pairs GROUP BY 1, 2),
        |l AS (SELECT w1, CAST(SUM(n_ab) AS BIGINT) AS n_left
        |      FROM counts GROUP BY 1),
        |r AS (SELECT w2, CAST(SUM(n_ab) AS BIGINT) AS n_right
        |      FROM counts GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n FROM counts)
        |SELECT c.w1, c.w2, c.n_ab, l.n_left, r.n_right,
        |       CAST(c.n_ab AS DOUBLE) * CAST(t.n AS DOUBLE)
        |         / (CAST(l.n_left AS DOUBLE) * CAST(r.n_right AS DOUBLE))
        |           AS pmi_ratio
        |FROM counts c JOIN l USING (w1) JOIN r USING (w2), t
        |WHERE c.n_ab >= 2
        |ORDER BY pmi_ratio DESC, w1, w2 LIMIT 25""".stripMargin)
  )
}
