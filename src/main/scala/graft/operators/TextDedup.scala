package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document deduplication operators for the large-scale training-data
  * pipeline: exact hash dedup, n-gram Jaccard near-dup via an inverted
  * shingle index, MinHash+LSH banding with exact verification, and
  * SimHash with banded Hamming search.
  *
  * Scale design: every operator is explode -> hash-partitioned groupBy
  * -> equi-join — no cross join ever touches the full corpus. Candidate
  * generation is an inverted-index self-join on shingles (or band
  * signatures), so cost follows the number of *colliding* pairs, not
  * n². All hashes are explicit modular arithmetic (TextFunctions
  * .polyHash) bounded to int64, reproducible by any SQL engine.
  */
object TextDedup {

  /** Exact dedup: keep the lowest id per identical text, count members.
    * Groups on a (length, 2x independent polyHash) content fingerprint
    * instead of the raw text, so the shuffle carries ~20 bytes per
    * distinct document rather than the document itself — at corpus
    * scale the difference between shuffling kilobytes/doc and a fixed
    * fingerprint. Collision odds for the ~122-bit fingerprint are
    * < 1e-18 even at 1e12 docs; both hashes are reproducible modular
    * arithmetic, so any SQL oracle groups identically. Output:
    * (keeper_id, n_dups, len). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(
        length(col(textCol)).as("len"),
        TextFunctions.polyHash(col(textCol), 31, 1000000007L).as("__h1"),
        TextFunctions.polyHash(col(textCol), 37, 999999937L).as("__h2"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_dups"))
      .select("keeper_id", "n_dups", "len")

  /** Incremental exact dedup: keep the rows of a NEW batch whose
    * content fingerprint appears neither in the existing corpus nor
    * earlier in the batch itself (keep-first within the batch). This
    * is how a production corpus actually ingests — yesterday's corpus
    * is not re-deduped, its fingerprint index is the join target. The
    * anti-join and the within-batch window both move the ~20-byte
    * (len, h1, h2) fingerprint, never the text, and at scale the
    * corpus side is the pre-computed dedup index, not a re-scan.
    * Output: (idCol, len) of the surviving batch rows. */
  def incrementalDedup(batch: DataFrame, corpus: DataFrame,
                       idCol: String, textCol: String): DataFrame = {
    def fp(df: DataFrame) = df.select(col(idCol),
      length(col(textCol)).as("len"),
      TextFunctions.polyHash(col(textCol), 31, 1000000007L).as("__h1"),
      TextFunctions.polyHash(col(textCol), 37, 999999937L).as("__h2"))
    val fresh = fp(batch)
      .join(fp(corpus).select("len", "__h1", "__h2"), Seq("len", "__h1", "__h2"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("len", "__h1", "__h2").orderBy(col(idCol))
    fresh.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(idCol), col("len"))
  }

  /** Distinct (doc, shingle-hash) pairs — the inverted index rows. The
    * index carries the 8-byte polynomial hash, not the shingle string:
    * every downstream shuffle (df-cap count, candidate self-join,
    * verification joins) moves fixed-width rows instead of k-word
    * strings, and the MinHash family derives from this same hash. Hash
    * collisions merge shingles identically in any engine running the
    * same arithmetic, so the oracle stays bit-exact. The per-doc hash
    * array comes from one codegen'd kernel call (tokenize + shingle +
    * dedup + hash in a single pass) — only fixed-width longs ever
    * reach the explode. */
  def shingleIndex(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(graft.functions.cat.GraftExpr.shingleHashes(
          col(textCol).cast("string"), k)).as("sh_hash"))

  /** Drop shingles whose document frequency exceeds `maxDf` from the
    * inverted index (standard CCNet/Gopher boilerplate guard). A shingle
    * in d docs emits d²/2 candidate rows from the self-join, so one
    * boilerplate 5-gram with d in the millions is a single straggler
    * task materializing ~10¹² rows — the cap bounds every group to
    * maxDf²/2. Zipfian df means the hot set is a tiny *proportion* of
    * shingles, but its absolute size still grows with corpus scale — so
    * the join strategy is left to AQE, which broadcasts the anti-join
    * when the hot side measures small at runtime and falls back to a
    * shuffled anti-join (keyed on the same fixed-width hash) when it
    * doesn't. No forced broadcast hint: a hint would OOM the driver on
    * a corpus where "df > cap" covers hundreds of millions of shingles. */
  def capShingleDf(sh: DataFrame, maxDf: Int): DataFrame = {
    val hot = sh.groupBy("sh_hash").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select("sh_hash")
    sh.join(hot, Seq("sh_hash"), "left_anti")
  }

  /** Same guard for LSH band buckets: a bucket of d near-identical docs
    * is d²/2 candidate pairs; such groups belong to exact-dedup (which
    * runs first in the pipeline), not to the pairwise verifier. */
  def capBandBuckets(bands: DataFrame, maxBucket: Int): DataFrame = {
    val hot = bands.groupBy("band", "sig").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket)
      .select("band", "sig")
    bands.join(hot, Seq("band", "sig"), "left_anti")
  }

  /** n-gram Jaccard near-dup: inverted-index candidate join + exact
    * Jaccard on shared-shingle counts over the df-capped index (Jaccard
    * is over each doc's non-boilerplate shingles — the CCNet semantic).
    * Returns (doc_a, doc_b, shared, n_a, n_b, jaccard >= threshold). */
  /** EXACT-threshold word-level Jaccard self-join via PREFIX FILTERING
    * (the AllPairs/PPJoin family: Bayardo et al. WWW'07, Xiao et al.
    * WWW'08) — the exact counterpart to the approximate LSH paths:
    * every pair with Jaccard ≥ `threshold` over distinct whitespace
    * tokens is returned, none missed, no df caps needed.
    *
    * Why it scales without caps: records are sorted by ONE global
    * token order (document frequency ascending, token as tiebreak) and
    * only each record's PREFIX — its `n - ceil(t·n) + 1` RAREST tokens
    * — enters the inverted index. Correctness of the prune: J(A,B) ≥ t
    * implies |A∩B| ≥ t·|A| (since J = o/(|A|+|B|-o) ≥ t and |B| ≥ o),
    * so if A shared nothing in its prefix, all ≥ ceil(t·|A|) shared
    * tokens would sit in its last ceil(t·|A|) - 1 positions —
    * impossible. The index thus holds only the (1-t) rarest fraction
    * of each record, and candidate volume follows the squared df of
    * RARE tokens (a pair of 95%-similar records is found via a token
    * few others carry). A record-length filter (t·n_a ≤ n_b ≤ n_a/t)
    * prunes inside the join condition. Degenerate worst case — a
    * corpus of near-identical records — generates candidates
    * proportional to the true result size, which is the output anyway.
    *
    * Plan shape: one token-shuffle for df, one groupBy to sort each
    * record map-side, an equi-join on prefix tokens (never all-pairs),
    * and verification joins keyed by doc id, bounded by the candidate
    * count. Output matches [[ngramJaccardPairs]]: (doc_a, doc_b,
    * shared, n_a, n_b, jaccard). */
  def jaccardPrefixJoin(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double): DataFrame =
    setJaccardPrefixJoin(
      df.select(col(idCol).as("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("elem")),
      threshold)

  /** [[jaccardPrefixJoin]] over k-gram SHINGLE sets — the granularity
    * that stays discriminative on corpora with tiny vocabularies
    * (word-level sets degenerate there: the local fixture's documents
    * draw from ~31 distinct words, making most doc PAIRS high-Jaccard
    * at word level while their shingle sets still separate cleanly —
    * and with millions of truly-similar pairs the exact result itself
    * is the blowup, no algorithm fixes that). Same contract as q25's
    * capped index join but EXACT: no df cap, no missed pairs. */
  def shingleJaccardPrefixJoin(df: DataFrame, idCol: String, textCol: String,
                               k: Int, threshold: Double): DataFrame =
    setJaccardPrefixJoin(
      shingleIndex(df, idCol, textCol, k).distinct()
        .withColumnRenamed("sh_hash", "elem"),
      threshold)

  /** Core of the prefix-filtered exact join: `elems` is the DISTINCT
    * set representation, one (doc_id, elem) row per member. */
  def setJaccardPrefixJoin(elems: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold < 1.0, s"threshold in (0,1): $threshold")
    val dfreq = elems.groupBy("elem").agg(count(lit(1)).as("edf"))
    val docs = elems.join(dfreq, "elem")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("edf"), col("elem")))).as("ts"))
      .select(col("doc_id"),
        transform(col("ts"), x => x.getField("elem")).as("es"),
        size(col("ts")).as("n"))
    val pref = docs.select(col("doc_id"), col("n"),
      explode(slice(col("es"), lit(1),
        (col("n") - ceil(col("n") * lit(threshold)) + 1).cast("int"))).as("elem"))
    val cand = pref.as("a")
      .join(pref.as("b"),
        col("a.elem") === col("b.elem") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("b.n") >= col("a.n") * lit(threshold) &&
          col("a.n") >= col("b.n") * lit(threshold))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("es").as("es_a"),
        col("n").as("n_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("es").as("es_b"),
        col("n").as("n_b")), "doc_b")
      .withColumn("shared", size(array_intersect(col("es_a"), col("es_b"))))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "shared", "n_a", "n_b", "jaccard")
  }

  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        k: Int, threshold: Double, maxDf: Int): DataFrame = {
    val sh = capShingleDf(shingleIndex(df, idCol, textCol, k), maxDf)
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.sh_hash") === col("b.sh_hash") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(counts.withColumnsRenamed(Map("doc_id" -> "doc_a", "n" -> "n_a")), "doc_a")
      .join(counts.withColumnsRenamed(Map("doc_id" -> "doc_b", "n" -> "n_b")), "doc_b")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "shared", "n_a", "n_b", "jaccard")
  }

  /** MinHash signatures as ONE kernel call per document — shingling,
    * hashing, and all 32 family minima in a single map-side pass
    * (hash family: h_j(x) = ((2j+1)*polyHash(x) + j*j+7) mod p;
    * products stay far below 2^63). Signatures never touch a shuffle;
    * the inverted index is needed only for candidate verification.
    * Docs with < k tokens have no shingles and are dropped, matching
    * the aggregation form's explode-of-nothing. */
  def minhashSignatureArray(df: DataFrame, idCol: String, textCol: String,
                            k: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        graft.functions.cat.GraftExpr.minhash32(col(textCol).cast("string"), k).as("mh"))
      .filter(col("mh").isNotNull)

  /** The aggregation-shaped MinHash (numHashes parallel `min`s over the
    * hashed shingle index — one groupBy with map-side combine, still
    * far better than a numHashes× explode). Semantically identical to
    * [[minhashSignatureArray]] over an uncapped index; retained as the
    * independent implementation the kernel is tested against. */
  def minhashSignatures(sh: DataFrame, numHashes: Int,
                        p: Long = 1000000007L): DataFrame = {
    val mins = (0 until numHashes).map { j =>
      min((col("sh_hash") * (2 * j + 1) + (j * j + 7)) % p).as(s"mh_$j")
    }
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** LSH band signatures from the per-doc minhash columns: one slim
    * (doc_id, band, sig) row per band. The round-1 variant also carried
    * the full signature array on every row so the candidate join could
    * emit each pair only at its first matching band with an in-row
    * predicate; that made every shuffled band row numBands× fatter to
    * save a distinct over the (tiny, capped) candidate-pair set — the
    * wrong trade, so the fat column is gone. */
  def bandSignatures(sig: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val nb = numHashes / rowsPerBand
    def mh(j: Int): Column =
      if (sig.columns.contains("mh")) element_at(col("mh"), j + 1) else col(s"mh_$j")
    val bandStructs = (0 until nb).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(j => mh(j).cast("string")): _*).as("sig"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** MinHash+LSH near-dup with exact verification: candidates = pairs
    * sharing any full band signature (bucket-size-capped), verified
    * with exact shingle Jaccard >= threshold over the df-capped index.
    * The LSH join touches only banded signature collisions — the scale
    * path for corpora where the shingle inverted index itself is too
    * hot. Multi-band collisions are deduplicated with a distinct over
    * candidate pairs only — post-cap that set is orders of magnitude
    * smaller than the band rows, so the extra shuffle is negligible
    * next to the band-row slimming it buys. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String, k: Int,
                      numHashes: Int, rowsPerBand: Int, threshold: Double,
                      maxDf: Int, maxBucket: Int): DataFrame = {
    require(numHashes == 32, "the single-pass signature kernel is a 32-hash family")
    // signatures come from the raw shingle set (the df-cap bounds the
    // *self-joins*: verification below, and banding via the bucket cap —
    // MinHash itself never self-joins, so capping its input only skews
    // the signatures); the capped index serves verification alone
    val sh = capShingleDf(shingleIndex(df, idCol, textCol, k), maxDf)
    val bands = capBandBuckets(
      bandSignatures(minhashSignatureArray(df, idCol, textCol, k),
        numHashes, rowsPerBand), maxBucket)
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shared = cand
      .join(sh.withColumnsRenamed(Map("doc_id" -> "doc_a", "sh_hash" -> "s_a")), "doc_a")
      .join(sh.withColumnsRenamed(Map("doc_id" -> "db", "sh_hash" -> "s_b")),
        col("doc_b") === col("db") && col("s_a") === col("s_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    shared
      .join(counts.withColumnsRenamed(Map("doc_id" -> "doc_a", "n" -> "n_a")), "doc_a")
      .join(counts.withColumnsRenamed(Map("doc_id" -> "doc_b", "n" -> "n_b")), "doc_b")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Incremental MinHash-LSH near-dup: a NEW batch of documents checks
    * against an existing corpus without the corpus EVER self-joining —
    * [[incrementalDedup]]'s near-dup analogue, the shape an ingest
    * pipeline runs per arrival. Both sides band their signatures; a
    * (band, sig) bucket hotter than `maxBucket` across the union is
    * dropped (a boilerplate bucket is boilerplate no matter which side
    * probes it); candidates are batch bands ⋈ corpus bands on the
    * bucket key and verify with exact shingle Jaccard over the
    * union-df-capped index. In deployment the corpus band rows and
    * shingle index are precomputed once and persisted, so only the
    * batch side is fresh work — and the corpus appears on at most one
    * side of every join, so cost scales with |batch| × collision rate,
    * never |corpus|². IDs must be unique across batch and corpus.
    * Output: (batch_id, corpus_id, jaccard >= threshold). */
  def incrementalLshPairs(batch: DataFrame, corpus: DataFrame, idCol: String,
                          textCol: String, k: Int, numHashes: Int,
                          rowsPerBand: Int, threshold: Double,
                          maxDf: Int, maxBucket: Int): DataFrame = {
    require(numHashes == 32, "the single-pass signature kernel is a 32-hash family")
    def sideBands(df: DataFrame) = bandSignatures(
      minhashSignatureArray(df, idCol, textCol, k), numHashes, rowsPerBand)
    val allBands = sideBands(batch).withColumn("__side", lit("b"))
      .unionAll(sideBands(corpus).withColumn("__side", lit("c")))
    val capped = capBandBuckets(allBands, maxBucket)
    val cand = capped.filter(col("__side") === "b").as("x")
      .join(capped.filter(col("__side") === "c").as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig"))
      .select(col("x.doc_id").as("batch_id"), col("y.doc_id").as("corpus_id"))
      .distinct()
    val sh = capShingleDf(
      shingleIndex(batch, idCol, textCol, k)
        .unionAll(shingleIndex(corpus, idCol, textCol, k)), maxDf)
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shared = cand
      .join(sh.withColumnsRenamed(Map("doc_id" -> "batch_id", "sh_hash" -> "s_a")),
        "batch_id")
      .join(sh.withColumnsRenamed(Map("doc_id" -> "cid", "sh_hash" -> "s_b")),
        col("corpus_id") === col("cid") && col("s_a") === col("s_b"))
      .groupBy("batch_id", "corpus_id").agg(count(lit(1)).as("shared"))
    shared
      .join(counts.withColumnsRenamed(Map("doc_id" -> "batch_id", "n" -> "n_a")),
        "batch_id")
      .join(counts.withColumnsRenamed(Map("doc_id" -> "corpus_id", "n" -> "n_b")),
        "corpus_id")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("batch_id", "corpus_id", "jaccard")
  }

  /** Benchmark decontamination (the standard shares-any-13-gram rule):
    * corpus documents sharing at least one k-gram with any benchmark
    * document. An inverted-index semi-join — corpus shingle hashes ⋉
    * distinct benchmark shingle hashes — so the corpus never
    * self-joins and needs no df cap; the benchmark side is tiny by
    * nature (eval sets), so the semi-join broadcasts and the corpus
    * pays one scan + one distinct on flagged doc ids. */
  def contaminatedDocs(corpus: DataFrame, benchmark: DataFrame,
                       idCol: String, textCol: String, k: Int = 13): DataFrame = {
    val cs = shingleIndex(corpus, idCol, textCol, k)
    val bs = shingleIndex(benchmark, idCol, textCol, k).select("sh_hash").distinct()
    cs.join(bs, Seq("sh_hash"), "left_semi").select("doc_id").distinct()
  }

  /** Graded contamination: per corpus document, the fraction of its
    * distinct k-grams that appear in any benchmark document — the
    * thresholdable refinement of [[contaminatedDocs]]'s binary rule
    * (evals typically drop at >= some overlap fraction rather than on
    * a single shared gram). Same scale shape: the benchmark gram set
    * is tiny and broadcasts, the left join is map-side, and the
    * per-doc aggregate moves only (doc_id, 1, 0/1) triples — the
    * corpus never self-joins and is scanned once.
    * Output: (doc_id, n_grams, n_matched, contamination). */
  def contaminationFraction(corpus: DataFrame, benchmark: DataFrame,
                            idCol: String, textCol: String, k: Int = 13): DataFrame = {
    val cs = shingleIndex(corpus, idCol, textCol, k)
    val bs = shingleIndex(benchmark, idCol, textCol, k)
      .select("sh_hash").distinct().withColumn("__hit", lit(1L))
    cs.join(broadcast(bs), Seq("sh_hash"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_matched"))
      .withColumn("contamination",
        col("n_matched").cast("double") / col("n_grams").cast("double"))
  }

  /** C4-style chunk-level exact dedup: each document is cut into
    * consecutive `chunkWords`-word chunks (one codegen'd kernel call —
    * the distributed analogue of C4's line dedup, with fixed-width
    * chunks standing in for newline-delimited lines); a chunk is kept
    * only at its first occurrence corpus-wide (ordered by doc id, then
    * position), and surviving chunks are re-joined per document.
    * Documents whose every chunk was seen earlier disappear entirely,
    * exactly as C4 drops fully-boilerplate pages.
    *
    * Scale shape: two linear shuffles. The keep-first decision is a
    * window over the chunk's (length, 2x polyHash) content fingerprint
    * — `row_number = 1` compiles to WindowGroupLimit, so each map
    * partition forwards at most one row per fingerprint; the chunk
    * text rides along because reassembly needs it downstream either
    * way (shuffling a slim decision and joining the text back would
    * move the same text once more). Reassembly is a groupBy on doc_id
    * whose per-group state is one document's chunks. Nothing is ever
    * quadratic in corpus size.
    * Output: (doc_id, n_chunks_kept, text_dedup). */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
                 chunkWords: Int = 16): DataFrame = {
    val ex = df
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        posexplode(graft.functions.cat.GraftExpr
          .chunkSplit(col(textCol).cast("string"), chunkWords))
          .as(Seq("cpos", "chunk")))
    val fp = ex
      .withColumn("__cl", length(col("chunk")))
      .withColumn("__h1", TextFunctions.polyHash(col("chunk"), 31, 1000000007L))
      .withColumn("__h2", TextFunctions.polyHash(col("chunk"), 37, 999999937L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__cl", "__h1", "__h2").orderBy(col("doc_id"), col("cpos"))
    fp.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_chunks_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("cpos"), col("chunk")))),
            s => s.getField("chunk")), " ").as("text_dedup"))
  }

  /** Span-level exact dedup, the ExactSubstr shape of Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better"):
    * every `w`-token SLIDING window is fingerprinted; a window
    * occurring at more than one (doc, position) keeps only its
    * corpus-wide FIRST occurrence (doc id, then position) and every
    * other occurrence marks its `w` tokens for removal; documents are
    * reassembled from the surviving tokens. Unlike [[chunkDedup]]'s
    * disjoint chunks this catches repeated spans at ANY alignment —
    * a repeated run of length L >= w is scrubbed in full from every
    * non-first copy (each of its window starts has an earlier twin and
    * their union covers the run), including INTRA-document repeats.
    * Docs shorter than `w` tokens have no windows and pass through
    * verbatim (the semantics only dedups spans >= w); every input doc
    * gets an output row, empty-text docs included.
    *
    * Scale shape: L-w+1 slim (len, hash, hash2, doc, pos) rows per doc
    * shuffle into the keep-first window (this one selects `rn > 1` —
    * the removed occurrences — so unlike [[chunkDedup]] no
    * WindowGroupLimit pre-prune applies; the shuffled rows stay slim
    * fingerprints either way, never text); removed span starts join
    * back against token positions as a hash join on the DOC id with a
    * residual range predicate (never a cartesian); reassembly is
    * [[chunkDedup]]'s per-doc groupBy. Nothing is quadratic in corpus
    * size.
    * Output: (doc_id, n_tokens, n_removed, text_scrubbed). */
  def spanScrub(df: DataFrame, idCol: String, textCol: String,
                w: Int = 15): DataFrame = {
    require(w >= 2, s"window must span at least 2 tokens, got $w")
    val base = df.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("string").as("__text"))
    val toks = base
      .filter(length(trim(col("__text"))) > 0)
      .select(col("doc_id"), split(trim(col("__text")), "\\s+").as("tk"))
    val pos = toks
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("i"), col("tok"))
    val win = toks
      .filter(size(col("tk")) >= w)
      .select(col("doc_id"), posexplode(
          transform(sequence(lit(1), size(col("tk")) - (w - 1)),
            s => array_join(slice(col("tk"), s, lit(w)), " ")))
        .as(Seq("s0", "wtext")))
      .select(col("doc_id"), (col("s0") + 1).as("s"),
        length(col("wtext")).as("__wl"),
        TextFunctions.polyHash(col("wtext"), 31, 1000000007L).as("__h1"),
        TextFunctions.polyHash(col("wtext"), 37, 999999937L).as("__h2"))
    val keepFirst = org.apache.spark.sql.expressions.Window
      .partitionBy("__wl", "__h1", "__h2").orderBy(col("doc_id"), col("s"))
    val removed = win.withColumn("__rn", row_number().over(keepFirst))
      .filter(col("__rn") > 1).select(col("doc_id"), col("s"))
    // aliases: pos and removed share the toks lineage, so unqualified
    // column references would be ambiguous in the self-join condition
    val kept = pos.alias("p").join(removed.alias("r"),
      col("p.doc_id") === col("r.doc_id") &&
        col("r.s") <= col("p.i") && col("r.s") >= col("p.i") - (w - 1),
      "left_anti")
    val scrubbed = kept.groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("__n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("i"), col("tok")))),
            s => s.getField("tok")), " ").as("__text_scrubbed"))
    base
      .select(col("doc_id"),
        when(length(trim(col("__text"))) === 0, 0)
          .otherwise(size(split(trim(col("__text")), "\\s+")))
          .cast("int").as("n_tokens"))
      .join(scrubbed, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__n_kept"), lit(0))).cast("int")
          .as("n_removed"),
        coalesce(col("__text_scrubbed"), lit("")).as("text_scrubbed"))
  }

  /** SimHash: 60-bit signature from two 30-bit polynomial token hashes.
    * Per bit: sum +1/-1 over distinct tokens by that bit of the token
    * hash; bit set when the sum is positive.
    *
    * Shape: ONE codegen'd kernel call per document — signatures are a
    * map-side scalar with no explode and no shuffle at all (the
    * trim-empty filter mirrors the aggregate form's explode-of-empty
    * drop). [[simhashViaAggregation]] keeps the explode -> 60-bitsum
    * shape for cross-validation. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.filter(trim(col(textCol)) =!= "")
      .select(col(idCol).as("doc_id"),
        graft.functions.cat.GraftExpr.call("simhash60", col(textCol).cast("string"))
          .as("simhash"))

  /** The original aggregation-shaped SimHash (explode distinct tokens,
    * 60 parallel +-1 bit sums in a single groupBy with map-side
    * combine). Semantically identical to [[simhash]]; retained as the
    * independent implementation the kernel is tested against. */
  def simhashViaAggregation(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("tok"))
      .withColumn("h1", TextFunctions.polyHash(col("tok"), 31, 1000000007L))
      .withColumn("h2", TextFunctions.polyHash(col("tok"), 37, 999999937L))
    val bitSums = (0 until 60).map { b =>
      val bit = if (b < 30) shiftright(col("h1"), b) % 2
        else shiftright(col("h2"), b - 30) % 2
      sum(bit * 2 - 1).as(s"s_$b")
    }
    val agg = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 60)
      .map(b => when(col(s"s_$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup: block on 4 bands of 15 bits, verify Hamming
    * distance over the full 60-bit signature. Pairs colliding in
    * several bands are emitted only at the first one (the band values
    * are recomputable in-row from the signatures both sides carry), so
    * no distinct shuffle is needed. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    val sig = simhash(df, idCol, textCol)
    val banded = sig.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bandval", expr(s"shiftright(simhash, band * 15) % ${1L << 15}L"))
    def bandOf(sh: Column, b: Int): Column = shiftright(sh, b * 15) % (1L << 15)
    val joined = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bandval") === col("y.bandval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"),
        col("x.band").as("band"))
    val earlierBandMatches = (0 until 3).map { bp =>
      (col("band") > bp) && (bandOf(col("sh_a"), bp) === bandOf(col("sh_b"), bp))
    }.reduce(_ || _)
    joined.filter(!earlierBandMatches)
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }
}
