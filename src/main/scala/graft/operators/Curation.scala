package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation layout operators: per-source caps and deterministic
  * shard assignment. Both decide from the [[Sampling.sampleHash]] mixed
  * per-row hash, so the outcome is a pure function of the data — stable
  * under any partitioning, re-runnable, and reproducible by the DuckDB
  * oracle with the same integer arithmetic.
  */
object Curation {

  /** Operators below attach working/output columns by fixed name; a
    * frame already carrying one of those names would be silently
    * overwritten and corrupt results, so the clash is an error. */
  private def requireFresh(df: DataFrame, names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has reserved column(s) ${clash.mkString(", ")}; rename them first")
  }

  /** Cap any single source's (domain's) contribution to the corpus at
    * `cap` documents, chosen by deterministic hash order (a reproducible
    * uniform draw within each source; ties broken by the key itself).
    * Web-scale corpora are dominated by a few mega-domains — boilerplate
    * mirrors, link farms — and capping per registered domain is a
    * standard curation gate (cf. Gopher / RefinedWeb pipelines).
    *
    * Scale shape: one hash-partition window on the source key.
    * `row_number <= cap` compiles to WindowGroupLimit, which pushes the
    * per-group limit into a partial (map-side) pass — the shuffle moves
    * at most `cap` rows per source per input partition, so a
    * billion-page domain contributes `cap × partitions`, not a billion,
    * to the exchange. A skewed mega-source never concentrates on one
    * reducer beyond that bound.
    */
  def perSourceCap(df: DataFrame, srcCol: String, keyCol: String, cap: Int,
                   salt: String): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    requireFresh(df, "__src_rn")
    val w = Window.partitionBy(col(srcCol))
      .orderBy(Sampling.sampleHash(col(keyCol), salt).asc, col(keyCol).asc)
    df.withColumn("__src_rn", row_number().over(w))
      .filter(col("__src_rn") <= cap)
      .drop("__src_rn")
  }

  /** Deterministic corpus shuffle + training-shard assignment: every row
    * gets a `shard` in [0, numShards) and a dense `shard_pos` giving its
    * position within the shard, both pure functions of the key hash —
    * the distributed equivalent of "shuffle the corpus with a fixed seed
    * and split it into N files", reproducible across runs and engines.
    *
    * Training pipelines need exactly this: a global shuffle that does
    * not depend on input order (hash order IS the shuffle order) and
    * contiguous shard files a data loader can stream.
    *
    * Scale shape: shard = hash mod N is map-side; the position is a
    * window partitioned BY SHARD — N independent groups that
    * parallelize, never a single global-order window (a
    * `row_number() OVER (ORDER BY hash)` would serialize the corpus
    * through one reducer; partitioning by shard keeps every exchange
    * group at corpus/N rows). Writing `partitionBy(shard)` then gives
    * one contiguous, internally-shuffled file set per shard.
    */
  def shardAssign(df: DataFrame, keyCol: String, numShards: Int,
                  salt: String): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    requireFresh(df, "__shuf_h", "shard", "shard_pos")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__shuf_h").asc, col(keyCol).asc)
    df.withColumn("__shuf_h", Sampling.sampleHash(col(keyCol), salt))
      .withColumn("shard", (col("__shuf_h") % numShards).cast("int"))
      .withColumn("shard_pos", row_number().over(w) - 1)
      .drop("__shuf_h")
  }
  // (shard = hash mod N over a ~1e9 hash range has modulo bias O(N/1e9)
  // for non-power-of-two N — nanoscale next to the per-shard variance
  // of the draw itself, and identically reproduced by the oracle.)

  /** GPT-style sequence packing (concatenate-then-chunk): within each
    * shard, documents are laid out in the deterministic hash order and
    * the concatenated token stream is cut into `budget`-token training
    * sequences. Each document reports its token offset (`seq_start`)
    * and the first/last pack (sequence index) it lands in — a document
    * crossing a boundary spans consecutive packs, exactly as
    * concat-and-chunk pretraining feeds data.
    *
    * Scale shape: the running offset is a window SUM partitioned BY
    * SHARD (never a global-order window — each exchange group holds
    * corpus/N rows), everything else is map-side arithmetic; pack ids
    * are shard-local so no cross-shard coordination exists at any
    * scale. Determinism: layout order is (sampleHash, key), a pure
    * function of the data.
    * Output: input columns + (shard, seq_start, pack_first, pack_last). */
  def packSequences(df: DataFrame, keyCol: String, tokenCol: String,
                    numShards: Int, budget: Long, salt: String): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    requireFresh(df, "seq_start", "pack_first", "pack_last")
    val sharded = shardAssign(df, keyCol, numShards, salt)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shard_pos").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("seq_start",
        sum(col(tokenCol).cast("long")).over(w) - col(tokenCol).cast("long"))
      // floor-division via doubles is exact for any realistic token
      // offset (< 2^53); Column./ on longs is double division
      .withColumn("pack_first", floor(col("seq_start") / budget).cast("long"))
      // greatest(.,1) keeps a zero-token document inside its own pack
      // (plain tokens-1 would go negative at a pack boundary, where
      // truncating and flooring integer division disagree)
      .withColumn("pack_last",
        floor((col("seq_start") + greatest(col(tokenCol).cast("long"), lit(1L)) - 1) / budget)
          .cast("long"))
      .drop("shard_pos")
  }

  /** Materialize [[shardAssign]] as real training-shard files: one
    * contiguous parquet file set per `shard=<i>` directory, rows inside
    * each shard in `shard_pos` order — the layout a sequential data
    * loader streams without any further shuffling.
    *
    * The pre-write `repartition(numShards, shard)` puts each shard's
    * rows in exactly one task, so each shard directory holds exactly
    * one data file; `sortWithinPartitions` fixes the in-file row order.
    * Determinism: both the assignment and the order are pure functions
    * of the key hash, so re-running over the same rows (under any input
    * partitioning) writes byte-identical row sequences — LayoutSpec
    * asserts the layout and the rerun stability. */
  def writeShards(df: DataFrame, keyCol: String, numShards: Int, salt: String,
                  path: String): Unit =
    shardAssign(df, keyCol, numShards, salt)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .write.partitionBy("shard").mode("overwrite").parquet(path)

  /** RAG/embedding-style document chunking: slide a `chunkTokens`-token
    * window over each document's whitespace tokens with `overlap`
    * tokens shared between consecutive chunks (stride = chunkTokens −
    * overlap). Chunk starts are 0, stride, 2·stride, …, continuing
    * while the start lands strictly before n − overlap (so no chunk is
    * wholly contained in its predecessor); the final chunk may be
    * short. Documents with no tokens emit no row.
    *
    * Scale shape: pure map-side array arithmetic — split, one
    * `posexplode` of the start sequence, `slice` + `concat_ws`. No
    * shuffle, no state; a 100 TB corpus chunks at scan speed and the
    * fan-out is bounded by ~n/stride rows per document.
    * Output: (doc_id, chunk_id, token_start, n_chunk_tokens,
    * chunk_text). */
  def chunkWithOverlap(df: DataFrame, idCol: String, textCol: String,
                       chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val stride = chunkTokens - overlap
    val toks = split(trim(col(textCol)), "\\s+")
    df.filter(trim(col(textCol)) =!= "")
      .select(col(idCol).as("doc_id"), toks.as("__tk"))
      .select(col("doc_id"), col("__tk"),
        posexplode(sequence(lit(0),
          greatest(size(col("__tk")) - overlap - 1, lit(0)),
          lit(stride))).as(Seq("chunk_id", "token_start")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("token_start").cast("long").as("token_start"),
        least(lit(chunkTokens),
          size(col("__tk")) - col("token_start")).cast("long")
          .as("n_chunk_tokens"),
        concat_ws(" ",
          slice(col("__tk"), col("token_start") + 1, lit(chunkTokens)))
          .as("chunk_text"))
  }

  /** Square-root temperature mixing (α = 0.5) for multilingual /
    * multi-source corpus balancing: resample so the kept distribution
    * follows n_s^α instead of the raw source sizes n_s — the standard
    * re-balancing that keeps head sources from drowning tail sources
    * without exploding tail duplication. Per-row keep probability is
    * p_s = √(n_min / n_s) (the smallest source keeps everything,
    * a 100× bigger source keeps 10%), decided per row by the
    * [[Sampling.sampleHash]] draw u ∈ [0, P).
    *
    * INTEGER-EXACT despite the square root: u/P < √(n_min/n_s) is
    * evaluated squared — u²·n_s < P²·n_min — in DECIMAL(38,0)
    * arithmetic (u² ≈ 10^18 times a source count fits comfortably in
    * decimal128), so no float, no libm, and any engine replays the
    * exact row set. Scale shape: one count aggregation over the source
    * column (tiny), broadcast back, then a map-side filter; the corpus
    * never shuffles. Output: input columns, filtered. */
  def sqrtTemperatureMix(df: DataFrame, srcCol: String, keyCol: String,
                         salt: String): DataFrame = {
    requireFresh(df, "__n_src", "__n_min")
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("__n_src"))
      .withColumn("__n_min", min(col("__n_src")).over(Window.partitionBy()))
    val p = lit(Sampling.P).cast("decimal(38,0)")
    val u = Sampling.sampleHash(col(keyCol), salt).cast("decimal(38,0)")
    df.join(broadcast(counts), srcCol)
      .filter(u * u * col("__n_src").cast("decimal(38,0)") <
        p * p * col("__n_min").cast("decimal(38,0)"))
      .drop("__n_src", "__n_min")
  }
}
