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
    * One shuffle on the (hashed) text. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(textCol)
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_dups"))

  /** Distinct (doc, shingle) pairs — the inverted index rows. */
  def shingleIndex(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(TextFunctions.shingles(col(textCol), k)).as("shingle"))

  /** n-gram Jaccard near-dup: inverted-index candidate join + exact
    * Jaccard on shared-shingle counts. Returns (doc_a, doc_b, shared,
    * n_a, n_b, jaccard >= threshold). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        k: Int, threshold: Double): DataFrame = {
    val sh = shingleIndex(df, idCol, textCol, k)
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
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

  /** MinHash signatures: one row per doc with numHashes min-aggregate
    * columns. Hash family: h_j(x) = ((2j+1)*polyHash(x) + j*j+7) mod p —
    * products stay far below 2^63.
    *
    * Shape note: the whole family is computed as `numHashes` parallel
    * `min(...)` aggregations over the shingle rows — one hash-partition
    * groupBy with map-side combine — instead of exploding every shingle
    * row `numHashes`x and re-grouping (measured several times slower
    * and `numHashes`x the shuffle volume). */
  def minhashSignatures(sh: DataFrame, numHashes: Int,
                        p: Long = 1000000007L): DataFrame = {
    val h = TextFunctions.polyHash(col("shingle"))
    val mins = (0 until numHashes).map { j =>
      min((col("__h") * (2 * j + 1) + (j * j + 7)) % p).as(s"mh_$j")
    }
    sh.withColumn("__h", h)
      .groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** LSH band signatures from the per-doc minhash columns: one row per
    * (doc, band) carrying that band's signature AND the full signature
    * array — the latter lets the candidate join emit each pair only
    * from its first matching band (an in-row predicate) instead of
    * deduplicating multi-band collisions with a distinct shuffle. */
  def bandSignatures(sig: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val nb = numHashes / rowsPerBand
    val sigExprs = (0 until nb).map { b =>
      concat_ws(",", (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(j => col(s"mh_$j").cast("string")): _*)
    }
    sig.select(col("doc_id"), array(sigExprs: _*).as("sigs"))
      .select(col("doc_id"), col("sigs"),
        explode(sequence(lit(0), lit(nb - 1))).as("band"))
      .withColumn("sig", element_at(col("sigs"), col("band") + 1))
  }

  /** MinHash+LSH near-dup with exact verification: candidates = pairs
    * sharing any full band signature; verified with exact shingle
    * Jaccard >= threshold. The LSH join touches only banded signature
    * collisions — the scale path for corpora where the shingle inverted
    * index itself is too hot. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String, k: Int,
                      numHashes: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    val sh = shingleIndex(df, idCol, textCol, k)
    val nb = numHashes / rowsPerBand
    val bands = bandSignatures(minhashSignatures(sh, numHashes), numHashes, rowsPerBand)
    // keep a pair only at its FIRST matching band: exact once-per-pair
    // emission with an in-row predicate, no distinct shuffle
    val noEarlierMatch = (0 until nb - 1).map { bp =>
      (col("x.band") > bp) &&
        (element_at(col("x.sigs"), bp + 1) === element_at(col("y.sigs"), bp + 1))
    }.reduceOption(_ || _).map(e => !e).getOrElse(lit(true))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(noEarlierMatch)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shared = cand
      .join(sh.withColumnsRenamed(Map("doc_id" -> "doc_a", "shingle" -> "s_a")), "doc_a")
      .join(sh.withColumnsRenamed(Map("doc_id" -> "db", "shingle" -> "s_b")),
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

  /** SimHash: 60-bit signature from two 30-bit polynomial token hashes.
    * Per bit: sum +1/-1 over distinct tokens by that bit of the token
    * hash; bit set when the sum is positive.
    *
    * Shape note: the 60 per-bit sums are 60 parallel aggregation
    * columns over the token rows (single groupBy, map-side combine) —
    * not a 60x bit-explode (that multiplies the shuffle by the
    * signature width). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
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
