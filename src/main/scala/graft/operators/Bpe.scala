package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning, Spark-first — the tokenizer-
  * training step of an LLM data pipeline (Sennrich et al.'s subword
  * BPE; the GPT-2 tokenizer is this over bytes).
  *
  * The classical algorithm looks corpus-sized but is not: merges are
  * learned from the WORD-FREQUENCY table (distinct words with counts),
  * which is vocabulary-sized — millions of rows for a 100 TB corpus,
  * not trillions. The split of labor here follows that shape:
  *
  *  - DATA PLANE (distributed): the corpus is touched exactly once —
  *    one groupBy builds the word-frequency table ([[wordCounts]]);
  *    [[encode]] later tokenizes any corpus size via a broadcast join
  *    against the vocab-sized segmentation table. Both scale with the
  *    cluster.
  *  - CONTROL PLANE (driver-local): the merge loop itself is
  *    inherently sequential — each argmax depends on the previous
  *    re-segmentation — so running it as `numMerges` Spark jobs would
  *    mean a 32k-deep scheduler round-trip chain (days of wall-clock
  *    at ANY data size, all of it latency). Instead the vocab-sized
  *    table is collected ONCE and the loop runs in-process with the
  *    classical incremental algorithm: a lazy max-heap over pair
  *    counts plus a pair→words inverted index, so each merge touches
  *    only the words containing that pair. 32k merges over a
  *    multi-million-word vocabulary is seconds of driver CPU and
  *    zero additional jobs.
  *
  * Determinism: argmax ties break on (pair count desc, left, right)
  * under UTF-8 binary string order — a total order, so the learned
  * table is a pure function of the data. Greedy re-segmentation is
  * left-to-right and non-overlapping ("a a a" + (a,a) → ["aa","a"]).
  * The trajectory is pinned merge-for-merge against an independent
  * recompute-from-scratch reference in CorpusStatsSpec, and q5M's
  * DuckDB oracle replays the same loop as chained SQL CTEs.
  */
object Bpe {

  /** What a word's ATOMIC symbols are before any merge. */
  sealed trait SymbolMode

  /** Code-point symbols — Sennrich et al.'s subword BPE. */
  case object CharLevel extends SymbolMode

  /** UTF-8 byte symbols rendered in the GPT-2 byte→unicode alphabet
    * (every byte maps to a distinct printable code point, so merges
    * and learned tokens stay plain strings). Byte-level is what
    * production tokenizers (GPT-2 family) train: multi-byte
    * characters start split across symbols and merges may cross
    * character boundaries. */
  case object ByteLevel extends SymbolMode

  /** GPT-2's byte→unicode bijection: bytes that are printable latin-1
    * (33–126, 161–172, 174–255) map to their own code point; the 68
    * remaining bytes map to 256+k in first-seen order. Public shape —
    * any byte-level BPE implementation ships this exact table. */
  private[graft] val byteToUnicode: Array[String] = {
    val printable =
      ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    (0 to 255).map { b =>
      if (printable(b)) b.toChar.toString
      else { val s = (256 + n).toChar.toString; n += 1; s }
    }.toArray
  }

  /** Hard ceiling on word-frequency rows [[learnMerges]] may collect
    * to the driver (same contract as `Replay.boundedCollect`): fail
    * loudly, never OOM silently. 20M (word, count) tuples is a few
    * GB of driver heap — far beyond any curated corpus vocabulary,
    * but well below what a raw 100 TB web crawl's distinct-token
    * count (typos, URLs, unicode junk — billions) would reach.
    * The release valve for such corpora is `minCount`: a frequency
    * cutoff (standard in BPE training — merges over hapax junk are
    * never wanted) collapses the collected table back to true
    * vocabulary size BEFORE it moves, applied map-side under the
    * word-count aggregation. */
  val MaxVocabRows: Int = 20000000

  /** Single-character symbols of a word. "(?!^)" splits at every
    * boundary except the start — but Java split also yields a trailing
    * "" for the end-of-string boundary, hence the remove. */
  private def charSymbols(word: Column): Column =
    array_remove(split(word, "(?!^)"), "")

  /** The word-frequency table: (word, n) over whitespace tokens,
    * keeping words seen at least `minCount` times. The cutoff runs
    * INSIDE the distributed aggregation — rare-word rows never reach
    * the driver. */
  def wordCounts(df: DataFrame, textCol: String,
                 minCount: Long = 1L): DataFrame = df
    .filter(trim(col(textCol)) =!= "")
    .select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
      .as("word"))
    .groupBy("word").agg(count(lit(1)).as("n"))
    .filter(col("n") >= minCount)

  /** Learn `numMerges` merges. Returns (merges, segmentation):
    * `merges` = (step, left, right, pair_count) in learned order;
    * `segmentation` = (word, symbols) — every distinct word that
    * survived `minCount` in its final subword split, the broadcast
    * table [[encode]] joins on (words under the cutoff hit
    * [[encode]]'s documented OOV fallback). Stops early when no
    * adjacent pair remains.
    *
    * One distributed job (the word count); the merge loop is local —
    * see the class doc for why that is the scale-correct shape. The
    * collect is bounded by `maxVocabRows` ([[MaxVocabRows]]) and
    * refuses loudly past it; `minCount` is the documented lever that
    * keeps raw-crawl vocabularies under the bound. */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int,
                  minCount: Long = 1L,
                  maxVocabRows: Int = MaxVocabRows,
                  mode: SymbolMode = CharLevel): (DataFrame, DataFrame) = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    val spark = df.sparkSession
    import spark.implicits._
    val wc = wordCounts(df, textCol, minCount).as[(String, Long)]
      .limit(maxVocabRows + 1).collect()
    require(wc.length <= maxVocabRows,
      s"BPE word-frequency table exceeds the $maxVocabRows-row driver " +
        s"bound (minCount=$minCount); raise minCount — hapax/rare " +
        "words never shape merges you want to learn")
    val (merges, seg) = learnMergesLocal(wc, numMerges, mode)
    (spark.createDataset(merges).toDF("step", "left", "right", "pair_count"),
      spark.createDataset(seg).toDF("word", "symbols"))
  }

  /** UTF-8 binary string order (what Spark's UTF8String and DuckDB's
    * default collation both use) — equivalent to code-point order,
    * which Java's UTF-16 `compareTo` is NOT for supplementary chars. */
  private[graft] def utf8Compare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Code-point symbols of a word (mirrors [[charSymbols]], which via
    * Java regex never splits inside a surrogate pair). */
  private def codePoints(w: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** UTF-8 byte symbols of a word in the GPT-2 alphabet. */
  private def byteSymbols(w: String): Array[String] =
    w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => byteToUnicode(b & 0xff))

  private def atomSymbols(w: String, mode: SymbolMode): Array[String] =
    mode match {
      case CharLevel => codePoints(w)
      case ByteLevel => byteSymbols(w)
    }

  /** One greedy left-to-right, non-overlapping application of (l, r). */
  private def applyMergeLocal(syms: Array[String], l: String,
                              r: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** The classical incremental merge loop over a collected
    * word-frequency table. Lazy-deletion max-heap for the argmax
    * (stale entries are skipped on pop, the live count is always
    * re-pushed on change) + pair→word-indices inverted index so a
    * merge only touches the words that contain its pair. */
  private[graft] def learnMergesLocal(
      wc: Array[(String, Long)], numMerges: Int,
      mode: SymbolMode = CharLevel)
      : (Seq[(Int, String, String, Long)], Seq[(String, Seq[String])]) = {
    val words = wc.map(_._1)
    val freq = wc.map(_._2)
    val syms: Array[Array[String]] = words.map(atomSymbols(_, mode))

    val pairCnt = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // max-heap: higher count wins; ties prefer the UTF8-smaller (l, r)
    val heapOrd = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val cl = utf8Compare(y._2, x._2)
          if (cl != 0) cl else utf8Compare(y._3, x._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)

    // every live value gets a heap entry (pushed on every change, up
    // or down), so pops can simply discard entries that don't match
    // the live count — the classical lazy-deletion heap invariant
    def bump(p: (String, String), delta: Long): Unit = {
      val v = pairCnt.getOrElse(p, 0L) + delta
      if (v <= 0L) pairCnt.remove(p)
      else {
        pairCnt(p) = v
        heap.enqueue((v, p._1, p._2))
      }
    }
    def indexWord(i: Int, sign: Int): Unit = {
      val s = syms(i)
      var j = 0
      while (j + 1 < s.length) {
        val p = (s(j), s(j + 1))
        bump(p, sign * freq(i))
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
        else pairWords.get(p).foreach { ws =>
          ws -= i
          if (ws.isEmpty) pairWords.remove(p)
        }
        j += 1
      }
    }
    var i = 0
    while (i < words.length) { indexWord(i, 1); i += 1 }

    def popBest(): Option[(String, String, Long)] = {
      while (heap.nonEmpty) {
        val (cnt, l, r) = heap.dequeue()
        if (pairCnt.get((l, r)).contains(cnt)) return Some((l, r, cnt))
      }
      None
    }

    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      popBest() match {
        case None => done = true
        case Some((l, r, cnt)) =>
          merges += ((step, l, r, cnt))
          val affected = pairWords.get((l, r)).map(_.toArray)
            .getOrElse(Array.empty[Int])
          var k = 0
          while (k < affected.length) {
            val w = affected(k)
            indexWord(w, -1)
            syms(w) = applyMergeLocal(syms(w), l, r)
            indexWord(w, 1)
            k += 1
          }
          step += 1
      }
    }
    (merges.result(),
      words.toSeq.zipWithIndex.map { case (w, j) => (w, syms(j).toSeq) })
  }

  /** Segment ARBITRARY words under a frozen merge table by replaying
    * the merges in rank order — the production tokenizer-application
    * case: the vocab is learned once, then corpora the trainer never
    * saw get tokenized under it, and unseen words must still merge as
    * far as the learned pairs reach (char-fallback, [[encode]]'s OOV
    * rule, under-merges them).
    *
    * Rank-ORDER replay, not rank-greedy ("repeatedly merge the
    * lowest-ranked pair present"): the two differ when a later merge
    * manufactures a symbol string that collides with an element of an
    * earlier pair (distinct derivations can yield equal strings —
    * (ab,c) and (a,bc) both mint "abc"), and training segmentation is
    * DEFINED by in-order application, so in-order is what reproduces
    * it exactly on trained words. Matches the DuckDB oracle's chained
    * replace CTEs constructively.
    *
    * Scale shape: runs over DISTINCT words (vocab-sized, the same
    * cardinality class as [[wordCounts]]); merges broadcast; per
    * partition a pair→words inverted index makes the replay cost
    * O(applied merges), not O(words × numMerges) — the per-partition
    * twin of [[learnMergesLocal]]'s data structure, minus the heap.
    * Output: (word, symbols), [[encode]]'s segmentation contract. */
  def segmentWords(words: DataFrame, merges: Seq[(String, String)],
                   mode: SymbolMode = CharLevel): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    words.select(col("word")).distinct().as[String].mapPartitions { it =>
      val ws = it.toArray
      val syms = ws.map(atomSymbols(_, mode))
      val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
      def indexWord(i: Int, add: Boolean): Unit = {
        val s = syms(i)
        var j = 0
        while (j + 1 < s.length) {
          val p = (s(j), s(j + 1))
          if (add) pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
          else pairWords.get(p).foreach { set =>
            set -= i
            if (set.isEmpty) pairWords.remove(p)
          }
          j += 1
        }
      }
      ws.indices.foreach(indexWord(_, add = true))
      for ((l, r) <- bc.value) {
        val affected = pairWords.get((l, r)).map(_.toArray)
          .getOrElse(Array.empty[Int])
        var k = 0
        while (k < affected.length) {
          val i = affected(k)
          indexWord(i, add = false)
          syms(i) = applyMergeLocal(syms(i), l, r)
          indexWord(i, add = true)
          k += 1
        }
      }
      ws.iterator.zipWithIndex.map { case (w, i) => (w, syms(i).toSeq) }
    }.toDF("word", "symbols")
  }

  /** Tokenize `df(textCol)` under a FROZEN merge table (rank-ordered
    * (left, right) pairs): distinct words are segmented by merge
    * replay ([[segmentWords]]) — covering words the vocab's training
    * corpus never contained — then the corpus streams past the
    * broadcast segmentation exactly as [[encode]] does. Same output
    * contract: (idCol, token, pos). */
  def encodeFrozen(df: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(String, String)],
                   mode: SymbolMode = CharLevel): DataFrame = {
    val words = df
      .filter(trim(col(textCol)) =!= "")
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("word"))
    // the segmentation is built over THIS corpus's own words, so
    // encode's char-shaped OOV fallback never fires — which is what
    // keeps byte mode exact here without a byte-level Column kernel
    encode(df, idCol, textCol, segmentWords(words, merges, mode))
  }

  /** Tokenize `df(textCol)` under a learned `segmentation`: words not
    * in the table fall back to character symbols (the OOV rule that
    * matches how [[learnMerges]] would have segmented an unseen word
    * with zero applicable merges... conservatively: no merge counts
    * exist for it, so characters are the honest split). The fallback
    * is char-shaped, so for [[ByteLevel]] vocabularies tokenize via
    * [[encodeFrozen]] (whose segmentation covers every corpus word,
    * keeping this branch cold) rather than calling this directly.
    * Output: (idCol, token, pos) — one row per subword token.
    *
    * `pos` CONTRACT: `pos = wpos * 1_000_000 + spos` is a single
    * sortable key encoding (word index, subword index). It is unique
    * and order-correct only while every word splits into fewer than
    * 1,000,000 subwords — trivially true for natural-language tokens
    * (a word of N characters yields at most N subwords, and
    * whitespace tokens are nowhere near 1M chars). Feeding
    * megabyte-long unbroken blobs through this encoder would need a
    * wider radix, not this function. */
  def encode(df: DataFrame, idCol: String, textCol: String,
             segmentation: DataFrame): DataFrame = df
    .filter(trim(col(textCol)) =!= "")
    .select(col(idCol),
      posexplode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as(Seq("wpos", "word")))
    .join(broadcast(segmentation), Seq("word"), "left")
    .select(col(idCol), col("wpos"),
      coalesce(col("symbols"), charSymbols(col("word"))).as("symbols"))
    .select(col(idCol),
      posexplode(col("symbols")).as(Seq("spos", "token")), col("wpos"))
    .select(col(idCol), col("token"),
      (col("wpos") * 1000000 + col("spos")).cast("long").as("pos"))
}
