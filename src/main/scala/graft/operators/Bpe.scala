package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning, Spark-first — the tokenizer-
  * training step of an LLM data pipeline (Sennrich et al.'s subword
  * BPE; the GPT-2 tokenizer is this over bytes).
  *
  * The classical algorithm looks corpus-sized but is not: merges are
  * learned from the WORD-FREQUENCY table (distinct words with counts),
  * which is vocabulary-sized — millions of rows for a 100 TB corpus,
  * not trillions. The corpus is touched exactly once (one groupBy to
  * build the table); each of the `numMerges` rounds then runs on the
  * vocab table alone: explode adjacent symbol pairs weighted by word
  * count, aggregate, take the argmax (ONE row to the driver — the
  * merge decision is inherently sequential), and re-segment the
  * symbol lists.
  *
  * Re-segmentation is a declarative `aggregate` fold (codegen'd, no
  * UDF): state (out, carry); seeing `right` while carrying `left`
  * emits the merged symbol — the standard greedy left-to-right,
  * non-overlapping application ("a a a" + (a,a) → ["aa","a"]).
  * Determinism: argmax ties break on (pair count desc, left, right) —
  * a total order, so the learned table is a pure function of the data.
  * The vocab frame is localCheckpointed (and plan-rebuilt) each round:
  * iterative self-referencing lineage otherwise squares the plan.
  *
  * [[encode]] never re-runs merges over the corpus: the loop's final
  * symbol lists ARE the segmentation of every distinct word, so
  * encoding is a broadcast join of corpus words against the
  * vocab-sized segmentation table — map-side at any corpus scale.
  */
object Bpe {

  /** Greedy left-to-right application of one merge (l, r) to a symbol
    * array, as a single `aggregate` fold. */
  private[graft] def applyMerge(sym: Column, l: String, r: String): Column = {
    val flush = (acc: Column) =>
      when(acc.getField("carry").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("carry"))))
    aggregate(
      sym,
      struct(array().cast("array<string>").as("out"),
        lit(null).cast("string").as("carry")),
      (acc, s) =>
        when(acc.getField("carry") === l && s === r,
          struct(concat(acc.getField("out"), array(lit(l + r))).as("out"),
            lit(null).cast("string").as("carry")))
          .otherwise(struct(flush(acc).as("out"), s.as("carry"))),
      acc => flush(acc))
  }

  /** Single-character symbols of a word. "(?!^)" splits at every
    * boundary except the start — but Java split also yields a trailing
    * "" for the end-of-string boundary, hence the remove. */
  private def charSymbols(word: Column): Column =
    array_remove(split(word, "(?!^)"), "")

  /** The word-frequency table: (word, n) over whitespace tokens. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame = df
    .filter(trim(col(textCol)) =!= "")
    .select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
      .as("word"))
    .groupBy("word").agg(count(lit(1)).as("n"))

  /** Learn `numMerges` merges. Returns (merges, segmentation):
    * `merges` = (step, left, right, pair_count) in learned order;
    * `segmentation` = (word, symbols) — every distinct word in its
    * final subword split, the broadcast table [[encode]] joins on.
    * Stops early when no adjacent pair remains. */
  def learnMerges(df: DataFrame, textCol: String,
                  numMerges: Int): (DataFrame, DataFrame) = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    var vocab = wordCounts(df, textCol)
      .select(col("word"), charSymbols(col("word")).as("symbols"), col("n"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val pairs = vocab
        // single-symbol words carry no pairs (and sequence(1, 0) would
        // generate a DESCENDING index list — Spark's sequence walks
        // backwards when start > stop)
        .filter(size(col("symbols")) >= 2)
        .select(col("n"), explode(
          transform(sequence(lit(1), size(col("symbols")) - 1), j =>
            struct(element_at(col("symbols"), j).as("l"),
              element_at(col("symbols"), j + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("n").as("cnt"))
      val best = pairs.orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, cnt) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((step, l, r, cnt))
        val next = vocab.withColumn("symbols",
          applyMerge(col("symbols"), l, r)).localCheckpoint()
        // rebuild from the checkpointed RDD so each round's plan is
        // flat, not a numMerges-deep transform chain
        vocab = spark.createDataFrame(next.rdd, next.schema)
        step += 1
      }
    }
    (merges.result().toDF("step", "left", "right", "pair_count"),
      vocab.select("word", "symbols"))
  }

  /** Tokenize `df(textCol)` under a learned `segmentation`: words not
    * in the table fall back to character symbols (the OOV rule that
    * matches how [[learnMerges]] would have segmented an unseen word
    * with zero applicable merges... conservatively: no merge counts
    * exist for it, so characters are the honest split). Output:
    * (idCol, token, pos) — one row per subword token. */
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
