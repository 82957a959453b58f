package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expression builders for the training-data pipeline
  * operators (SURVEY §7 step 8): tokenization, shingling, token
  * counting, quality ratios, language scoring, and deterministic
  * arithmetic hashes.
  *
  * Everything is built from codegen'd built-ins (higher-order array
  * functions included) — no UDFs — and every hash uses explicit modular
  * arithmetic bounded to int64 so an external SQL engine (the DuckDB
  * oracle) can reproduce values bit-for-bit.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text; empty text -> empty array. */
  def tokens(c: Column): Column =
    when(trim(c) === "", array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Whitespace token count. */
  def wordCount(c: Column): Column = size(tokens(c)).cast("int")

  /** BPE-ish token count: letter runs, single digits, single symbols. */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit(BpeTokenPattern)).cast("int")

  /** Word k-gram shingles (distinct), space-joined; < k tokens -> empty. */
  def shingles(c: Column, k: Int): Column = {
    val tk = tokens(c)
    when(size(tk) >= k,
      array_distinct(transform(sequence(lit(1), size(tk) - (k - 1)),
        i => concat_ws(" ", slice(tk, i, lit(k))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Polynomial rolling hash of a string: fold (acc*base + codepoint)
    * mod p over characters. base*p stays far below 2^63, so the fold
    * never overflows and any engine with 64-bit ints reproduces it
    * (the DuckDB oracles re-derive it with list_reduce arithmetic).
    * Implemented as a custom expression — the combinator form walked
    * one codepoint per codegen loop iteration with a substring
    * allocation each. */
  def polyHash(c: Column, base: Int = 31, p: Long = 1000000007L): Column =
    graft.functions.cat.GraftExpr.polyHash(c, base, p)

  /** Stopword lists for the n-gram language heuristic. */
  val LangStopwords: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|is|in|that|for|with|on)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|mit|auf|zu)\\b",
    "es" -> "\\b(el|la|los|las|es|en|que|de|un|una)\\b",
    "fr" -> "\\b(le|la|les|et|est|dans|que|une|pour|pas)\\b")

  def langScore(c: Column, pattern: String): Column =
    regexp_count(lower(c), lit(pattern)).cast("int")

  /** Argmax language with deterministic tie-break (list order wins). */
  def langId(c: Column): Column = {
    val scores = LangStopwords.map { case (lang, pat) => lang -> langScore(c, pat) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, score), acc) =>
      when(score === best && score > 0, lit(lang)).otherwise(acc)
    }
  }

  val PunctPattern = "[.!?,;:]"

  /** Quality features + a fixed linear score. All ratios are int/int
    * divisions evaluated in a fixed order so IEEE doubles match across
    * engines. */
  def alphaRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(regexp_count(c, lit("[A-Za-z]")).cast("double") / length(c).cast("double"))
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(regexp_count(c, lit(PunctPattern)).cast("double") / length(c).cast("double"))
  def stopwordRatio(c: Column): Column = {
    val wc = wordCount(c)
    when(wc === 0, lit(0.0))
      .otherwise(langScore(c, LangStopwords.head._2).cast("double") / wc.cast("double"))
  }
  def qualityScore(c: Column): Column =
    alphaRatio(c) * 0.5 + stopwordRatio(c) * 0.3 + punctRatio(c) * 0.2

  /** Within-document repetition (the Gopher-report repetition family):
    * the fraction of word k-gram occurrences that duplicate an earlier
    * occurrence in the same document. Boilerplate/spam pages repeat
    * themselves; high `dup_frac` is a standard corpus-quality drop
    * rule. Pure per-row map-side arithmetic — no shuffle, and the
    * whole gram list lives only inside the expression. Docs with < k
    * tokens score 0. */
  def dupShingleFraction(c: Column, k: Int = 3): Column = {
    val tk = tokens(c)
    val grams = transform(sequence(lit(1), size(tk) - (k - 1)),
      i => concat_ws(" ", slice(tk, i, lit(k))))
    when(size(tk) >= k,
      (size(grams) - size(array_distinct(grams))).cast("double") /
        size(grams).cast("double"))
      .otherwise(lit(0.0))
  }

  /** PII scrubbing for training corpora: URLs, then emails, then
    * phone-like number runs, each replaced with a stable token (URLs
    * first — they can contain '@' and digit runs). Patterns use no
    * lookaround or backreferences, so RE2-based engines (the DuckDB
    * oracle) match the JVM regex exactly; `regexp_replace` is
    * codegen'd, keeping the scrub in the scan stage. */
  val UrlPattern = "https?://[^\\s]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")
}
