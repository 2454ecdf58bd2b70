package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: quality
  * scoring, token counting, language ID, fingerprinting. All pure
  * Catalyst expressions (regex + string built-ins) — codegen'd, no UDFs,
  * embarrassingly parallel at 100 TB.
  */
object TextOps {

  /** Canonical whitespace-token count (0 for blank). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword proxy: words + digits + punctuation runs counted
    * separately (a cheap deterministic stand-in for a real tokenizer's
    * token count).
    */
  def bpeishTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))))

  /** Normalized text: lowercase, collapse whitespace, trim. */
  def normalizeText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Driver-side twin of normalizeText for plain strings. */
  def normalizeTextString(s: String): String =
    s.trim.toLowerCase.replaceAll("\\s+", " ")

  /** Stable 128-bit document fingerprint over normalized text. */
  def fingerprint(text: Column): Column = md5(normalizeText(text).cast("binary"))

  private val punctRe = "[^\\p{L}\\p{N}\\s]"
  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "be", "this", "are", "was")

  /** Per-document quality metrics: chars, words, mean word length,
    * punctuation ratio, stopword ratio, uppercase ratio — the classic
    * C4/Gopher-style cheap filters.
    */
  def textStats(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val t = col(textCol)
    val words = tokenCount(t)
    val chars = length(t)
    df.select(
      col(keyCol),
      chars.as("n_chars"),
      words.as("n_words"),
      round(
        when(words === 0, 0.0)
          .otherwise(length(regexp_replace(t, "\\s+", "")) * lit(1.0) / words), 4)
        .as("mean_word_len"),
      round(
        when(chars === 0, 0.0)
          .otherwise((chars - length(regexp_replace(t, punctRe, ""))) * lit(1.0) / chars), 4)
        .as("punct_ratio"),
      round(
        when(chars === 0, 0.0)
          .otherwise((chars - length(regexp_replace(t, "[A-Z]", ""))) * lit(1.0) / chars), 4)
        .as("upper_ratio"),
      round(stopwordRatio(t, defaultStopwords), 4).as("stopword_ratio"))
  }

  /** Fraction of whitespace tokens that are stopwords (lowercased). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = split(normalizeText(text), " ")
    val stops = filter(toks, x => x.isin(stopwords: _*))
    when(size(toks) === 0, 0.0).otherwise(size(stops) * lit(1.0) / size(toks))
  }

  /** Duplicate word-n-gram fraction in [0,1]: 1 − |distinct n-grams| /
    * |n-grams| of the normalized text — the Gopher-style repetition
    * signal (n=1: repeated words; n=2/3: repeated phrases). Pure
    * expression over the token array (no explode, no shuffle): a
    * map-only pass at any scale. 0.0 for texts shorter than n tokens.
    */
  def repetitionScore(text: Column, n: Int = 3): Column = {
    val toks = split(normalizeText(text), " ")
    val grams = when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    when(size(grams) <= 0, lit(0.0))
      .otherwise(round(
        lit(1.0) - size(array_distinct(grams)) * lit(1.0) / size(grams), 4))
  }

  /** Fraction of n-gram occurrences taken by the single most frequent
    * n-gram — the companion Gopher signal to [[repetitionScore]] (a doc
    * whose top bigram covers 20%+ of it is boilerplate). Still a pure
    * map-only expression; the per-doc count is O(distinct²) array work,
    * bounded by doc length, not data size. 0.0 for texts shorter than n.
    */
  def topNgramCoverage(text: Column, n: Int = 2): Column = {
    val toks = split(normalizeText(text), " ")
    val grams = when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    val topCount = array_max(transform(
      array_distinct(grams),
      g => size(filter(grams, x => x === g))))
    when(size(grams) <= 0, lit(0.0))
      .otherwise(round(topCount * lit(1.0) / size(grams), 4))
  }

  /** Composite quality score in [0,1]: penalize extreme length, high
    * punctuation, zero stopwords (classic heuristics).
    */
  def qualityScore(text: Column): Column = {
    val words = tokenCount(text)
    val lenOk = when(words.between(10, 100000), 1.0).otherwise(0.0)
    val chars = length(text)
    val punct = when(chars === 0, 0.0)
      .otherwise((chars - length(regexp_replace(text, punctRe, ""))) * lit(1.0) / chars)
    val punctOk = when(punct <= 0.2, 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(text, defaultStopwords) > 0, 1.0).otherwise(0.0)
    round((lenOk + punctOk + stopOk) / 3.0, 4)
  }

  /** Stopword-profile language ID over a small built-in lexicon —
    * the n-gram-free heuristic: score(lang) = #tokens in lang lexicon,
    * pick argmax (ties → "und"-free deterministic lang-name order).
    * Pure expression; at 100 TB this is a map-only pass.
    */
  val langLexicon: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "von"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "du", "que"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "他", "这", "个", "们"))

  def langId(text: Column): Column = {
    val toks = split(normalizeText(text), " ")
    val scores = langLexicon.toSeq.sortBy(_._1).map { case (lang, lex) =>
      (lang, size(filter(toks, x => x.isin(lex: _*))))
    }
    // argmax with deterministic tie-break on ascending lang code
    val maxScore = scores.map(_._2).reduceLeft((a, b) => when(b > a, b).otherwise(a))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === maxScore && maxScore > 0, lang).otherwise(acc)
    }
  }
}
