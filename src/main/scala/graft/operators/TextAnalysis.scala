package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * All are pure `Column` expressions over built-in functions — fully
  * codegen'd, no UDFs, no shuffles: they scale linearly with the scan.
  * Formulas are deliberately expressible in ANSI SQL so every operator
  * has a DuckDB oracle.
  */
object TextAnalysis {

  /** Whitespace-collapsed, trimmed, lowercased text — the shared
    * normalization for all text operators. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  def tokens(text: Column): Column = split(normalized(text), " ")

  def tokenCount(text: Column): Column =
    when(normalized(text) === "", lit(0)).otherwise(size(tokens(text)))

  def charCount(text: Column): Column = length(normalized(text))

  /** Ratio of characters that are not [a-z0-9 ] after normalization. */
  def punctRatio(text: Column): Column = {
    val n = normalized(text)
    when(length(n) === 0, lit(0.0))
      .otherwise(length(regexp_replace(n, "[a-z0-9 ]", "")).cast("double") / length(n))
  }

  def avgTokenLength(text: Column): Column = {
    val nTok = tokenCount(text)
    when(nTok === 0, lit(0.0))
      .otherwise((charCount(text) - (nTok - 1)).cast("double") / nTok)
  }

  /** Non-overlapping occurrence count of ` word ` in the padded
    * normalized text (the replace-length trick — identical semantics in
    * Spark and DuckDB, no regex dialect issues). */
  def wordOccurrences(text: Column, word: String): Column = {
    val padded = concat(lit(" "), normalized(text), lit(" "))
    val needle = s" $word "
    ((length(padded) - length(call_function("replace", padded, lit(needle))))
      / lit(needle.length)).cast("long")
  }

  // compact per-language stopword lists for the n-gram/stopword
  // language heuristic
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "und", "ist", "das", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es", "una"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不")
  )

  def stopwordHits(text: Column, lang: String): Column =
    stopwords(lang).map(wordOccurrences(text, _)).reduce(_ + _)

  /** English stopword density: stopword occurrences / token count. */
  def stopwordRatio(text: Column): Column = {
    val nTok = tokenCount(text)
    when(nTok === 0, lit(0.0))
      .otherwise(stopwordHits(text, "en").cast("double") / nTok)
  }

  /** Heuristic quality score in [0,1]: length, cleanliness, stopword
    * density, average word length. The standard cheap pre-filter shape
    * for LLM corpus curation (C4-style). */
  def qualityScore(text: Column): Column =
    lit(0.25) * least(lit(1.0), tokenCount(text).cast("double") / 100.0) +
      lit(0.25) * (lit(1.0) - punctRatio(text)) +
      lit(0.30) * least(lit(1.0), stopwordRatio(text) * 4.0) +
      lit(0.20) * least(lit(1.0), avgTokenLength(text) / 8.0)

  /** Language ID: argmax of per-language stopword scores, first-listed
    * language wins ties, "und" (undetermined) when all scores are 0. */
  def langId(text: Column): Column = {
    val langs  = Seq("en", "de", "es", "fr", "zh")
    val scores = langs.map(l => l -> stopwordHits(text, l)).toMap
    val allZero = scores.values.reduce(_ + _) === 0
    val best = langs.foldRight(lit(langs.last)) { (l, acc) =>
      when(langs.filter(_ != l).map(o => scores(l) >= scores(o)).reduce(_ && _), lit(l))
        .otherwise(acc)
    }
    when(allZero, lit("und")).otherwise(best)
  }

  /** Document fingerprint: md5 of the normalized text — the exact-dedup
    * key (identical to DuckDB's md5 for cross-engine checks). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** All per-document text statistics in one scan-only projection. */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      tokenCount(t).as("n_tokens"),
      charCount(t).as("n_chars"),
      punctRatio(t).as("punct_ratio"),
      avgTokenLength(t).as("avg_token_len"),
      stopwordRatio(t).as("stopword_ratio"),
      qualityScore(t).as("quality_score"),
      langId(t).as("lang_pred"),
      fingerprint(t).as("fingerprint")
    )
  }
}
