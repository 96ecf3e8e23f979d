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

  /** All per-document text statistics in one scan-only projection.
    * Normalization and occurrence counts are materialized once per row
    * (staged projections) instead of once per feature — the naive
    * compose-the-helpers version re-runs the normalization regex ~50x
    * per row. Formulas are identical to the helper functions. */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val langs = Seq("en", "de", "es", "fr", "zh")
    def occP(word: String): Column = {
      val needle = s" $word "
      ((length(col("__p")) - length(call_function("replace", col("__p"), lit(needle))))
        / lit(needle.length)).cast("long")
    }
    val staged = docs
      .select(col(idCol), col(textCol).as("__t"))
      .withColumn("__n", normalized(col("__t")))
      .withColumn("__p", concat(lit(" "), col("__n"), lit(" ")))
      .withColumn("n_tokens",
        when(col("__n") === "", lit(0)).otherwise(size(split(col("__n"), " "))))
      .withColumn("n_chars", length(col("__n")))
      .withColumn("punct_ratio",
        when(col("n_chars") === 0, lit(0.0))
          .otherwise(
            length(regexp_replace(col("__n"), "[a-z0-9 ]", "")).cast("double") / col("n_chars")))
      .withColumn("avg_token_len",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise((col("n_chars") - (col("n_tokens") - 1)).cast("double") / col("n_tokens")))
    val withScores = langs.foldLeft(staged) { (d, l) =>
      d.withColumn(s"__s_$l", stopwords(l).map(occP).reduce(_ + _))
    }
    val best = langs.foldRight(lit(langs.last)) { (l, acc) =>
      when(langs.filter(_ != l).map(o => col(s"__s_$l") >= col(s"__s_$o")).reduce(_ && _), lit(l))
        .otherwise(acc)
    }
    withScores
      .withColumn("stopword_ratio",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("__s_en").cast("double") / col("n_tokens")))
      .withColumn("quality_score",
        lit(0.25) * least(lit(1.0), col("n_tokens").cast("double") / 100.0) +
          lit(0.25) * (lit(1.0) - col("punct_ratio")) +
          lit(0.30) * least(lit(1.0), col("stopword_ratio") * 4.0) +
          lit(0.20) * least(lit(1.0), col("avg_token_len") / 8.0))
      .withColumn("lang_pred",
        when(langs.map(l => col(s"__s_$l")).reduce(_ + _) === 0, lit("und")).otherwise(best))
      .withColumn("fingerprint", md5(col("__n")))
      // BPE-ish subword proxy: letter runs, digit runs, and single
      // non-alphanumeric marks each count as one token (the usual cheap
      // stand-in for a real tokenizer when budgeting training data)
      .withColumn("n_bpe_tokens",
        size(regexp_extract_all(col("__n"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))))
      .select(col(idCol), col("n_tokens"), col("n_chars"), col("punct_ratio"),
        col("avg_token_len"), col("stopword_ratio"), col("quality_score"),
        col("lang_pred"), col("fingerprint"), col("n_bpe_tokens"))
  }
}
