package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nearest-class-profile text classification — the model-based
  * curation primitive (CCNet-style quality/domain filtering trains a
  * lightweight classifier and keeps/buckets documents by its label):
  * TRAIN = per-class token-count profiles (one groupBy over the
  * exploded training tokens), PREDICT = for every document the class
  * whose L1-normalized profile best matches the document's term
  * frequencies.
  *
  * The score is kept in EXACT integer arithmetic (decimal(38,0)
  * products — 64-bit would wrap silently at ~1e9-token class masses
  * where DuckDB's HUGEINT would not) so any engine
  * reproduces the argmax bit-for-bit: `score(d, c) = (Σ_t tf(d,t) ·
  * cnt(c,t)) · scale div total(c)` — the dot product against the
  * class's raw count vector, L1-normalized by the class's total token
  * mass in fixed-point (`div` = truncating integer division, ties
  * broken by ascending label). This is the Rocchio/nearest-profile
  * construction [Manning, Raghavan & Schütze, IIR ch. 14] with L1
  * instead of L2 normalization — equivalently multinomial Naive Bayes
  * with linear (not log) likelihoods — chosen because it needs no
  * floating-point log/sqrt, the portability contract every gate here
  * holds.
  *
  * Scale shape: training is one explode + one (label, token) groupBy
  * (map-side partial agg). Prediction joins the document term
  * frequencies to the profile table ON TOKEN — the profile side is
  * |classes|·|vocab| rows, co-partitioned by the join, never collected
  * — then one (doc, label) partial-agg sum and one per-doc window
  * argmax. The (doc × class) grid that guarantees every document a
  * prediction (zero-overlap docs score 0) broadcasts the tiny label
  * list. No driver-side loops; every stage is a shuffle on a declared
  * key. */
object Classify {

  /** Per-class token-count profiles `(label, token, cnt)` over the
    * training set. */
  def classProfiles(
      train: DataFrame, labelCol: String, textCol: String): DataFrame =
    train
      .select(col(labelCol).as("label"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("label", "token")
      .agg(count(lit(1)).as("cnt"))

  /** Character n-grams (spaces included — word-boundary shape is the
    * signal) over the NORMALIZED text, the Cavnar–Trenkle 1994
    * ("N-Gram-Based Text Categorization") feature for language ID:
    * n-gram `i` is `substring(normalized, i, n)`, `1 ≤ i ≤ len−n+1`.
    * Whole-word token profiles need vocabulary overlap — hopeless for
    * SHORT documents in morphology-rich languages — while char n-gram
    * distributions separate languages on a sentence. Pure codegen'd
    * Column (sequence + transform + substring), no UDF. */
  def charNgrams(text: Column, n: Int): Column =
    ngramsOf(TextAnalysis.normalized(text), n)

  /** The gram builder over an ALREADY-NORMALIZED column. The profile
    * builders project the normalization first and gram over the
    * attribute — inlining the regexp normalization into the transform
    * lambda would re-evaluate it once per ARRAY ELEMENT (~one full
    * regex pass per character of every document, a measured ~7×
    * slowdown at sf0.1), the classic higher-order-function
    * pre-projection hazard. */
  private def ngramsOf(norm: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val cnt = length(norm) - (n - 1)
    // sequence(1, 0) would DESCEND in Spark — guard short/NULL texts
    // to an explicit empty feature array instead
    when(cnt >= 1, transform(sequence(lit(1), cnt), i => norm.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-class char-n-gram profiles `(label, token, cnt)` — the
    * [[classProfiles]] shape over [[charNgrams]] features, so
    * [[nearestProfile]]-style scoring applies unchanged. */
  def charNgramProfiles(
      train: DataFrame, labelCol: String, textCol: String, n: Int = 3): DataFrame =
    train
      .select(col(labelCol).as("label"),
        TextAnalysis.normalized(col(textCol)).as("__cng_norm"))
      .select(col("label"), explode(ngramsOf(col("__cng_norm"), n)).as("token"))
      .groupBy("label", "token")
      .agg(count(lit(1)).as("cnt"))

  /** [[nearestProfile]] over char-n-gram features — language ID for
    * short documents: profiles from [[charNgramProfiles]] (same
    * `(label, token, cnt)` shape), documents featurized by the same
    * [[charNgrams]] extraction, scoring/argmax identical exact
    * fixed-point arithmetic. */
  def nearestProfileChars(
      docs: DataFrame, idCol: String, textCol: String,
      profiles: DataFrame, n: Int = 3, scale: Long = 1000000L): DataFrame = {
    require(!docs.columns.contains("__cng_norm"),
      "nearestProfileChars: input already has internal column '__cng_norm'")
    val normed = docs.select(col(idCol),
      TextAnalysis.normalized(col(textCol)).as("__cng_norm"))
    nearestProfileFeatures(normed, idCol,
      explode(ngramsOf(col("__cng_norm"), n)), profiles, scale)
  }

  /** Classify `docs`: the class with the best fixed-point
    * L1-normalized profile match, `(idCol, label_pred, score)`. Every
    * input document gets exactly one row (zero-overlap documents
    * score 0 for every class and take the lowest label). */
  def nearestProfile(
      docs: DataFrame, idCol: String, textCol: String,
      profiles: DataFrame, scale: Long = 1000000L): DataFrame =
    nearestProfileFeatures(docs, idCol,
      explode(TextAnalysis.tokens(col(textCol))), profiles, scale,
      dropEmpty = true)

  /** The shared scoring core: `feature` is a generator Column (one
    * exploded feature string per output row) evaluated over `docs`. */
  /** Ceiling on the class count: the coverage grid is docs × labels
    * and the label list broadcasts — fine at the ~10–1000 classes a
    * language/domain classifier has, an accidental cross-join if a
    * 100k-label table is passed as `profiles`. Guarded IN-PLAN (the
    * fail-loud-cap pattern): the per-label totals carry a whole-frame
    * label count and raise before the grid can explode — no extra
    * driver job, no second pass over the training lineage. */
  val MaxProfileLabels = 10000L

  private def nearestProfileFeatures(
      docs: DataFrame, idCol: String, feature: Column,
      profiles: DataFrame, scale: Long, dropEmpty: Boolean = false): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    // the unpartitioned count window is a single-partition pass over
    // the (tiny, one-row-per-class) totals frame — the whole point of
    // the guard is that this frame must stay tiny
    val totals = profiles.groupBy("label").agg(sum(col("cnt")).as("total"))
      .withColumn("__nlab",
        count(lit(1)).over(Window.partitionBy(lit(1))))
      .select(col("label"),
        when(col("__nlab") > MaxProfileLabels, raise_error(concat(
          lit("nearestProfile: the profile table has "),
          col("__nlab").cast("string"),
          lit(s" distinct labels (max $MaxProfileLabels) — the documents × " +
            "classes coverage grid is a cross-join at this class count; " +
            "shard the label space or train a coarser classifier"))))
          .otherwise(col("total")).as("total"))
    val tf0 = docs.select(col(idCol), feature.as("token"))
    val tf = (if (dropEmpty) tf0.filter(col("token") =!= "") else tf0)
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    // exact wide arithmetic: tf and cnt are corpus-scale counts, so the
    // product is computed in decimal(38,0) (the repo's exact-product
    // convention) — plain BIGINT would silently wrap at ~1e9-token class
    // masses while the DuckDB oracle (HUGEINT sum) would not, breaking
    // the bit-for-bit cross-engine argmax contract exactly at scale
    val dots = tf.join(profiles, "token")
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("tf").cast("decimal(19,0)") * col("cnt").cast("decimal(19,0)"))
        .as("dot"))
    // total coverage: every (doc, class) cell, absent dots count 0
    val grid = docs.select(col(idCol)).distinct()
      .crossJoin(broadcast(totals))
    val scores = grid
      .join(dots, Seq(idCol, "label"), "left")
      .select(col(idCol), col("label"),
        expr(s"coalesce(dot, cast(0 as decimal(38,0)))" +
          s" * cast($scale as decimal(19,0)) div total").as("score"))
    val rn = row_number().over(
      Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("label")))
    val best = scores.withColumn("__rn", rn).filter(col("__rn") === 1)
      .select(col(idCol), col("label").as("label_pred"), col("score"))
    // fail-loud coverage: an EMPTY profile table would leave the grid
    // empty and silently predict nothing — raise in-plan instead
    // (every document must get a row; a missing one can only mean no
    // training classes existed)
    docs.select(col(idCol)).distinct()
      .join(best, Seq(idCol), "left")
      .select(col(idCol),
        when(col("label_pred").isNull, raise_error(concat(
          lit("nearestProfile: no prediction for id "), col(idCol).cast("string"),
          lit(" — the profile table is empty (no training rows?)"))))
          .otherwise(col("label_pred")).as("label_pred"),
        col("score"))
  }

  /** Train-on-remainder / predict-on-fold split helper: the
    * deterministic `id % folds == fold` holdout both gate sides
    * replay. */
  def holdout(docs: DataFrame, idCol: String, folds: Int, fold: Int): (DataFrame, DataFrame) = {
    require(folds > 1 && fold >= 0 && fold < folds,
      s"need 0 <= fold < folds with folds > 1, got fold=$fold folds=$folds")
    (docs.filter(pmod(col(idCol), lit(folds)) =!= fold),
      docs.filter(pmod(col(idCol), lit(folds)) === fold))
  }
}
