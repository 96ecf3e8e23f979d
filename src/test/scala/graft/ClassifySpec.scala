package graft

import org.apache.spark.sql.functions._
import graft.operators.Classify

/** Nearest-class-profile classifier: hand-computable profiles and
  * scores, total coverage, deterministic ties, holdout split. */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the dog ate the bone"),
    (3L, "fr", "le chat et le chien"),
    (4L, "fr", "le pain et le vin")
  ).toDF("doc_id", "lang", "text")

  test("profiles: exact per-class token counts") {
    val prof = Classify.classProfiles(train, "lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(prof(("en", "the")) === 4L)
    assert(prof(("fr", "le")) === 4L)
    assert(prof(("en", "cat")) === 1L)
    assert(prof.keys.forall { case (l, _) => l == "en" || l == "fr" })
  }

  test("prediction: matching vocabulary wins; scores are the exact fixed-point formula") {
    val prof = Classify.classProfiles(train, "lang", "text")
    val test = Seq(
      (10L, "the cat"),          // en: tf.the*4 + tf.cat*1 = 5 of 11 total
      (11L, "le chien le chat"), // fr
      (12L, "zzz qqq")           // zero overlap -> score 0, lowest label
    ).toDF("doc_id", "text")
    val got = Classify.nearestProfile(test, "doc_id", "text", prof)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // en total = 11 tokens (6 + 5), fr total = 10 (5 + 5)
    assert(got(10L) === (("en", 5L * 1000000L / 11L)))
    // doc 11: fr dot = le*4 + chien*1 + chat*1 (le appears twice: 2*4) = 10
    assert(got(11L) === (("fr", 10L * 1000000L / 10L)))
    // zero overlap: total coverage with score 0, tie -> ascending label
    assert(got(12L) === (("en", 0L)))
    assert(got.size === 3)
  }

  test("fail-loud: empty training profiles raise instead of predicting nothing") {
    val prof = Classify.classProfiles(train.limit(0), "lang", "text")
    val ex = intercept[Exception] {
      Classify.nearestProfile(
        Seq((1L, "anything")).toDF("doc_id", "text"), "doc_id", "text", prof).collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("profile table is empty"), msgs)
  }

  test("charNgrams: exact trigram extraction over normalized text; short/NULL texts yield empty arrays") {
    val got = Seq((1L, "  The  CAT "), (2L, "ab"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Classify.charNgrams(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    // normalized "the cat": trigrams including the boundary space
    assert(got(1L) === Seq("the", "he ", "e c", " ca", "cat"))
    assert(got(2L) === Seq.empty)
    assert(got(3L) === Seq.empty)
  }

  test("char-trigram lang-ID separates short multilingual sentences where stopword lang-ID fails") {
    import graft.operators.TextAnalysis
    // short sentences with NO stopword-list hits for their language —
    // the stopword heuristic returns 'und' or a wrong majority vote;
    // char-trigram shapes (suffix/boundary patterns) still separate
    val train = Seq(
      (1L, "en", "running quickly towards bright mornings"),
      (2L, "en", "singing happily during sunny afternoons"),
      (3L, "en", "walking slowly through quiet evenings"),
      (4L, "de", "schnell laufend durch helle morgende"),
      (5L, "de", "froehlich singend waehrend sonniger nachmittage"),
      (6L, "de", "langsam gehend durch stille abende"),
      (7L, "fr", "courant rapidement vers des matinees lumineuses"),
      (8L, "fr", "chantant joyeusement pendant des apres-midis ensoleilles"),
      (9L, "fr", "marchant lentement dans des soirees tranquilles"))
      .toDF("doc_id", "lang", "text")
    val test = Seq(
      (101L, "en", "jumping eagerly towards shining daybreaks"),
      (102L, "de", "eifrig springend durch glaenzende tagesanbrueche"),
      (103L, "fr", "sautant avidement vers des aubes brillantes"))
      .toDF("doc_id", "lang", "text")
    val prof = Classify.charNgramProfiles(train, "lang", "text", n = 3)
    val pred = Classify.nearestProfileChars(test, "doc_id", "text", prof, n = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred === Map(101L -> "en", 102L -> "de", 103L -> "fr"))
    // the stopword heuristic does NOT separate these (its failure mode
    // on short stopword-free text is exactly why the trigram path
    // exists) — if this ever starts passing, the corpus above stopped
    // demonstrating the gap
    val stopw = test.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stopw.exists { case (id, l) =>
      l != Map(101L -> "en", 102L -> "de", 103L -> "fr")(id) },
      s"stopword lang-ID unexpectedly solved the stopword-free corpus: $stopw")
  }

  test("holdout: fold split is exact and disjoint") {
    val d = (0L until 20L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val (tr, te) = Classify.holdout(d, "doc_id", folds = 5, fold = 0)
    val (trIds, teIds) = (
      tr.select("doc_id").collect().map(_.getLong(0)).toSet,
      te.select("doc_id").collect().map(_.getLong(0)).toSet)
    assert(teIds === (0L until 20L by 5L).toSet)
    assert((trIds & teIds) === Set.empty)
    assert(trIds.size + teIds.size === 20)
    intercept[IllegalArgumentException] { Classify.holdout(d, "doc_id", 1, 0) }
  }

  test("nearestProfile: a profile table past the label cap raises in-plan before the coverage grid explodes") {
    import spark.implicits._
    val docs = Seq((1L, "some text")).toDF("doc_id", "text")
    val okProfiles = (0L until 3L).map(i => (s"lang$i", "some", 5L))
      .toDF("label", "token", "cnt")
    // under the cap: predicts normally
    val pred = Classify.nearestProfile(docs, "doc_id", "text", okProfiles).collect()
    assert(pred.length === 1)
    val wide = (0L to Classify.MaxProfileLabels).map(i => (s"lang$i", "some", 5L))
      .toDF("label", "token", "cnt")
    val e = intercept[Exception] {
      Classify.nearestProfile(docs, "doc_id", "text", wide).collect()
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("distinct labels"), s"expected the label-cap raise in: $chain")
  }
}
