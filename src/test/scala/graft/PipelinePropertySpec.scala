package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Dedup, Sampling, TextAnalysis}
import graft.pipeline.CurationPipeline

/** Pipeline composition property: for RANDOM valid chains drawn from a
  * safe op subset (schema-preserving or annotation-adding, stateless),
  * executing the chain through [[CurationPipeline.run]] — YAML-shaped
  * Spec, topo order, staged parquet materialization between steps —
  * must produce exactly the frame the hand-composed operator calls
  * produce on the same corpus. CliSpec pins fixed chains; this pins
  * the composition rules themselves (input defaulting, step
  * materialization fidelity, param plumbing) across the chain space.
  * Few cases: every case runs a full multi-step pipeline. */
class PipelinePropertySpec extends SparkSpec {

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft-pipeprop").toString

  private def check(name: String, prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  /** The independent reference: each safe op re-expressed as direct
    * operator calls (the same composition a library user hand-writes). */
  private def refOp(df: DataFrame, op: String, p: Map[String, String]): DataFrame = op match {
    case "dedup_exact" =>
      df.join(Dedup.exact(df, "doc_id", "text").select(col("keep_id").as("doc_id")),
        Seq("doc_id"), "left_semi")
    case "normalize" => df.withColumn("text", TextAnalysis.normalized(col("text")))
    case "redact"    => df.withColumn("text", TextAnalysis.redact(col("text")))
    case "token_estimate" =>
      df.withColumn("n_tokens_est", TextAnalysis.bpeTokenEstimate(col("text")))
    case "curate" =>
      val keep = TextAnalysis.curate(df, "doc_id", "text",
        p("minTokens").toInt, p("minQuality").toDouble)
        .filter(col("keep")).select(col("doc_id"))
      df.join(keep, Seq("doc_id"), "left_semi")
    case "sample_hash" =>
      Sampling.hashSample(df, "doc_id", p("fraction").toDouble, p("salt"))
    case "extract_html" =>
      df.withColumn("text", TextAnalysis.extractHtml(col("text"), p("minChars").toInt))
    case "dup_spans_remove" =>
      // column ORDER mirrors the pipeline op exactly (drop, join, rename)
      val cleaned = Dedup.removeDuplicatedSpans(df, "doc_id", "text", p("n").toInt, 2)
      df.drop("text")
        .join(cleaned.select(col("doc_id"), col("text_clean")), Seq("doc_id"))
        .withColumnRenamed("text_clean", "text")
  }

  test("property: random safe step chains through the pipeline equal hand-composed calls") {
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      val base = (i % 7) match {
        case 0 => "contact me at alice@example.com for the full data set today please"
        case 1 => "The  Quick   Brown Fox Jumps Over The Lazy Dog Every Day"
        case 2 => "short"
        case 3 => "one two three four five six seven eight nine ten eleven twelve"
        case 4 => "repeat repeat repeat repeat repeat repeat repeat repeat repeat"
        case 5 => "Unique text number five with MIXED case And   spacing everywhere"
        case _ => "tail words " + ("pad " * (i % 5).toInt).trim
      }
      // every 11th doc shares content with an earlier one (exact dups)
      (i, if (i % 11 == 0) base else base + " v" + (i % 13))
    }.toDF("doc_id", "text")
    val src = tempDir()
    docs.write.parquet(s"$src/corpus.parquet")

    val opGen: Gen[(String, Map[String, String])] = Gen.oneOf(
      Gen.const("dedup_exact" -> Map.empty[String, String]),
      Gen.const("normalize" -> Map.empty[String, String]),
      Gen.const("redact" -> Map.empty[String, String]),
      Gen.const("token_estimate" -> Map.empty[String, String]),
      for {
        mt <- Gen.oneOf("1", "3", "5"); mq <- Gen.oneOf("0.0", "0.2")
      } yield "curate" -> Map("minTokens" -> mt, "minQuality" -> mq),
      for {
        f <- Gen.oneOf("0.3", "0.6", "0.9"); s <- Gen.oneOf("a", "b")
      } yield "sample_hash" -> Map("fraction" -> f, "salt" -> s),
      Gen.oneOf("3", "8").map(mc => "extract_html" -> Map("minChars" -> mc)),
      Gen.oneOf("4", "6").map(n => "dup_spans_remove" -> Map("n" -> n)))
    val chainGen = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, opGen))

    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq

    check("pipeline==composed", Prop.forAll(chainGen) { chain =>
      val steps = chain.zipWithIndex.map { case ((op, params), i) =>
        CurationPipeline.Step(s"s$i", op,
          if (i == 0) Some("corpus") else None, params)
      }
      val spec = CurationPipeline.Spec("prop_chain", "doc_id", "text", steps)
      val out  = tempDir()
      val written = CurationPipeline.run(spark, spec, src, out)
      val got  = spark.read.parquet(s"$out/${written.last}")
      val want = chain.foldLeft(docs) { case (df, (op, p)) => refOp(df, op, p) }
      val (g, w) = (rows(got), rows(want))
      if (g != w)
        System.err.println(s"chain $chain mismatch:\n got=${g.take(3)}\n want=${w.take(3)}")
      g == w
    }, n = 5)
  }
}
