package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.TextTables

/** Hardened text-format ingestion ([[TextTables]]): explicit-schema
  * JSONL/CSV reads, corrupt-record quarantine, FAILFAST mode, and
  * quote/delimiter round-tripping.
  */
class TextTablesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def writeLines(lines: Seq[String], suffix: String): String = {
    val dir = Files.createTempDirectory("graft-texttables")
    Files.write(dir.resolve(s"part-0.$suffix"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("jsonl: clean lines parse, corrupt lines quarantine intact, counts split exactly") {
    val path = writeLines(Seq(
      """{"doc_id": 1, "text": "alpha"}""",
      """this is not json at all""",
      """{"doc_id": 2, "text": "beta"}""",
      """{"doc_id": 3 "text": "missing comma"}"""), "jsonl")
    val (clean, dead) = TextTables.quarantine(
      TextTables.readJsonl(spark, path, schema))
    val rows = clean.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "alpha", 2L -> "beta"))
    val deadLines = dead.collect().map(_.getString(0))
    assert(deadLines.length == 2)
    assert(deadLines.contains("this is not json at all"), "raw line must survive for audit")
  }

  test("jsonl FAILFAST: the first corrupt line fails the read") {
    val path = writeLines(Seq(
      """{"doc_id": 1, "text": "ok"}""", "garbage"), "jsonl")
    intercept[org.apache.spark.SparkException] {
      TextTables.readJsonl(spark, path, schema, permissive = false).collect()
    }
  }

  test("csv: embedded delimiters and quotes round-trip; corrupt rows quarantine") {
    val path = writeLines(Seq(
      "doc_id,text",
      "1,\"comma, inside\"",
      "2,\"a \"\"quoted\"\" word\"",
      "not_a_number,plain"), "csv")
    val (clean, dead) = TextTables.quarantine(
      TextTables.readCsv(spark, path, schema))
    val rows = clean.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "comma, inside", 2L -> "a \"quoted\" word"))
    assert(dead.count() == 1)
  }

  test("schemas may not claim the reader-managed corrupt column") {
    val bad = StructType(schema.fields :+ StructField(TextTables.CorruptCol, StringType))
    intercept[IllegalArgumentException](
      TextTables.readJsonl(spark, "/tmp/nowhere", bad))
    // and quarantine refuses a frame without it (a FAILFAST read)
    intercept[IllegalArgumentException](
      TextTables.quarantine(Seq((1L, "t")).toDF("doc_id", "text")))
  }

  test("jsonl round-trip preserves the documents table exactly") {
    val d = sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val tmp = Files.createTempDirectory("graft-jsonl-rt").toString
    d.write.mode("overwrite").json(tmp)
    val back = TextTables.quarantine(
      TextTables.readJsonl(spark, tmp, d.schema))._1
    assert(back.collect().map(_.toString).toSet == d.collect().map(_.toString).toSet)
    assert(back.count() == d.count())
  }
}
