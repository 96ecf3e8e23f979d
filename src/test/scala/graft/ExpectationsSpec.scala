package graft

import org.apache.spark.sql.functions._

import graft.operators.Expectations
import graft.operators.Expectations.Check

/** One-scan data-quality expectations ([[Expectations]]). */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dirty = Seq(
    (1L, "alice", 25),
    (2L, "bob", -3),     // bad age
    (2L, "bob2", 40),    // duplicate id
    (3L, null, 61),      // null name
    (7L, "carol", -1)    // bad age
  ).toDF("id", "name", "age")

  test("rowChecks counts violations and reports the min offending key") {
    val got = Expectations.rowChecks(dirty, "id", Seq(
      Check("age_nonneg", col("age") >= 0),
      Check("name_present", col("name").isNotNull),
      Check("id_positive", col("id") > 0)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got("age_nonneg") === (2L, 2L))     // ids 2 and 7 -> min 2
    assert(got("name_present") === (1L, 3L))
    assert(got("id_positive") === (0L, -1L))   // clean -> null sample
  }

  test("null predicate results fail closed") {
    val df = Seq((1L, Some(5)), (2L, None)).toDF("id", "v")
    val got = Expectations.rowChecks(df, "id",
      Seq(Check("v_big", col("v") > 3))).head()
    // row 2: (null > 3) is null -> counted as a violation
    assert(got.getLong(1) === 1L && got.getLong(2) === 2L)
  }

  test("uniqueness counts extra rows and names the smallest duplicated key") {
    val got = Expectations.uniqueness(dirty, "id", "id_unique").head()
    assert(got.getString(0) === "id_unique")
    assert(got.getLong(1) === 1L)   // one extra row for id=2
    assert(got.getLong(2) === 2L)
    // a unique table reports 0 / null
    val clean = Expectations.uniqueness(
      Seq(1L, 2L, 3L).toDF("id"), "id", "u").head()
    assert(clean.getLong(1) === 0L && clean.isNullAt(2))
  }

  test("an empty table violates nothing: zero counts, not nulls") {
    val empty = dirty.filter(col("id") < 0)
    val got = Expectations.validate(empty, "id",
      Seq(Check("age_nonneg", col("age") >= 0)), uniqueKey = Some("id"))
      .collect()
    assert(got.length === 2)
    assert(got.forall(r => r.getLong(1) == 0L && r.isNullAt(2)))
  }

  test("validate stitches row checks and uniqueness into one report") {
    val got = Expectations.validate(dirty, "id",
      Seq(Check("age_nonneg", col("age") >= 0)), uniqueKey = Some("id"))
      .collect().map(_.getString(0)).sorted
    assert(got === Array("age_nonneg", "id_unique"))
  }

  test("all row checks share one scan and ONE aggregation exchange") {
    val d = sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")
    val plan = Expectations.rowChecks(d, "doc_id", Seq(
      Check("a", col("n_chars") >= 0),
      Check("b", col("lang").isNotNull),
      Check("c", length(col("text")) === col("n_chars"))))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan.take(500))
    assert("FileScan".r.findAllIn(plan).size == 1, plan.take(500))
  }
}
