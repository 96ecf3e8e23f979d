package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations, evaluated in ONE scan.
  *
  * A corpus pipeline gates every load on invariants (ids present and
  * unique, derived columns consistent, enum domains closed, length
  * floors); the operator turns a list of named row predicates into a
  * single aggregation pass that reports, per check: how many rows
  * violate it and the smallest offending key (a deterministic repro
  * pointer — "open THIS row", not "trust me").
  *
  * Scale shape: all row checks share one scan and ONE global
  * hash-aggregate — per task each check contributes two partial
  * accumulators (violation count, min offending key), so the exchange
  * carries `2·|checks|` values per task no matter how many rows flow
  * through. Key uniqueness is not row-local; [[uniqueness]] adds the
  * one groupBy(key) exchange it genuinely needs, partial-aggregated
  * and with the duplicate-row count derived without a second scan.
  */
object Expectations {

  /** A named expectation: `ok` is true on rows that SATISFY it. */
  final case class Check(name: String, ok: Column)

  /** Evaluate row-local checks in one pass over `df`:
    * `(check, n_violations, sample_key)` per check, `sample_key` the
    * MIN `keyCol` value among violating rows (null when none). */
  def rowChecks(df: DataFrame, keyCol: String, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "rowChecks needs at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate check names: ${checks.map(_.name)}")
    val aggs = checks.flatMap { c =>
      // a null predicate result (null-involved comparison) is NOT
      // satisfied — expectations fail closed
      val bad = not(coalesce(c.ok, lit(false)))
      Seq(
        // coalesce: sum over an EMPTY table is null, but an empty
        // table violates nothing — the report must say 0
        coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L))
          .as(s"__n_${c.name}"),
        min(when(bad, col(keyCol))).as(s"__k_${c.name}"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.map { c =>
      struct(
        lit(c.name).as("check"),
        col(s"__n_${c.name}").as("n_violations"),
        col(s"__k_${c.name}").as("sample_key"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Key-uniqueness expectation: one row
    * `(check, n_violations, sample_key)` where `n_violations` counts
    * the EXTRA rows (rows minus distinct keys — 0 when unique) and
    * `sample_key` is the smallest duplicated key. */
  def uniqueness(df: DataFrame, keyCol: String, name: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
      .agg(
        coalesce(sum(col("__c") - 1L), lit(0L)).as("n_violations"),
        min(when(col("__c") > 1L, col(keyCol))).as("sample_key"))
      .select(lit(name).as("check"), col("n_violations"), col("sample_key"))

  /** Row checks plus uniqueness in one violations report. */
  def validate(
      df: DataFrame, keyCol: String, checks: Seq[Check],
      uniqueKey: Option[String] = None): DataFrame = {
    val base = rowChecks(df, keyCol, checks)
    uniqueKey match {
      case Some(k) => base.unionByName(uniqueness(df, k, s"${k}_unique"))
      case None    => base
    }
  }
}
