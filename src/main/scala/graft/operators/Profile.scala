package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: per-column row/null/distinct counts and min/max —
  * the data-quality primitive behind "did this load look sane"
  * dashboards and schema-drift alerts over warehouse tables.
  *
  * Scale design, two scans:
  * - counts/distincts: the table is MELTED to (column,
  *   value-as-string) pairs in a scan-local projection feeding one
  *   grouped aggregation. This deliberately avoids the N-countDistinct
  *   alternative, which Catalyst plans as an Expand of N copies of
  *   every row feeding N distinct aggregates — the melt does the same
  *   data multiplication but through ONE uniform shuffle keyed by
  *   (column, value), where map-side partial aggregation collapses
  *   repeated values before the exchange. Distinct counting is exact
  *   in [[profile]]; [[profileApprox]] swaps in approx_count_distinct
  *   for extreme cardinalities.
  * - min/max: one single-row wide aggregation over the TYPED columns
  *   (numeric columns get numeric extremes, not lexicographic ones —
  *   min of {9, 10, 100} is 9, never "10"), cast to string AFTER
  *   aggregating for the uniform output schema. Plain min/max need no
  *   Expand, so one pass computes all 2N.
  *
  * Distinct counting keys on the STRING form (engine-independent for
  * integral/string/date columns). Floating columns round-trip through
  * engine-specific formatting (`1.0E7` vs `10000000.0`): profile
  * integral/string/date columns for cross-engine-reproducible output,
  * or pre-cast.
  */
object Profile {

  private def checkCols(df: DataFrame, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such column(s): ${missing.mkString(", ")}")
  }

  /** melt: one (col_name, value) row per profiled cell, scan-local */
  private def melted(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("val")).as(c)): _*)
      .select(explode(array(cols.map(col): _*)).as("cell"))
      .select(col("cell.col_name"), col("cell.val"))

  /** typed extremes: one wide single-row agg, unpivoted to a row per
    * column (numeric columns get numeric extremes, cast to string
    * AFTER aggregating for the uniform output schema) */
  private def extremes(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      min(col(cols.head)).cast("string").as(s"min_${cols.head}"),
      cols.tail.map(c => min(col(c)).cast("string").as(s"min_$c")) ++
        cols.map(c => max(col(c)).cast("string").as(s"max_$c")): _*)
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"),
          col(s"min_$c").as("min_val"), col(s"max_$c").as("max_val"))): _*)).as("m"))
      .select(col("m.col_name"), col("m.min_val"), col("m.max_val"))

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    checkCols(df, cols)
    val counts = melted(df, cols)
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("val")).as("n_nonnull"),
        countDistinct(col("val")).as("n_distinct"))
    // both sides are N (= |cols|) rows; broadcast skips the exchange
    counts.join(broadcast(extremes(df, cols)), Seq("col_name"), "left")
  }

  /** [[profile]] with `approx_count_distinct(rsd)` in place of the
    * exact distinct — the extreme-cardinality swap point documented
    * above, now a first-class entry: the melted pairs feed the same
    * ONE uniform shuffle, but per-group state is a bounded HLL++
    * sketch instead of a distinct hash set, so a column with billions
    * of distinct values profiles in fixed memory. Output column is
    * `n_distinct_approx`; everything else matches [[profile]]. */
  def profileApprox(
      df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    checkCols(df, cols)
    val counts = melted(df, cols)
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("val")).as("n_nonnull"),
        approx_count_distinct(col("val"), rsd).as("n_distinct_approx"))
    counts.join(broadcast(extremes(df, cols)), Seq("col_name"), "left")
  }
}
