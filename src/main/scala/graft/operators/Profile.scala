package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: per-column row/null/distinct counts and min/max —
  * the data-quality primitive behind "did this load look sane"
  * dashboards and schema-drift alerts over warehouse tables.
  *
  * Scale design: the table is MELTED to (column, value-as-string)
  * pairs in a scan-local projection, then one grouped aggregation
  * computes every statistic. This deliberately avoids the
  * N-aggregate alternative (`agg(countDistinct(a), countDistinct(b),
  * ...)`), which Catalyst plans as an Expand of N copies of every row
  * feeding N distinct aggregates — the melt does the same data
  * multiplication but through ONE uniform shuffle keyed by
  * (column, value), where partial map-side aggregation collapses
  * repeated values before the exchange. Distinct counting is exact
  * (two-phase hash aggregate); swap in approx_count_distinct upstream
  * if a 2% error is acceptable at extreme cardinalities.
  *
  * Values are compared as their string forms (UTF-8 byte order in
  * both Spark and ANSI engines — identical for min/max). Floating
  * columns round-trip through engine-specific formatting
  * (`1.0E7` vs `10000000.0`): profile integral/string/date columns
  * for cross-engine-reproducible output, or pre-cast.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such column(s): ${missing.mkString(", ")}")
    // melt: one (col_name, value) row per profiled cell, scan-local
    val pairs = df.select(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("val")).as(c)): _*)
      .select(explode(array(cols.map(col): _*)).as("cell"))
      .select(col("cell.col_name"), col("cell.val"))
    pairs
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("val")).as("n_nonnull"),
        countDistinct(col("val")).as("n_distinct"),
        min(col("val")).as("min_val"),
        max(col("val")).as("max_val"))
  }
}
