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

  /** Pairwise SUFFICIENT STATISTICS of numeric columns — one row per
    * unordered column pair (c1 <= c2, self-pairs included) with the
    * moments a covariance/correlation/regression needs: `n` (rows
    * where BOTH are non-null — pairwise deletion), `sum1`, `sum2`,
    * `sum11`, `sum22`, `sum12`. Everything is exact decimal
    * (inputs at decimal(18,6), products at decimal(38,12)): the caller
    * derives cov = (sum12 - sum1*sum2/n)/n and Pearson r from them in
    * one scalar step, while the statistics themselves stay
    * bit-reproducible across engines and RE-AGGREGABLE — moments of
    * two corpus halves ADD, so a maintained moments table folds a
    * delta batch without rescanning history (the
    * [[graft.exec.Rollup]] contract applied to second moments; this
    * is also why the variance itself is not the stored shape: it
    * doesn't add, its moments do).
    *
    * Scale shape: ONE scan, one global aggregation — k(k+1)/2 * 6
    * partial-aggregated expressions, each a map-side fold; no shuffle
    * moves data rows, only the per-task partials. Overflow headroom:
    * decimal(38,12) holds |Σ x·y| < 10^26 at 6-dp inputs — profile
    * scale; partition the scan and merge moments when a single fold
    * would exceed it. */
  /** True when the native 128-bit product-sum aggregate is registered
    * in THE FRAME'S OWN session (not `SparkSession.active` — a wrong
    * guess here is an analysis error at `call_function` resolution,
    * not a graceful degrade, so the check must hit the registry the
    * plan will resolve against). */
  private def sp128Registered(df: DataFrame): Boolean = scala.util.Try(
    df.sparkSession.catalog
      .functionExists(graft.functions.SumProduct128.FUNC_NAME)).getOrElse(false)

  def moments(df: DataFrame, cols: Seq[String]): DataFrame = {
    checkCols(df, cols)
    require(cols.distinct == cols, s"duplicate columns: $cols")
    val pairs = (for {
      (c1, i) <- cols.zipWithIndex
      c2      <- cols.drop(i)
    } yield (c1, c2)).zipWithIndex
    val native = sp128Registered(df)
    // ONE pre-projection computes each column's decimal (or, on the
    // native path, micro-scaled long) exactly once per row — aggregate
    // children each re-evaluate their own expression tree, so placing
    // the decimal cast/multiply inside 50 of them multiplies the only
    // expensive per-row work by the fan-out
    val prepared = df.select(cols.zipWithIndex.flatMap { case (c, i) =>
      val d = df(c).cast("decimal(18,6)")
      // micro-units via the compact decimal's unscaled long — the
      // `* 10^6` cast chain widens past precision 18 and pays a
      // BigDecimal multiply per row
      if (native) Seq(call_function("decimal_unscaled", d).as(s"__m_$i"))
      else Seq(d.as(s"__m_$i"))
    }: _*)
    // internal aliases key on the PAIR INDEX, never the column names —
    // names containing '__' (or dots) would otherwise collide or break
    // the unpivot's references
    val aggs = pairs.flatMap { case ((c1, c2), p) =>
      val (i, j) = (cols.indexOf(c1), cols.indexOf(c2))
      val bothSet = col(s"__m_$i").isNotNull && col(s"__m_$j").isNotNull
      val v1 = when(bothSet, col(s"__m_$i"))
      val v2 = when(bothSet, col(s"__m_$j"))
      val sums =
        if (native) {
          // guarded longs through the codegen'd 128-bit exact
          // aggregate: decimals above precision 18 cost a BigDecimal
          // allocate-add PER ROW in the hot loop. Values are
          // bit-identical to the decimal path (SumProduct128Spec).
          val unit = lit(1000000L)
          def sp(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column, name: String) =
            call_function(graft.functions.SumProduct128.FUNC_NAME, a, b).as(s"__${name}_$p")
          Seq(sp(v1, unit, "sum1"), sp(v2, unit, "sum2"),
            sp(v1, v1, "sum11"), sp(v2, v2, "sum22"), sp(v1, v2, "sum12"))
        } else {
          def s(e: org.apache.spark.sql.Column, name: String) =
            sum(e.cast("decimal(38,12)")).as(s"__${name}_$p")
          Seq(s(v1, "sum1"), s(v2, "sum2"),
            s(v1 * v1, "sum11"), s(v2 * v2, "sum22"), s(v1 * v2, "sum12"))
        }
      count(v1).as(s"__n_$p") +: sums
    }
    val wide = prepared.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row into one row per pair
    val rows = pairs.map { case ((c1, c2), p) =>
      struct(
        lit(c1).as("col_1"), lit(c2).as("col_2"),
        col(s"__n_$p").as("n"),
        col(s"__sum1_$p").as("sum1"),
        col(s"__sum2_$p").as("sum2"),
        col(s"__sum11_$p").as("sum11"),
        col(s"__sum22_$p").as("sum22"),
        col(s"__sum12_$p").as("sum12"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Fold two [[moments]] tables (same column set) into the moments of
    * the union of their inputs — the incremental-maintenance half of
    * the re-aggregability contract: counts and sums add; NULL (an
    * empty side) folds away unless both sides are NULL. One tiny
    * pair-keyed aggregation over k(k+1)/2-row inputs. */
  def mergeMoments(a: DataFrame, b: DataFrame): DataFrame = {
    val aggCols = sum(col("n")).as("n") +:
      Seq("sum1", "sum2", "sum11", "sum22", "sum12")
        .map(s => sum(col(s)).cast("decimal(38,12)").as(s))
    a.unionByName(b)
      .groupBy(col("col_1"), col("col_2"))
      .agg(aggCols.head, aggCols.tail: _*)
  }
}
