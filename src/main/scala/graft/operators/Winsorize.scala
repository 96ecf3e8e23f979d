package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winsorization — clamp a metric to its per-group [pLo, pHi]
  * percentile band, the standard outlier treatment before scaling /
  * normalizing features (a 10^6x telemetry spike otherwise dominates
  * any mean-based statistic downstream).
  *
  * The band edges are DISCRETE percentiles (the value at rank
  * ceil(p*n/100) in a total order) — existing input values picked by
  * exact integer rank arithmetic, never interpolated, so no float
  * computation exists anywhere and the DuckDB oracle matches
  * bit-for-bit. Interpolating percentile functions differ across
  * engines in both rounding and interpolation mode; order statistics
  * are the portable choice.
  *
  * Shape: one hash exchange on the group key; the rank window, the
  * per-group count, and the edge-pick window aggregates all reuse the
  * same partitioning. At extreme per-group cardinality the
  * approx-percentile sketch estimates the edges instead
  * (`events_percentiles_approx` pattern) with a broadcast join back —
  * this operator is the exact shape.
  */
object Winsorize {

  /** @param tieCol total-order tie break (determinism of the rank)
    * @return input rows (null `valueCol` rows dropped — they carry no
    *         rank) plus `<valueCol>_wins`, the clamped value */
  def winsorize(
      df: DataFrame, groupCols: Seq[String], valueCol: String, tieCol: String,
      loPct: Int, hiPct: Int
  ): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(0 < loPct && loPct < hiPct && hiPct < 100,
      s"need 0 < loPct < hiPct < 100, got ($loPct, $hiPct)")
    val part  = Window.partitionBy(groupCols.map(col): _*)
    val order = part.orderBy(col(valueCol), col(tieCol))
    def edgeRank(pct: Int) = expr(s"(($pct * __n) + 99) div 100") // ceil(pct*n/100), exact
    df.filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(order))
      .withColumn("__n", count(lit(1)).over(part))
      .withColumn("__lo",
        max(when(col("__rn") === edgeRank(loPct), col(valueCol))).over(part))
      .withColumn("__hi",
        max(when(col("__rn") === edgeRank(hiPct), col(valueCol))).over(part))
      .withColumn(s"${valueCol}_wins",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__rn", "__n", "__lo", "__hi")
  }

  /** Robust z-score: `(v − median) / MAD` per group — the
    * outlier-resistant twin of the mean/σ z-score (one 10^6× spike
    * shifts a mean-based score for every row; the median and the
    * median absolute deviation ignore it). Medians are DISCRETE order
    * statistics (value at rank ceil(n/2), the [[winsorize]] rule) —
    * exact integer rank arithmetic, no interpolation — and the
    * deviation `|v − median|`, its ranking, and the final division are
    * single IEEE operations on identical inputs, so the DuckDB oracle
    * matches bit-for-bit. A group with MAD = 0 (over half its values
    * identical) yields null scores rather than ±∞.
    *
    * Shape: two window passes over the SAME group-key exchange — the
    * deviation ranking re-partitions by the key it is already
    * partitioned by, which Catalyst collapses to one exchange. */
  def robustZ(
      df: DataFrame, groupCols: Seq[String], valueCol: String, tieCol: String
  ): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    val part     = Window.partitionBy(groupCols.map(col): _*)
    val byValue  = part.orderBy(col(valueCol), col(tieCol))
    val medRank  = expr("(__n + 1) div 2") // ceil(n/2), exact
    val withMed = df.filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(byValue))
      .withColumn("__n", count(lit(1)).over(part))
      .withColumn("__med",
        max(when(col("__rn") === medRank, col(valueCol))).over(part))
      .withColumn("__dev", abs(col(valueCol) - col("__med")))
    val byDev = part.orderBy(col("__dev"), col(tieCol))
    withMed
      .withColumn("__dn", row_number().over(byDev))
      .withColumn("__mad",
        max(when(col("__dn") === medRank, col("__dev"))).over(part))
      .withColumn(s"${valueCol}_rz",
        when(col("__mad") > 0.0, (col(valueCol) - col("__med")) / col("__mad")))
      .drop("__rn", "__n", "__med", "__dev", "__dn", "__mad")
  }
}
