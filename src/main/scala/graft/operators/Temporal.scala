package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal aggregation over irregular event timelines.
  *
  * Plain AVG weights every observation equally, which is wrong for
  * sampled state (a metric reading held for an hour counts the same
  * as one held a millisecond). Time-weighted average integrates the
  * held value: TWA = sum(v_i * dt_i) / sum(dt_i), each value held
  * until the next observation (last observation carries no mass —
  * there is no known hold interval after it).
  *
  * Determinism contract (what makes this oracle-checkable): values
  * are lifted to integral micro-units (6-decimal resolution), segment
  * mass is integer * integer microseconds, sums stay exact integers,
  * and the quotient is an exact FLOOR division producing the TWA in
  * micro-units — so the only float step is converting that small
  * integer to double and dividing by 1e6, bit-identical on any IEEE
  * engine. (Casting a wide decimal sum to double instead is NOT
  * portable: engines disagree by 1 ulp on decimal-to-double
  * conversion.) The lead() ordering is total (ts, tie column).
  *
  * Shape: one window exchange on the group key (the same partitioning
  * the sessionize family uses), then a partial-aggregated groupBy on
  * the same key — Catalyst reuses the exchange, so one shuffle total.
  */
object Temporal {

  /** Calendar densification (gap-fill): per-(day, dimension) counts
    * INCLUDING explicit zero rows for combinations with no events — a
    * missing row is silently skipped by a window frame downstream; an
    * explicit zero participates (rolling averages, anomaly z-scores).
    * The day spine is a 1-row min/max aggregate exploded via sequence
    * and cross-joined with the distinct dimension — scaffold size is
    * |days| x |dim| regardless of event volume — then one left join
    * against the partial-aggregated counts. */
  def gapFillDaily(df: DataFrame, tsCol: String, dimCol: String): DataFrame = {
    val day = floor(unix_timestamp(col(tsCol)) / 86400L).cast("long")
    val counts = df.groupBy(day.as("ts_day_id"), col(dimCol))
      .agg(count(lit(1)).as("n"))
    val spine = df.agg(min(day).as("lo"), max(day).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("ts_day_id"))
    val dims = df.select(col(dimCol)).distinct()
    spine.crossJoin(dims)
      .join(counts, Seq("ts_day_id", dimCol), "left")
      .select(col("ts_day_id"), col(dimCol), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** @param tieCol breaks ts ties so lead() is deterministic
    * @return (groupCols*, twa, span_us, segments) — twa is the
    *         time-weighted mean of `valueCol`, span_us the observed
    *         hold time, segments the count of held intervals */
  def timeWeightedAvg(
      df: DataFrame, groupCols: Seq[String], tsCol: String,
      valueCol: String, tieCol: String
  ): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val tus = unix_micros(col(tsCol))
    // null values carry no mass: dropped BEFORE segmentation so the
    // previous observation's hold extends over the gap
    val grouped = df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) ++ Seq[Column](
        // exact integral micro-units: decimal(18,6) * 1e6 has nothing
        // after the point, so the cast to decimal(38,0) is lossless
        (col(valueCol).cast("decimal(18,6)") * 1000000).cast("decimal(38,0)").as("__vu"),
        tus.as("__t"),
        lead(tus, 1).over(w).as("__nxt")): _*)
      .filter(col("__nxt").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("__vu") * (col("__nxt") - col("__t")).cast("decimal(38,0)")).as("__mass"),
        sum(col("__nxt") - col("__t")).as("span_us"),
        count(lit(1)).as("segments"))
    // Spark's `div` truncates toward zero while standard floor
    // division rounds toward -inf; make floor explicit so negative
    // masses agree with floor-dividing engines too
    val q = expr("__mass div CAST(span_us AS DECIMAL(38,0))")
    val r = expr("__mass % CAST(span_us AS DECIMAL(38,0))")
    val floorQ = when(r =!= 0 && (col("__mass") < 0) =!= (col("span_us") < 0), q - 1)
      .otherwise(q)
    grouped
      .withColumn("twa", floorQ.cast("double") / 1000000.0)
      .select(groupCols.map(col) ++
        Seq[Column](col("twa"), col("span_us"), col("segments")): _*)
  }
}
