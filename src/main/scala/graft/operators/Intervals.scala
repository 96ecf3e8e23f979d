package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join. Open-source Spark has no native
  * range-join operator: a raw `p.ts BETWEEN i.start AND i.end` join
  * plans as BroadcastNestedLoopJoin (or a cartesian product when
  * neither side fits in memory) — O(|points| x |intervals|) compared
  * work, a non-starter at scale.
  *
  * This operator rewrites the inequality join as an EQUI-join on a
  * time-bin key: each interval is exploded to the bins it covers, each
  * point carries its single bin, and the shuffle joins on
  * (keys..., bin) with the exact range predicate applied pair-locally.
  * A point lies in exactly one bin and a matching interval covers that
  * bin exactly once, so no dedup pass is needed — each matching
  * (point, interval) pair surfaces exactly once.
  *
  * Scale design: compared work drops to pairs sharing a bin, and the
  * plan becomes a plain shuffled hash/sort-merge join that AQE can
  * size, skew-split, or broadcast. Cost knob: `binMicros` should sit
  * near the TYPICAL interval span — the explosion factor per interval
  * is `span/bin + 1` (guarded by `maxBinsPerInterval`), while an
  * oversized bin degrades toward more false-pair filtering per bin.
  * Both regimes stay correct; the knob only moves work.
  */
object Intervals {

  /** Join `points` to every row of `intervals` whose
    * `[startUsCol, endUsCol]` (inclusive) range covers the point's
    * `pointUsCol`, matching on `keyCols` first. All three range
    * columns are epoch-micros longs. Output: all point columns plus
    * the interval's non-key columns.
    *
    * `maxBinsPerInterval` fails loudly on a pathological interval
    * (span / binMicros above the cap) instead of silently exploding
    * the build side.
    */
  def intervalJoin(
      points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
      pointUsCol: String, startUsCol: String, endUsCol: String,
      binMicros: Long, maxBinsPerInterval: Int = 4096
  ): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "intervalJoin would overwrite existing column '__bin' — rename it first")
    // any OTHER shared non-key column (e.g. both sides carrying a `ts`)
    // would surface post-join as an ambiguous-reference analysis error
    // with no useful message — reject it up front, like the __bin guard
    val shared = points.columns.toSet
      .intersect(intervals.columns.toSet)
      .diff(keyCols.toSet)
    require(shared.isEmpty,
      s"intervalJoin: non-key columns ${shared.toSeq.sorted.mkString("[", ", ", "]")} " +
        "exist on both sides — rename or drop them on one side first " +
        "(only join keys may be shared)")
    val startBin = floorDiv(col(startUsCol), binMicros)
    val endBin   = floorDiv(col(endUsCol), binMicros)
    // fail-loud explosion guard: raise_error inside the sequence bound
    // keeps the check distributed (no driver-side pre-scan)
    val guardedEnd = when(endBin - startBin >= maxBinsPerInterval,
      raise_error(concat(
        lit(s"intervalJoin: interval spans more than $maxBinsPerInterval bins of $binMicros us: start_us="),
        col(startUsCol), lit(" end_us="), col(endUsCol)))
    ).otherwise(endBin)
    val exploded = intervals
      .filter(col(startUsCol) <= col(endUsCol)) // empty/inverted intervals match nothing
      .withColumn("__bin", explode(sequence(startBin, guardedEnd)))
    val binned = points.withColumn("__bin", floorDiv(col(pointUsCol), binMicros))
    val joinKeys = keyCols :+ "__bin"
    binned
      .join(exploded, joinKeys,
        "inner")
      .filter(col(pointUsCol) >= col(startUsCol) && col(pointUsCol) <= col(endUsCol))
      .drop("__bin")
  }

  private def floorDiv(c: org.apache.spark.sql.Column, d: Long) =
    // floor semantics for negative epochs too (pre-1970 timestamps):
    // pmod makes the numerator the exact floor multiple, and INTEGRAL
    // `div` keeps the quotient exact at any magnitude — Spark's `/` on
    // longs is DOUBLE division, which silently rounds above 2^53 and
    // would drop a point into the wrong bin (losing a true match, not
    // erroring) for epoch-nanos-scale inputs
    call_function("div", c - pmod(c, lit(d)), lit(d))
}
