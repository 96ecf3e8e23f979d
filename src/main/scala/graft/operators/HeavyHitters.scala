package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** EXACT distributed heavy hitters (all values with frequency strictly
  * above `total/denom`) in two passes — the textbook scale shape:
  *
  *  1. a single aggregation runs a mergeable Misra-Gries summary with
  *     `k = denom` counters (map-side partials merge like any other
  *     aggregate; each buffer holds ≤ k entries, so executor memory is
  *     bounded by k, not by the value cardinality);
  *  2. the ≤ k surviving CANDIDATES — provably a superset of every
  *     true heavy hitter — are recounted exactly with a scan-local
  *     `IN`-set predicate (no join) and filtered by the exact integer
  *     threshold `cnt * denom > total`.
  *
  * Superset proof: a Misra-Gries summary with k counters over a stream
  * of length N underestimates any value's count by at most N/(k+1),
  * and merging summaries (sum counts, then subtract the (k+1)-th
  * largest and drop non-positive) preserves that bound [Agarwal,
  * Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS
  * 2012]. A value with freq > N/denom = N/k > N/(k+1) therefore has a
  * positive merged estimate and survives pass 1. Pass 2's exact
  * recount then removes every false candidate, so the output is exact
  * — which is why the gate can hash-match a plain `GROUP BY / HAVING`
  * oracle while the plan never shuffles more than k counters per task.
  *
  * Contrast with the naive exact form (`groupBy(value).count()` then
  * filter): that shuffles the FULL value cardinality — fine for token
  * streams, a spill risk for high-cardinality values at 100 TB; this
  * form's shuffle is O(k) per task regardless of cardinality.
  */
object HeavyHitters {

  private[operators] val mapEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  /** Mergeable Misra-Gries sketch over strings; buffer is the counter
    * map, always ≤ k entries. Null inputs are skipped. */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0, s"counter count must be positive: $k")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      if (v == null) b
      else b.get(v) match {
        case Some(c)              => b.updated(v, c + 1L)
        case None if b.size < k   => b.updated(v, 1L)
        case None                 =>
          // classic decrement-all step: pays one unit from every
          // counter instead of admitting v
          b.flatMap { case (key, c) => if (c > 1L) Some(key -> (c - 1L)) else None }
      }

    override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val combined = b2.foldLeft(b1) { case (acc, (key, c)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + c)
      }
      if (combined.size <= k) combined
      else {
        // subtract the (k+1)-th largest count from everything and drop
        // non-positives — the merge rule that keeps the N/(k+1) bound
        val cut = combined.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        combined.flatMap { case (key, c) => if (c > cut) Some(key -> (c - cut)) else None }
      }
    }

    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] = mapEncoder
    override def outputEncoder: Encoder[Map[String, Long]] = mapEncoder
  }

  /** All values of `valueCol` with frequency strictly greater than
    * `1/denom` of the non-null total, with their EXACT counts, as
    * `(value, cnt)`. `denom` is both the threshold denominator and the
    * sketch size — k = denom counters are provably enough (scaladoc
    * above). The candidate map (≤ denom entries) is the only data the
    * driver ever holds. */
  def exact(df: DataFrame, valueCol: String, denom: Int): DataFrame = {
    val mg = udaf(new MisraGries(denom))
    val nonNull = df.filter(col(valueCol).isNotNull)
    val row = nonNull
      .agg(mg(col(valueCol)).as("cand"), count(lit(1)).as("n"))
      .head
    val total = row.getAs[Long]("n")
    val candidates = row.getAs[Map[String, Long]]("cand").keys.toSeq
    if (candidates.isEmpty)
      return df.select(col(valueCol).cast("string").as("value")).limit(0)
        .withColumn("cnt", lit(0L))
    nonNull
      .filter(col(valueCol).isin(candidates: _*))
      .groupBy(col(valueCol).as("value"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(denom.toLong) > lit(total))
  }
}
