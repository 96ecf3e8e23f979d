package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Intervals

/** Point-in-interval join: boundary inclusivity, bin-straddling
  * intervals, overlap multiplicity, the no-nested-loop plan shape, and
  * equivalence with the naive inequality join.
  */
class IntervalsSpec extends SparkSpec {

  import spark.implicits._

  private def points(rows: (Long, Long, Long)*): DataFrame =
    rows.toSeq.toDF("k", "pid", "p_us")

  private def intervals(rows: (Long, Long, Long, Long)*): DataFrame =
    rows.toSeq.toDF("k", "iid", "s_us", "e_us")

  test("boundaries are inclusive on both ends; keys separate") {
    val p = points((1L, 1L, 100L), (1L, 2L, 200L), (1L, 3L, 201L), (2L, 4L, 150L))
    val i = intervals((1L, 10L, 100L, 200L), (2L, 20L, 0L, 99L))
    val got = Intervals.intervalJoin(p, i, Seq("k"), "p_us", "s_us", "e_us", binMicros = 50L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L)),
      s"start and end are inclusive, 201 and wrong-key points excluded: $got")
  }

  test("a match across a bin boundary is found (interval straddles bins)") {
    // interval [90, 110] spans bins 0..2 at bin=50; point 105 sits in bin 2
    val p = points((1L, 1L, 105L))
    val i = intervals((1L, 10L, 90L, 110L))
    val got = Intervals.intervalJoin(p, i, Seq("k"), "p_us", "s_us", "e_us", binMicros = 50L)
      .select($"iid").as[Long].collect().toSeq
    assert(got == Seq(10L))
  }

  test("overlapping intervals each match once — no duplicate pairs from bin explosion") {
    val p = points((1L, 1L, 100L))
    val i = intervals((1L, 10L, 0L, 1000L), (1L, 20L, 50L, 150L))
    val got = Intervals.intervalJoin(p, i, Seq("k"), "p_us", "s_us", "e_us", binMicros = 10L)
      .select($"iid").as[Long].collect().toSeq.sorted
    assert(got == Seq(10L, 20L), s"each overlapping interval exactly once: $got")
  }

  test("inverted/empty intervals match nothing; negative epochs bin correctly") {
    val p = points((1L, 1L, -75L), (1L, 2L, 100L))
    val i = intervals((1L, 10L, -100L, -50L), (1L, 20L, 200L, 100L))
    val got = Intervals.intervalJoin(p, i, Seq("k"), "p_us", "s_us", "e_us", binMicros = 50L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)), s"pre-1970 match found, inverted interval dropped: $got")
  }

  test("matches the naive inequality join on random data") {
    val rnd = new scala.util.Random(42)
    val p = points((1L to 200L).map(id =>
      (rnd.nextInt(4).toLong, id, rnd.nextInt(10000).toLong)): _*)
    val i = intervals((1L to 60L).map { id =>
      val s = rnd.nextInt(10000).toLong
      (rnd.nextInt(4).toLong, id, s, s + rnd.nextInt(800).toLong)
    }: _*)
    val fast = Intervals.intervalJoin(p, i, Seq("k"), "p_us", "s_us", "e_us", binMicros = 256L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val naive = p.as("p").join(i.as("i"),
        $"p.k" === $"i.k" && $"p_us" >= $"s_us" && $"p_us" <= $"e_us")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(fast == naive, s"diff: ${(fast diff naive) ++ (naive diff fast)}")
    assert(naive.nonEmpty, "fixture must exercise matches")
  }

  test("plans an equi-join, not BroadcastNestedLoopJoin/CartesianProduct") {
    val p = points((1L, 1L, 100L))
    val i = intervals((1L, 10L, 0L, 200L))
    val plan = Intervals.intervalJoin(p, i, Seq("k"), "p_us", "s_us", "e_us", binMicros = 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    // keyless (global intervals) is where a raw range join degenerates:
    // no equi-key to hash on -> nested loop. The binned form keeps an
    // equi-key (the bin) even with no caller keys.
    val keyless = Intervals.intervalJoin(p, i.drop("k"), Seq.empty,
        "p_us", "s_us", "e_us", binMicros = 50L)
      .queryExecution.executedPlan.toString
    assert(!keyless.contains("BroadcastNestedLoopJoin") && !keyless.contains("CartesianProduct"),
      keyless)
    val naivePlan = p.join(i.drop("k"), $"p_us" >= $"s_us" && $"p_us" <= $"e_us")
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") || naivePlan.contains("CartesianProduct"),
      s"the naive form is the plan this operator exists to avoid:\n$naivePlan")
  }

  test("shared non-key columns are rejected up front, not as an ambiguous-reference error") {
    val p = points((1L, 1L, 100L)).withColumn("ts", lit(1L))
    val i = intervals((1L, 10L, 50L, 150L)).withColumn("ts", lit(2L))
    val e = intercept[IllegalArgumentException] {
      Intervals.intervalJoin(p, i, Seq("k"), "p_us", "s_us", "e_us", binMicros = 50L)
    }
    assert(e.getMessage.contains("ts") && e.getMessage.contains("both sides"), e.getMessage)
  }

  test("a pathological interval fails loudly instead of exploding the build side") {
    val p = points((1L, 1L, 100L))
    val i = intervals((1L, 10L, 0L, 1000000L))
    val ex = intercept[Exception] {
      Intervals.intervalJoin(p, i, Seq("k"), "p_us", "s_us", "e_us",
        binMicros = 10L, maxBinsPerInterval = 16).collect()
    }
    assert(ex.getMessage != null)
  }
}
