package graft

import java.sql.Timestamp

import graft.operators.Temporal

/** Time-weighted average: hand-computed holds, null-value gaps, the
  * floor contract for negative masses, and the single-exchange plan. */
class TemporalSpec extends SparkSpec {

  private def t(us: Long) = new Timestamp(us / 1000) // ms resolution is enough here

  test("held values integrate exactly; last observation carries no mass") {
    val s = spark
    import s.implicits._
    // u1: 10.0 held 3s, then 20.0 held 1s -> (10*3 + 20*1)/4 = 12.5
    // the final 99.0 has no following observation: no mass
    val df = Seq(
      (1L, t(0L), Some(10.0), 1L),
      (1L, t(3000000L), Some(20.0), 2L),
      (1L, t(4000000L), Some(99.0), 3L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = Temporal.timeWeightedAvg(df, Seq("user_id"), "ts", "value", "event_id")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getDouble(r.fieldIndex("twa")) == 12.5)
    assert(r.getLong(r.fieldIndex("span_us")) == 4000000L)
    assert(r.getLong(r.fieldIndex("segments")) == 2L)
  }

  test("null values carry no mass: previous hold extends over the gap") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, t(0L), Some(10.0), 1L),
      (1L, t(1000000L), None: Option[Double], 2L), // dropped pre-segmentation
      (1L, t(2000000L), Some(30.0), 3L),
      (1L, t(3000000L), Some(30.0), 4L)
    ).toDF("user_id", "ts", "value", "event_id")
    // 10 held 0..2s, 30 held 2..3s -> (10*2 + 30*1)/3 = 50/3 floored at 1e-6
    val r = Temporal.timeWeightedAvg(df, Seq("user_id"), "ts", "value", "event_id")
      .collect().head
    assert(r.getDouble(r.fieldIndex("twa")) == 16.666666)
    assert(r.getLong(r.fieldIndex("span_us")) == 3000000L)
  }

  test("negative mass floors toward -inf (cross-engine floor contract)") {
    val s = spark
    import s.implicits._
    // -10 held 3s, 0 tail -> mass -30e12 micro, span 3e6: exact -10.0
    // -10 held 1s, 5 held 2s -> (-10 + 10)/3 = 0: exact 0
    // -10 held 2s, 5 held 1s -> -15/3 = -5: exact
    // -1 held 1s, 0 held 2s -> -1/3 -> floor(-333333.33..) = -0.333334
    val df = Seq(
      (1L, t(0L), Some(-1.0), 1L),
      (1L, t(1000000L), Some(0.0), 2L),
      (1L, t(3000000L), Some(0.0), 3L)
    ).toDF("user_id", "ts", "value", "event_id")
    val r = Temporal.timeWeightedAvg(df, Seq("user_id"), "ts", "value", "event_id")
      .collect().head
    assert(r.getDouble(r.fieldIndex("twa")) == -0.333334) // floor, not truncate
  }

  test("one exchange: the window partitioning is reused by the groupBy") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, t(0L), Some(1.0), 1L), (1L, t(1L), Some(2.0), 2L))
      .toDF("user_id", "ts", "value", "event_id")
    val plan = Temporal.timeWeightedAvg(df, Seq("user_id"), "ts", "value", "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected a single hash exchange, plan:\n$plan")
  }
}
