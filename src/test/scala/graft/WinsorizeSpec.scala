package graft

import org.apache.spark.sql.functions._

import graft.operators.Winsorize

/** Winsorization: discrete-percentile edges by exact rank arithmetic,
  * clamping behavior, small-group degeneracy, single exchange. */
class WinsorizeSpec extends SparkSpec {

  test("p05/p95 edges on 1..100 are exactly 5 and 95; tails clamp") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => ("g", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val out = Winsorize.winsorize(df, Seq("g"), "v", "id", 5, 95)
      .collect().map(r => r.getDouble(r.fieldIndex("v")) ->
        r.getDouble(r.fieldIndex("v_wins"))).toMap
    assert(out(1.0) == 5.0 && out(4.0) == 5.0)   // below lo -> lo
    assert(out(5.0) == 5.0 && out(50.0) == 50.0) // band passes through
    assert(out(95.0) == 95.0 && out(96.0) == 95.0 && out(100.0) == 95.0)
  }

  test("tiny group degenerates to min/max edges (no clamping)") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", 7.0, 1L), ("g", 3.0, 2L), ("g", 9.0, 3L)).toDF("g", "v", "id")
    // n=3: lo rank ceil(15/100)=1 -> 3.0, hi rank ceil(285/100)=3 -> 9.0
    val out = Winsorize.winsorize(df, Seq("g"), "v", "id", 5, 95)
      .collect().map(r => r.getDouble(r.fieldIndex("v")) ->
        r.getDouble(r.fieldIndex("v_wins"))).toMap
    assert(out == Map(7.0 -> 7.0, 3.0 -> 3.0, 9.0 -> 9.0))
  }

  test("null values are dropped; groups are independent") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", Some(1.0), 1L), ("a", Some(2.0), 2L), ("a", None, 3L),
      ("b", Some(100.0), 4L)).toDF("g", "v", "id")
    val out = Winsorize.winsorize(df, Seq("g"), "v", "id", 10, 90)
    assert(out.count() == 3) // the null row is gone
    assert(out.filter(col("g") === "b").select("v_wins").head.getDouble(0) == 100.0)
  }

  test("one hash exchange: rank, count and edge windows share partitioning") {
    val s = spark
    import s.implicits._
    val df = (1 to 50).map(i => ("g", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val plan = Winsorize.winsorize(df, Seq("g"), "v", "id", 5, 95)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected one hash exchange, plan:\n$plan")
  }

  // ------------------------------------------------------------ robust z
  test("robustZ matches the hand-computed median/MAD score") {
    val s = spark
    import s.implicits._
    // values 1..5 and an outlier 1000: median = 3 (lower median of 6),
    // devs = {2,1,0,1,2,997} -> MAD = 1 (rank 3 of sorted {0,1,1,2,2,997})
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 1000.0)).zipWithIndex
      .map { case (v, i) => ("g", v, i.toLong) }.toDF("g", "v", "id")
    val got = Winsorize.robustZ(df, Seq("g"), "v", "id")
      .orderBy("id").collect().map(_.getDouble(3))
    assert(got.toSeq === Seq(-2.0, -1.0, 0.0, 1.0, 2.0, 997.0))
  }

  test("robustZ yields null, not infinity, when MAD is zero") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", 5.0, 1L), ("g", 5.0, 2L), ("g", 5.0, 3L), ("g", 9.0, 4L))
      .toDF("g", "v", "id")
    val out = Winsorize.robustZ(df, Seq("g"), "v", "id")
    assert(out.collect().forall(_.isNullAt(3)))
  }

  test("robustZ keeps all windows on one group-key exchange") {
    val s = spark
    import s.implicits._
    val df = (1 to 50).map(i => ("g", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val plan = Winsorize.robustZ(df, Seq("g"), "v", "id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected one hash exchange, plan:\n$plan")
  }
}
