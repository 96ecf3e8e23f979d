package graft

import graft.operators.Profile

/** Table profiling: per-column stats on a fixture with nulls and
  * duplicates, input validation, and the single-aggregation plan.
  */
class ProfileSpec extends SparkSpec {

  import spark.implicits._

  private lazy val fixture = Seq[(java.lang.Long, String)](
    (1L, "x"), (2L, "y"), (2L, null), (null, "x"))
    .toDF("id", "s")

  test("per-column rows/nulls/distinct/min/max over nulls and duplicates") {
    val got = Profile.profile(fixture, Seq("id", "s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") == ("id", 4L, 3L, 2L, Some("1"), Some("2")))
    assert(got("s") == ("s", 4L, 3L, 2L, Some("x"), Some("y")))
  }

  test("an all-null column profiles to zero distinct and null extremes") {
    val d = Seq[(Long, Option[String])]((1L, None), (2L, None)).toDF("id", "s")
    val got = Profile.profile(d, Seq("s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().head
    assert(got == ("s", 2L, 0L, 0L, None, None))
  }

  test("unknown columns are rejected loudly") {
    intercept[IllegalArgumentException] {
      Profile.profile(fixture, Seq("id", "nope"))
    }
    intercept[IllegalArgumentException] {
      Profile.profile(fixture, Seq.empty)
    }
  }

  test("plans ONE shuffle pair (melt feeds a two-phase distinct agg), no Expand-per-column") {
    val plan = Profile.profile(fixture, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    // two-phase exact distinct = 2 exchanges regardless of column
    // count; the N-countDistinct alternative plans an Expand
    assert("Exchange".r.findAllIn(plan).size <= 2, plan)
    assert(!plan.contains("Expand"), plan)
  }
}
