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

  test("numeric extremes are NUMERIC, not lexicographic") {
    val d = Seq(9L, 10L, 100L).toDF("n")
    val got = Profile.profile(d, Seq("n"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().head
    // a lexicographic min/max would report ("10", "9")
    assert(got._5 == Some("9") && got._6 == Some("100"), got.toString)
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

  test("no Expand-per-column; exchange count is column-count-independent") {
    // counts ride the uniform melt shuffle, typed min/max ride one
    // single-row wide agg — the N-countDistinct alternative plans an
    // Expand of N row copies
    val plan2 = Profile.profile(fixture, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("Expand"), plan2)
    val wide = fixture.withColumn("t", $"s").withColumn("u", $"s")
    val plan4 = Profile.profile(wide, Seq("id", "s", "t", "u"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan4).size == "Exchange".r.findAllIn(plan2).size,
      s"exchanges must not grow with profiled columns:\n$plan4")
  }

  test("profileApprox: exact at sparse cardinality, within rsd bounds at scale, no Expand") {
    // HLL++ sparse mode is exact at small cardinality — every column of
    // the fixture must match profile() bit-for-bit except the column name
    val exact = Profile.profile(fixture, Seq("id", "s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    val approx = Profile.profileApprox(fixture, Seq("id", "s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(approx == exact)
    // larger cardinality: estimate within 3x the configured rsd
    val big = spark.range(20000).selectExpr("id", "cast(id % 97 as string) as m")
    val got = Profile.profileApprox(big, Seq("id", "m"), rsd = 0.05)
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r._4).toMap
    assert(math.abs(got("id") - 20000L).toDouble / 20000 <= 0.15, got.toString)
    assert(math.abs(got("m") - 97L).toDouble / 97 <= 0.15, got.toString)
    val plan = Profile.profileApprox(fixture, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
  }
}
