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

  private def momentMap(df: org.apache.spark.sql.DataFrame, cols: Seq[String]) =
    Profile.moments(df, cols).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2),
          Seq(3, 4, 5, 6, 7).map(i => Option(r.getDecimal(i)).map(_.toString)))
    }.toMap

  test("moments: hand-checked pair statistics with pairwise null deletion") {
    val df = Seq(
      (Some(1.0), Some(2.0)),
      (Some(3.0), None),       // drops from every (x,y) pair stat
      (Some(5.0), Some(4.0)),
      (None, Some(9.0))
    ).toDF("x", "y")
    val m = momentMap(df, Seq("x", "y"))
    // (x,x): rows where x non-null -> n=3, sum=9, sumsq=1+9+25=35
    val xx = m(("x", "x"))
    assert(xx._1 == 3L && xx._2(0).get.startsWith("9.") && xx._2(2).get.startsWith("35."))
    // (x,y): pairwise-complete rows only -> (1,2),(5,4): n=2,
    // sum1=6, sum2=6, sum11=26, sum22=20, sum12=1*2+5*4=22
    val xy = m(("x", "y"))
    assert(xy._1 == 2L)
    assert(Seq("6.", "6.", "26.", "20.", "22.").zip(xy._2).forall {
      case (p, v) => v.get.startsWith(p) })
    // unordered: only (x,y) emitted, never (y,x)
    assert(!m.contains(("y", "x")))
  }

  test("moments are re-aggregable: halves' moments sum to the whole's") {
    val df = (1 to 40).map(i => (i.toDouble, (i % 7).toDouble, i.toLong)).toDF("a", "b", "k")
    val whole = momentMap(df, Seq("a", "b"))
    val left  = momentMap(df.filter($"k" % 2 === 0), Seq("a", "b"))
    val right = momentMap(df.filter($"k" % 2 =!= 0), Seq("a", "b"))
    whole.keys.foreach { key =>
      assert(whole(key)._1 == left(key)._1 + right(key)._1, s"n for $key")
      (0 until 5).foreach { i =>
        val sum = BigDecimal(left(key)._2(i).get) + BigDecimal(right(key)._2(i).get)
        assert(BigDecimal(whole(key)._2(i).get) == sum, s"moment $i for $key")
      }
    }
  }

  test("moments: one scan, no shuffle of data rows; duplicate columns rejected") {
    val df = (1 to 10).map(i => (i.toDouble, i * 2.0)).toDF("a", "b")
    val plan = Profile.moments(df, Seq("a", "b")).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    intercept[IllegalArgumentException](Profile.moments(df, Seq("a", "a")))
  }

  test("moments: column names containing '__' don't collide (pair-index aliases)") {
    // (a, b__c) and (a__b, c) would both alias to n__a__b__c under a
    // name-keyed scheme
    val df = (1 to 5).map(i =>
      (i.toDouble, i * 2.0, i * 3.0, i * 4.0)).toDF("a", "b__c", "a__b", "c")
    val m = momentMap(df, Seq("a", "b__c", "a__b", "c"))
    assert(m.size == 10)
    assert(m(("a", "b__c"))._1 == 5L)
    assert(m(("a__b", "c"))._1 == 5L)
  }
}
