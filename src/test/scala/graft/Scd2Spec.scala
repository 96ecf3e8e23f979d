package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Scd2

/** SCD Type-2 history: consecutive-duplicate compression, null-safe
  * change detection, interval chaining, and the one-exchange plan.
  */
class Scd2Spec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def log(rows: (Long, String, Long, java.lang.Integer)*): DataFrame =
    rows.toSeq
      .map { case (k, t, tie, a) => (k, ts(t), tie, a) }
      .toDF("key", "ts", "tie", "attr")

  test("history compresses consecutive duplicates and chains intervals half-open") {
    val changes = log(
      (1L, "2024-01-01 00:00:00", 1L, 10),
      (1L, "2024-01-02 00:00:00", 2L, 10), // re-statement: no new version
      (1L, "2024-01-03 00:00:00", 3L, 20), // change
      (1L, "2024-01-04 00:00:00", 4L, 10), // change back: NEW version (A-B-A keeps 3 rows)
      (2L, "2024-01-05 00:00:00", 5L, 7))
    val h = Scd2.history(changes, "key", "ts", "tie", Seq("attr"))
      .select($"key", $"version", $"attr", $"valid_from_us", $"valid_to_us", $"is_current")
      .as[(Long, Int, Int, Long, Option[Long], Boolean)].collect().sortBy(r => (r._1, r._2))
    assert(h.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 1, 10), (1L, 2, 20), (1L, 3, 10), (2L, 1, 7)))
    // each version's valid_to is exactly the next version's valid_from
    val k1 = h.filter(_._1 == 1L)
    assert(k1.init.zip(k1.tail).forall { case (a, b) => a._5.contains(b._4) })
    assert(k1.init.forall(!_._6) && k1.last._6, "only the newest version is current")
    assert(h.filter(_._1 == 2L).head._6)
  }

  test("null-safe change detection: a change to/from null opens a version") {
    val changes = log(
      (1L, "2024-01-01 00:00:00", 1L, 5),
      (1L, "2024-01-02 00:00:00", 2L, null), // 5 -> null: opens
      (1L, "2024-01-03 00:00:00", 3L, null), // null -> null: compressed
      (1L, "2024-01-04 00:00:00", 4L, 5))    // null -> 5: opens
    val h = Scd2.history(changes, "key", "ts", "tie", Seq("attr"))
      .select($"version", $"attr").as[(Int, Option[Int])].collect().sortBy(_._1)
    assert(h.toSeq == Seq((1, Some(5)), (2, None), (3, Some(5))))
  }

  test("multi-attribute: any changed attribute opens a version") {
    val changes = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 1, "a"),
      (1L, ts("2024-01-02 00:00:00"), 2L, 1, "b"), // second attr changes
      (1L, ts("2024-01-03 00:00:00"), 3L, 2, "b")  // first attr changes
    ).toDF("key", "ts", "tie", "x", "y")
    val h = Scd2.history(changes, "key", "ts", "tie", Seq("x", "y"))
      .select($"version", $"x", $"y").as[(Int, Int, String)].collect().sortBy(_._1)
    assert(h.toSeq == Seq((1, 1, "a"), (2, 1, "b"), (3, 2, "b")))
  }

  test("asOf returns exactly the covering version at any probe point") {
    val changes = log(
      (1L, "2024-01-01 00:00:00", 1L, 10),
      (1L, "2024-01-03 00:00:00", 2L, 20))
    val h = Scd2.history(changes, "key", "ts", "tie", Seq("attr"))
    def at(t: String): Seq[Int] =
      Scd2.asOf(h, ts(t).getTime * 1000L).select($"attr").as[Int].collect().toSeq
    assert(at("2024-01-02 00:00:00") == Seq(10))
    assert(at("2024-01-03 00:00:00") == Seq(20), "boundary instant belongs to the NEW version")
    assert(at("2024-01-04 00:00:00") == Seq(20))
    assert(at("2023-12-31 00:00:00").isEmpty, "before the first version: no row")
  }

  test("history plans ONE exchange (filter + second window reuse the key partitioning)") {
    val changes = log((1L, "2024-01-01 00:00:00", 1L, 10))
    val plan = Scd2.history(changes, "key", "ts", "tie", Seq("attr"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("merge equals full rebuild across random in-order splits") {
    val rnd = new scala.util.Random(99)
    val rows = (1 to 120).map { i =>
      (rnd.nextInt(6).toLong, ts(f"2024-01-${1 + i % 28}%02d ${i % 24}%02d:00:00"),
        i.toLong, Integer.valueOf(rnd.nextInt(3)))
    }
    val all = rows.toDF("key", "ts", "tie", "attr")
    val full = Scd2.history(all, "key", "ts", "tie", Seq("attr"))
      .select($"key", $"tie", $"attr", $"valid_from_us", $"valid_to_us", $"version", $"is_current")
    for (day <- Seq(8, 15, 22)) {
      val split = ts(f"2024-01-$day%02d 00:00:00")
      val base = Scd2.history(all.filter($"ts" < split), "key", "ts", "tie", Seq("attr"))
      val merged = Scd2.merge(base, all.filter($"ts" >= split), "key", "ts", "tie", Seq("attr"))
        .select($"key", $"tie", $"attr", $"valid_from_us", $"valid_to_us", $"version", $"is_current")
      assert(merged.except(full).isEmpty && full.except(merged).isEmpty,
        s"split at day $day diverges from the one-shot rebuild")
    }
  }

  test("merge: untouched keys pass through; late rows attribute against the compacted log") {
    val base = Scd2.history(log(
      (1L, "2024-01-01 00:00:00", 1L, 10),
      (1L, "2024-01-05 00:00:00", 2L, 20),
      (2L, "2024-01-02 00:00:00", 3L, 7)), "key", "ts", "tie", Seq("attr"))
    // a LATE change for key 1 landing between the existing versions;
    // key 2 receives nothing and must pass through bit-identically
    val merged = Scd2.merge(base, log((1L, "2024-01-03 00:00:00", 4L, 10)),
      "key", "ts", "tie", Seq("attr"))
    val k1 = merged.filter($"key" === 1L)
      .select($"version", $"attr", $"is_current").as[(Int, Int, Boolean)]
      .collect().sortBy(_._1)
    // 10(t1) -> 10(t3, compressed away) -> 20(t5): two versions
    assert(k1.toSeq == Seq((1, 10, false), (2, 20, true)), k1.toSeq.toString)
    val k2 = merged.filter($"key" === 2L)
      .select($"version", $"attr", $"is_current").as[(Int, Int, Boolean)].collect()
    assert(k2.toSeq == Seq((1, 7, true)))
  }

  test("multiple null-ts rows with unchanged attrs do not open phantom versions") {
    // nulls sort last; the r5 sentinel (lag(ts).isNull) falsely opened
    // a version on the row AFTER a null-ts row — row_number()==1 doesn't
    val changes = Seq(
      (1L, Option(ts("2024-01-01 00:00:00")), 1L, 10),
      (1L, Option.empty[Timestamp], 2L, 10), // null ts, re-statement
      (1L, Option.empty[Timestamp], 3L, 10)  // second null ts, re-statement
    ).toDF("key", "ts", "tie", "attr")
    val h = Scd2.history(changes, "key", "ts", "tie", Seq("attr")).collect()
    assert(h.length == 1, h.mkString("\n"))
    assert(h.head.getAs[Int]("version") == 1)
    assert(h.head.getAs[Boolean]("is_current"))
    assert(h.head.getAs[Long]("valid_from_us") == ts("2024-01-01 00:00:00").getTime * 1000L)
  }

  test("history rejects inputs whose columns its output would overwrite") {
    val bad = Seq((1L, ts("2024-01-01 00:00:00"), 1L, 1, true))
      .toDF("key", "ts", "tie", "attr", "is_current")
    intercept[IllegalArgumentException] {
      Scd2.history(bad, "key", "ts", "tie", Seq("attr"))
    }
  }
}
