package graft

import graft.operators.Snapshot

/** Snapshot diff classification: added/removed/changed, null-safe
  * attribute comparison, unchanged rows dropped. */
class SnapshotSpec extends SparkSpec {

  test("classifies added, removed, changed; drops unchanged; null-safe attrs") {
    val s = spark
    import s.implicits._
    val before = Seq(
      (1L, Some("a"), Some(10)),  // unchanged
      (2L, Some("b"), Some(20)),  // changed attr
      (3L, None: Option[String], Some(30)), // null -> value: changed
      (4L, Some("d"), None: Option[Int]),   // unchanged with null attr
      (5L, Some("e"), Some(50))   // removed
    ).toDF("k", "s1", "s2")
    val after = Seq(
      (1L, Some("a"), Some(10)),
      (2L, Some("B"), Some(20)),
      (3L, Some("c"), Some(30)),
      (4L, Some("d"), None: Option[Int]),
      (6L, Some("f"), Some(60))   // added
    ).toDF("k", "s1", "s2")

    val out = Snapshot.diff(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 3L -> "changed", 5L -> "removed", 6L -> "added"))
  }

  test("rejects mismatched schemas and attribute-less snapshots") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "x")).toDF("k", "w")
    intercept[IllegalArgumentException](Snapshot.diff(a, b, Seq("k")))
    val keysOnly = Seq(Tuple1(1L)).toDF("k")
    intercept[IllegalArgumentException](Snapshot.diff(keysOnly, keysOnly, Seq("k")))
  }
}
