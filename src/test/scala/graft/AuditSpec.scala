package graft

import graft.operators.Audit

/** FK audit semantics: null keys are unkeyed (not orphans), orphan
  * rows vs distinct orphan keys, and clean relationships report 0. */
class AuditSpec extends SparkSpec {

  test("orphan counting: nulls excluded, rows vs keys, clean FK is zero") {
    val s = spark
    import s.implicits._
    val child = Seq(
      (Some(1L), "a"), (Some(1L), "b"),  // present parent
      (Some(9L), "c"), (Some(9L), "d"), (Some(8L), "e"), // orphans: 3 rows, 2 keys
      (None: Option[Long], "f")          // unkeyed, never an orphan
    ).toDF("k", "payload")
    val parent = Seq(1L, 2L).toDF("pk")

    val out = Audit.referential(Seq(
      ("child.k->parent", child, "k", parent, "pk"),
      ("parent.pk->parent", parent, "pk", parent, "pk")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    assert(out("child.k->parent") == ((6L, 5L, 3L, 2L)))
    assert(out("parent.pk->parent") == ((2L, 2L, 0L, 0L)))
  }
}
