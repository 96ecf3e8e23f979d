package graft

import org.apache.spark.sql.functions._

import graft.exec.Skew

/** Salted join correctness: identical result set to the plain join,
  * with the build side replicated. */
class SkewSpec extends SparkSpec {

  test("salted inner join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, s"v$i"))
      .toDF("k", "payload")
    val right = (1 to 300).map(i => (i.toLong, s"dim$i")).toDF("k", "attr")
    val plain  = left.join(right, Seq("k"), "inner")
    val salted = Skew.saltedJoin(left, right, "k", salt = 8, "inner")
    assert(salted.count() == plain.count())
    assert(
      salted.collect().map(_.toString).sorted.toSeq ==
        plain.collect().map(_.toString).sorted.toSeq)
  }

  test("salted left outer join preserves unmatched rows exactly once") {
    import spark.implicits._
    val left  = Seq((1L, "a"), (2L, "b"), (99L, "miss")).toDF("k", "payload")
    val right = Seq((1L, "x"), (2L, "y")).toDF("k", "attr")
    val out = Skew.saltedJoin(left, right, "k", salt = 4, "left_outer")
    assert(out.count() == 3)
    assert(out.filter(col("k") === 99 && col("attr").isNull).count() == 1)
  }

  test("key histogram surfaces the hot key") {
    import spark.implicits._
    val df = ((1 to 100).map(_ => 7L) ++ Seq(1L, 2L, 3L)).toDF("k")
    val top = Skew.keyHistogram(df, "k", 1).head()
    assert(top.getLong(0) == 7L && top.getLong(1) == 100L)
  }
}
