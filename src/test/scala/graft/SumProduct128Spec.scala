package graft

import java.math.BigInteger

import org.apache.spark.sql.functions._

import graft.operators.Profile

/** The native 128-bit product-sum aggregate ([[graft.functions
  * .SumProduct128]]): exactness against a BigInteger reference over
  * adversarial values (signs, magnitudes, wraps), SQL null algebra,
  * partition-merge invariance, and the [[Profile.moments]] wiring.
  */
class SumProduct128Spec extends SparkSpec {
  import spark.implicits._

  private def sp(rows: Seq[(java.lang.Long, java.lang.Long)], parts: Int = 1): Option[BigDecimal] = {
    val df = rows.toDF("x", "y").repartition(parts)
    Option(df.agg(call_function("sum_product_128", col("x"), col("y")))
      .head().getDecimal(0)).map(BigDecimal(_))
  }

  private def want(rows: Seq[(java.lang.Long, java.lang.Long)]): Option[BigDecimal] = {
    val vals = rows.collect { case (x, y) if x != null && y != null =>
      BigInteger.valueOf(x).multiply(BigInteger.valueOf(y)) }
    if (vals.isEmpty) None
    else Some(BigDecimal(new java.math.BigDecimal(
      vals.reduce(_ add _), 12)).setScale(12))
  }

  test("matches the BigInteger reference on adversarial magnitudes and signs") {
    val cases: Seq[Seq[(java.lang.Long, java.lang.Long)]] = Seq(
      Seq((3L: java.lang.Long, 4L: java.lang.Long)),
      Seq((-3L: java.lang.Long, 4L: java.lang.Long), (3L: java.lang.Long, -4L: java.lang.Long)),
      // products far beyond long range, both signs, partial cancel
      Seq((4447356000000L: java.lang.Long, 4447356000000L: java.lang.Long),
          (-4447356000000L: java.lang.Long, 4447356000001L: java.lang.Long)),
      Seq((Long.MaxValue: java.lang.Long, Long.MaxValue: java.lang.Long),
          (Long.MinValue + 1: java.lang.Long, Long.MaxValue: java.lang.Long)),
      // pseudo-random mix
      (1 to 50).map { i =>
        val r = new scala.util.Random(i)
        (java.lang.Long.valueOf(r.nextLong() % 100000000000L),
         java.lang.Long.valueOf(r.nextLong() % 100000000000L))
      })
    cases.foreach { rows =>
      assert(sp(rows) == want(rows), s"rows=$rows")
    }
  }

  test("SQL null algebra: null operands contribute nothing; all-null group is NULL") {
    val rows: Seq[(java.lang.Long, java.lang.Long)] = Seq(
      (2L: java.lang.Long, 3L: java.lang.Long),
      (null, 5L: java.lang.Long), (7L: java.lang.Long, null))
    assert(sp(rows) == Some(BigDecimal("0.000000000006")))
    val allNull: Seq[(java.lang.Long, java.lang.Long)] = Seq((null, 1L: java.lang.Long))
    assert(sp(allNull).isEmpty)
  }

  test("partition count never changes the result (exact merge)") {
    val rows = (1 to 200).map { i =>
      val r = new scala.util.Random(i * 7)
      (java.lang.Long.valueOf(r.nextLong() % 1000000000000L),
       java.lang.Long.valueOf(r.nextLong() % 1000000000000L))
    }
    val one = sp(rows, parts = 1)
    assert(one == want(rows))
    for (p <- Seq(3, 16, 64)) assert(sp(rows, parts = p) == one, s"parts=$p")
  }

  test("moments through the native aggregate equals the decimal formulation") {
    val li = sources.ParquetTables.readTable(spark, sf("sf0.001"), "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val got = Profile.moments(li, cols).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), (3 to 7).map(r.getDecimal).map(_.toString))
    }.toMap
    // independent reference: exact BigDecimal sums driver-side
    val data = li.select(cols.map(c => col(c).cast("decimal(18,6)")): _*)
      .collect().map(r => cols.indices.map(i => Option(r.getDecimal(i))))
    for { (c1, i) <- cols.zipWithIndex; (c2, j) <- cols.zipWithIndex if i <= j } {
      val both = data.filter(r => r(i).isDefined && r(j).isDefined)
      def s(f: (java.math.BigDecimal, java.math.BigDecimal) => java.math.BigDecimal) =
        both.map(r => f(r(i).get, r(j).get))
          .foldLeft(java.math.BigDecimal.ZERO)(_ add _).setScale(12).toString
      val (n, sums) = got((c1, c2))
      assert(n == both.length, s"n for ($c1,$c2)")
      assert(sums == Seq(
        s((a, _) => a), s((_, b) => b),
        s((a, _) => a.multiply(a)), s((_, b) => b.multiply(b)),
        s((a, b) => a.multiply(b))), s"sums for ($c1,$c2)")
    }
  }
}
