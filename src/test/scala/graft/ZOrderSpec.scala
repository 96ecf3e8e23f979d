package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Z-order key: the curve matches an independent bit-by-bit Morton
  * reference, out-of-range coordinates fail loudly, and zorderBy
  * produces range-partitioned output sorted along the curve.
  */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  private def mortonRef(a: Long, b: Long): Long =
    (0 until 31).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the bit-by-bit Morton reference on a grid and at the bounds") {
    val coords = (for { a <- 0L to 7L; b <- 0L to 7L } yield (a, b)) ++
      Seq((0x7FFFFFFFL, 0L), (0L, 0x7FFFFFFFL), (0x7FFFFFFFL, 0x7FFFFFFFL),
        (123456789L, 987654321L))
    val got = coords.toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue($"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == mortonRef(a, b), s"z($a, $b)")
      assert(z >= 0L, "the 62-bit key must stay in positive long range")
    }
  }

  test("interleaving alternates bits: unit steps in each coordinate hit bits 0 and 1") {
    val got = Seq((1L, 0L), (0L, 1L), (1L, 1L)).toDF("a", "b")
      .select(ZOrder.zValue($"a", $"b")).as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("out-of-range coordinates fail loudly instead of scrambling the curve") {
    val neg = Seq((-1L, 0L)).toDF("a", "b")
    intercept[Exception] {
      neg.select(ZOrder.zValue($"a", $"b")).collect()
    }
    val big = Seq((0x80000000L, 0L)).toDF("a", "b")
    intercept[Exception] {
      big.select(ZOrder.zValue($"a", $"b")).collect()
    }
  }

  private def mortonRefN(cs: Seq[Long]): Long = {
    val n = cs.size
    val bitsPer = 63 / n
    cs.zipWithIndex.foldLeft(0L) { case (acc, (c, j)) =>
      (0 until bitsPer).foldLeft(acc) { (a, i) =>
        a | (((c >> i) & 1L) << (i * n + j))
      }
    }
  }

  test("zValueN(2) is bit-identical to zValue") {
    val rnd = new scala.util.Random(11)
    val coords = Seq((0L, 0L), (0x7FFFFFFFL, 0x7FFFFFFFL)) ++
      (1 to 200).map(_ => (rnd.nextInt(Int.MaxValue).toLong, rnd.nextInt(Int.MaxValue).toLong))
    val got = coords.toDF("a", "b")
      .select(ZOrder.zValue($"a", $"b").as("z2"),
        ZOrder.zValueN(Seq($"a", $"b")).as("zn"))
      .as[(Long, Long)].collect()
    got.foreach { case (z2, zn) => assert(z2 == zn) }
  }

  test("zValueN(3) matches the bit-by-bit reference on a grid and at the 21-bit bounds") {
    val lim = (1L << 21) - 1
    val coords = (for { a <- 0L to 3L; b <- 0L to 3L; c <- 0L to 3L } yield (a, b, c)) ++
      Seq((lim, 0L, 0L), (0L, lim, 0L), (0L, 0L, lim), (lim, lim, lim),
        (1234567L, 2000000L, 42L))
    val got = coords.toDF("a", "b", "c")
      .select($"a", $"b", $"c", ZOrder.zValueN(Seq($"a", $"b", $"c")).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (a, b, c, z) =>
      assert(z == mortonRefN(Seq(a, b, c)), s"z($a, $b, $c)")
      assert(z >= 0L)
    }
    // unit steps in each coordinate hit bits 0, 1, 2
    val unit = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L)).toDF("a", "b", "c")
      .select(ZOrder.zValueN(Seq($"a", $"b", $"c"))).as[Long].collect().toSeq
    assert(unit == Seq(1L, 2L, 4L))
  }

  test("zValueN rejects out-of-lane coordinates and degenerate arity") {
    intercept[Exception] {
      Seq((1L << 21, 0L, 0L)).toDF("a", "b", "c")
        .select(ZOrder.zValueN(Seq($"a", $"b", $"c"))).collect()
    }
    intercept[Exception] {
      Seq((-1L, 0L, 0L)).toDF("a", "b", "c")
        .select(ZOrder.zValueN(Seq($"a", $"b", $"c"))).collect()
    }
    intercept[IllegalArgumentException] { ZOrder.zValueN(Seq($"a")) }
  }

  test("zorderByN(3) range-partitions on the curve key") {
    val rnd = new scala.util.Random(13)
    val df = (1 to 256).map(_ =>
      (rnd.nextInt(64).toLong, rnd.nextInt(64).toLong, rnd.nextInt(64).toLong))
      .toDF("a", "b", "c")
    val laid = ZOrder.zorderByN(df, Seq("a", "b", "c"), numPartitions = 4)
    assert(laid.queryExecution.executedPlan.toString.contains("rangepartitioning"))
    assert(laid.columns.toSeq == Seq("a", "b", "c"))
    val ordered = laid
      .select(ZOrder.zValueN(Seq($"a", $"b", $"c")).as("z")).as[Long]
      .mapPartitions(it => Iterator.single(it.toSeq))
      .collect()
    ordered.foreach(zs => assert(zs == zs.sorted))
  }

  test("zorderBy range-partitions on the key and sorts within partitions") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 512).map(_ => (rnd.nextInt(64).toLong, rnd.nextInt(64).toLong))
      .toDF("a", "b")
    val laid = ZOrder.zorderBy(df, "a", "b", numPartitions = 4)
    assert(laid.queryExecution.executedPlan.toString.contains("rangepartitioning"),
      laid.queryExecution.executedPlan.toString)
    assert(laid.columns.toSeq == Seq("a", "b"), "the key column is an ordering, not data")
    // within every partition the rows follow the curve
    val ordered = laid
      .select(ZOrder.zValue($"a", $"b").as("z")).as[Long]
      .mapPartitions(it => Iterator.single(it.toSeq))
      .collect()
    ordered.foreach { zs =>
      assert(zs == zs.sorted, "partition not sorted along the curve")
    }
    // range partitioning: partitions cover disjoint, ordered key ranges
    val nonEmpty = ordered.filter(_.nonEmpty)
    nonEmpty.init.zip(nonEmpty.tail).foreach { case (p1, p2) =>
      assert(p1.last <= p2.head, "partitions must cover ordered disjoint ranges")
    }
  }
}
