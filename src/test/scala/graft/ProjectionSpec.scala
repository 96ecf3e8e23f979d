package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Projection

/** Deterministic JL random projection ([[Projection]]). */
class ProjectionSpec extends SparkSpec {

  private def vecDf(rows: Seq[(Long, Seq[Float])]) = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(FloatType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v) }, 2),
      schema)
  }

  test("rademacherSign matches the engine's own md5 (the oracle's rule)") {
    // cross-check the driver-side MessageDigest against Spark's md5 for
    // a grid of (j, i) — the same equivalence the DuckDB oracle leans on
    val grid = for (j <- 1 to 4; i <- 1 to 16) yield (j, i)
    val sqlSigns = grid.map { case (j, i) =>
      val hex = spark.sql(s"SELECT md5('${j}_$i')").head().getString(0)
      if ("01234567".contains(hex.charAt(0))) 1.0 else -1.0
    }
    assert(grid.map { case (j, i) => Projection.rademacherSign(j, i) } === sqlSigns)
    // and the matrix is genuinely mixed, not degenerate
    val row = Projection.signRows(64, 1).head
    assert(row.count(_ > 0) > 8 && row.count(_ < 0) > 8)
  }

  test("projection of a unit basis vector reads the sign matrix column") {
    // e_3 in d=4: proj_j = sign(j,3)/sqrt(2)
    val df  = vecDf(Seq((0L, Seq(0.0f, 0.0f, 1.0f, 0.0f))))
    val got = Projection.randomProject(df, "id", "v", d = 4, r = 2)
      .head().getSeq[Double](1)
    val want = (1 to 2).map(j => Projection.rademacherSign(j, 3) / math.sqrt(2.0))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("projection preserves pairwise distances within JL tolerance on real data") {
    val e = sources.ParquetTables.readTable(spark, sf("sf0.001"), "embeddings")
      .where(col("vec_id") < 40)
    val orig = e.orderBy("vec_id").collect()
      .map(r => r.getSeq[Float](1).map(_.toDouble).toArray)
    val proj = Projection.randomProject(e, "vec_id", "embedding", d = 64, r = 32)
      .orderBy("vec_id").collect()
      .map(r => r.getSeq[Double](1).toArray)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // JL with r=32: distances distort by a bounded factor; assert the
    // MEDIAN ratio is near 1 (individual pairs can wobble more)
    val ratios = for (i <- orig.indices; j <- 0 until i) yield
      d2(proj(i), proj(j)) / d2(orig(i), orig(j))
    val sorted = ratios.sorted
    val median = sorted(sorted.length / 2)
    assert(median > 0.7 && median < 1.4, s"median distortion $median")
  }

  test("projection is scan-local codegen and null vectors stay null") {
    val e = sources.ParquetTables.readTable(spark, sf("sf0.001"), "embeddings")
    val plan = Projection.randomProject(e, "vec_id", "embedding", 64, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(300))
    assert(plan.contains("*(1) Project"), plan.take(300))

    val df = vecDf(Seq((0L, null.asInstanceOf[Seq[Float]])))
    assert(Projection.randomProject(df, "id", "v", 4, 2).head().isNullAt(1))
  }
}
