package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.DotProduct
import graft.operators.Kmeans

/** Distributed k-means ([[Kmeans]]) and its codegen'd
  * [[DotProduct]] hot loop.
  */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private def vecDf(rows: Seq[(Long, Seq[Float])]) = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(FloatType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v) }, 2),
      schema)
  }

  // ------------------------------------------------------------ DotProduct
  test("dot_product matches the sequential fold on float arrays") {
    val df  = vecDf(Seq((1L, Seq(1.5f, -2.25f, 3.0f))))
    val got = df.select(DotProduct(col("v"), col("v"))).head().getDouble(0)
    val exp = Seq(1.5f, -2.25f, 3.0f).map(_.toDouble).map(x => x * x).sum
    assert(math.abs(got - exp) < 1e-12)
  }

  test("dot_product mixes float column against double literal, min-length") {
    val df  = vecDf(Seq((1L, Seq(2.0f, 4.0f, 8.0f))))
    val lit3 = lit(Array(0.5, 0.25)) // shorter: only first two dims count
    val got  = df.select(DotProduct(col("v"), lit3)).head().getDouble(0)
    assert(got === 2.0 * 0.5 + 4.0 * 0.25)
  }

  test("dot_product is null-safe") {
    val df = vecDf(Seq((1L, null.asInstanceOf[Seq[Float]])))
    assert(df.select(DotProduct(col("v"), col("v"))).head().isNullAt(0))
  }

  // ------------------------------------------------------------ assign
  test("assign picks the nearest centroid with lowest-index ties") {
    val df = vecDf(Seq(
      (0L, Seq(0.0f, 0.0f)),   // at centroid 0
      (1L, Seq(10.0f, 0.0f)),  // at centroid 1
      (2L, Seq(5.0f, 0.0f)),   // equidistant -> cluster 0
      (3L, Seq(6.0f, 1.0f))))  // nearer centroid 1
    val cents = Seq(Array(0.0, 0.0), Array(10.0, 0.0))
    val got = Kmeans.assign(df, "id", "v", cents)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.map(t => t._1 -> t._2).toSeq ===
      Seq(0L -> 0, 1L -> 1, 2L -> 0, 3L -> 1))
    assert(math.abs(got(3)._3 - (4.0 * 4.0 + 1.0)) < 1e-9) // |(6,1)-(10,0)|^2
  }

  test("assign is scan-local: no exchange, whole-stage codegen") {
    val e = sources.ParquetTables.readTable(spark, sf("sf0.001"), "embeddings")
    val cents = Kmeans.initLowestIds(e, "vec_id", "embedding", 4)
    val plan = Kmeans.assign(e, "vec_id", "embedding", cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
    // `*(n)` prefixes are executedPlan's whole-stage-codegen markers
    assert(plan.contains("*(1) Project"), plan.take(400))
  }

  test("assign gives a null vector a null cluster, not an NPE") {
    val df  = vecDf(Seq((0L, Seq(1.0f, 1.0f)), (1L, null.asInstanceOf[Seq[Float]])))
    val got = Kmeans.assign(df, "id", "v", Seq(Array(0.0, 0.0)))
      .orderBy("id").collect()
    assert(got(0).getInt(1) === 0)
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
  }

  // ------------------------------------------------------------ lloyd
  /** In-memory Lloyd reference with the same init and empty-cluster
    * rule, exact arithmetic modulo double noise. */
  private def refLloyd(
      pts: Seq[Array[Double]], init: Seq[Array[Double]], iters: Int
  ): Seq[Array[Double]] = {
    var cents = init.map(_.clone())
    for (_ <- 1 to iters) {
      val byCluster = pts.groupBy { p =>
        cents.zipWithIndex.minBy { case (c, j) =>
          (c.zip(p).map { case (a, b) => (a - b) * (a - b) }.sum, j)
        }._2
      }
      cents = cents.zipWithIndex.map { case (old, j) =>
        byCluster.get(j) match {
          case Some(members) =>
            Array.tabulate(old.length)(d => members.map(_(d)).sum / members.size)
          case None => old
        }
      }
    }
    cents
  }

  test("lloyd matches the in-memory reference and never raises the cost") {
    // two well-separated blobs + a straggler, deterministic values
    val pts = Seq(
      Seq(0.0f, 0.1f), Seq(0.2f, 0.0f), Seq(0.1f, 0.2f),
      Seq(9.0f, 9.1f), Seq(9.2f, 9.0f), Seq(8.9f, 9.3f), Seq(5.0f, 5.0f))
    val df   = vecDf(pts.zipWithIndex.map { case (v, i) => (i.toLong, v) })
    val init = Kmeans.initLowestIds(df, "id", "v", 2)

    val costs = (0 to 3).map { iters =>
      val (cents, assigned) = Kmeans.lloyd(df, "id", "v", init, iters)
      val ref = refLloyd(pts.map(_.map(_.toDouble).toArray), init, iters)
      cents.zip(ref).foreach { case (got, want) =>
        got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
      }
      Kmeans.cost(assigned)
    }
    costs.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-9) }
    // and it actually converged to the two blobs
    assert(costs.last < costs.head / 2)
  }

  test("lloyd keeps a centroid that loses all members") {
    val df   = vecDf(Seq((0L, Seq(1.0f, 1.0f)), (1L, Seq(1.2f, 1.0f))))
    val far  = Array(100.0, 100.0)
    val (cents, _) = Kmeans.lloyd(df, "id", "v", Seq(Array(1.0, 1.0), far), 2)
    assert(cents(1).toSeq === far.toSeq)
  }
}
