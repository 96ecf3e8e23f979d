package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Kmeans
import graft.streaming.StreamingKmeans

/** Streaming k-means statistics maintenance ([[StreamingKmeans]]):
  * batch parity, replay idempotency, partition ownership, and the
  * centroid sidecar guard.
  */
class StreamingKmeansSpec extends SparkSpec {

  private def vecDf(rows: Seq[(Long, Seq[Float])]) = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(FloatType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v) }, 2),
      schema)
  }

  private val cents = Seq(Array(0.0, 0.0), Array(10.0, 10.0))
  private val blobA = Seq(
    (0L, Seq(0.5f, 0.0f)), (1L, Seq(0.0f, 1.0f)), (2L, Seq(9.5f, 10.0f)))
  private val blobB = Seq(
    (3L, Seq(1.0f, 1.0f)), (4L, Seq(10.0f, 9.0f)), (5L, Seq(11.0f, 10.5f)))

  private def recenterMap(path: String): Map[Int, (Long, Seq[Double])] =
    StreamingKmeans.recenter(spark, path, cents).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getSeq[Double](2).toSeq)).toMap

  test("streamed batches fold to the same stats as one batch bootstrap") {
    val split = Files.createTempDirectory("graft-skm-a").toString + "/store"
    StreamingKmeans.initialize(vecDf(blobA), "id", "v", cents, split)
    StreamingKmeans.applyBatch(vecDf(blobB), 0L, "id", "v", cents, split)

    val whole = Files.createTempDirectory("graft-skm-b").toString + "/store"
    StreamingKmeans.initialize(vecDf(blobA ++ blobB), "id", "v", cents, whole)

    assert(recenterMap(split) === recenterMap(whole))
  }

  test("recenter agrees with a Lloyd iteration's means") {
    val path = Files.createTempDirectory("graft-skm-c").toString + "/store"
    val df   = vecDf(blobA ++ blobB)
    StreamingKmeans.initialize(df, "id", "v", cents, path)
    val (lloydCents, _) = Kmeans.lloyd(df, "id", "v", cents, maxIters = 1)
    val got = recenterMap(path)
    for ((c, want) <- lloydCents.zipWithIndex.map(_.swap) if got.contains(c))
      got(c)._2.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
    assert(got.keySet === Set(0, 1))
  }

  test("replaying a micro-batch is a content no-op") {
    val path = Files.createTempDirectory("graft-skm-d").toString + "/store"
    StreamingKmeans.initialize(vecDf(blobA), "id", "v", cents, path)
    StreamingKmeans.applyBatch(vecDf(blobB), 5L, "id", "v", cents, path)
    val before = recenterMap(path)
    StreamingKmeans.applyBatch(vecDf(blobB), 5L, "id", "v", cents, path)
    assert(recenterMap(path) === before)
    // and the store holds exactly the two expected batch partitions
    // raw read: partition-dir inference narrows batch_id to int
    val batches = spark.read.parquet(path)
      .select(col("batch_id").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(batches === Set(-1L, 5L))
  }

  test("a batch only rewrites its own partition") {
    val path = Files.createTempDirectory("graft-skm-e").toString + "/store"
    StreamingKmeans.initialize(vecDf(blobA), "id", "v", cents, path)
    val boot = spark.read.parquet(path)
      .filter(col("batch_id") === -1L).collect().toSet
    StreamingKmeans.applyBatch(vecDf(blobB), 1L, "id", "v", cents, path)
    StreamingKmeans.applyBatch(vecDf(blobB.map { case (i, v) => (i + 10, v) }),
      2L, "id", "v", cents, path)
    val bootAfter = spark.read.parquet(path)
      .filter(col("batch_id") === -1L).collect().toSet
    assert(bootAfter === boot)
  }

  test("mismatched reference centroids fail loud") {
    val path = Files.createTempDirectory("graft-skm-f").toString + "/store"
    StreamingKmeans.initialize(vecDf(blobA), "id", "v", cents, path)
    val other = Seq(Array(1.0, 1.0), Array(10.0, 10.0))
    val e = intercept[IllegalArgumentException] {
      StreamingKmeans.applyBatch(vecDf(blobB), 0L, "id", "v", other, path)
    }
    assert(e.getMessage.contains("centroid mismatch"))
  }
}
