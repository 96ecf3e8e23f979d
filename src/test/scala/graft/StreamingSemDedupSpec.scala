package graft

import java.nio.file.Files

import graft.streaming.StreamingSemDedup
import graft.streaming.StreamingSemDedup.Params

/** Store contracts of the semantic-admission store beyond what the
  * replay property and the CliSpec two-batch equality pin. */
class StreamingSemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
  private def dir() = Files.createTempDirectory("graft-semdedup").toString

  test("bootstrap initialize admits the corpus wholesale; a batch prunes against it") {
    val store = dir()
    val p = Params(numBuckets = 4, k = 2, minCosine = 0.95)
    StreamingSemDedup.initialize(
      Seq((1L, v(1, 0)), (2L, v(0, 1))).toDF("doc_id", "embedding"),
      "doc_id", "embedding", store, p)
    // bootstrap rows are all admitted (batch -1), even mutual near-dups
    assert(StreamingSemDedup.admittedOf(spark, store, -1L).count() === 2)
    StreamingSemDedup.applyBatch(
      Seq((10L, v(0.999, 0.01)), (11L, v(-1, 0.05))).toDF("doc_id", "embedding"),
      0L, "doc_id", "embedding", store, p)
    val admitted = StreamingSemDedup.admittedOf(spark, store, 0L)
      .select("vid").collect().map(_.getLong(0)).toSet
    // 10 ~ bootstrap's (1,0) -> pruned; 11 is anti-parallel -> admitted
    assert(admitted === Set(11L))
  }

  test("parameter mismatch against an existing store fails loudly") {
    val store = dir()
    val p = Params(numBuckets = 4, k = 2, minCosine = 0.95)
    StreamingSemDedup.applyBatch(
      Seq((1L, v(1, 0)), (2L, v(0, 1))).toDF("doc_id", "embedding"),
      0L, "doc_id", "embedding", store, p)
    val ex = intercept[IllegalArgumentException] {
      StreamingSemDedup.applyBatch(
        Seq((3L, v(1, 1))).toDF("doc_id", "embedding"),
        1L, "doc_id", "embedding", store, p.copy(minCosine = 0.9))
    }
    assert(ex.getMessage.contains("parameter mismatch"))
  }

  test("admittedOf on a store with no admissions yet is empty, not an error") {
    assert(StreamingSemDedup.admittedOf(spark, dir(), 0L).count() === 0)
  }

  test("legacy (pre-header) markers are accepted; torn headered markers fail actionably") {
    val store = dir()
    val p = Params(numBuckets = 4, k = 2, minCosine = 0.95)
    // legacy 2-line format: params\ncentroids — a healthy store written
    // before the count/dim header existed must NOT be refused on upgrade
    Files.createDirectories(java.nio.file.Paths.get(store))
    Files.writeString(java.nio.file.Paths.get(store, "_graft_semdedup"),
      p.encoded + "\n1.0,0.0;0.0,1.0")
    val cents = StreamingSemDedup.readCentroids(store, p)
    assert(cents.map(_.map(_.toSeq)) === Some(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))))
    // a headered marker whose body disagrees with the recorded count is
    // the torn write the header exists to catch
    val store2 = dir()
    Files.createDirectories(java.nio.file.Paths.get(store2))
    Files.writeString(java.nio.file.Paths.get(store2, "_graft_semdedup"),
      p.encoded + "\n2 2\n1.0,0.0")
    val ex = intercept[IllegalArgumentException] {
      StreamingSemDedup.readCentroids(store2, p)
    }
    assert(ex.getMessage.contains("truncated write"))
    // an unparseable header is actionable, not a raw NumberFormatException
    val store3 = dir()
    Files.createDirectories(java.nio.file.Paths.get(store3))
    Files.writeString(java.nio.file.Paths.get(store3, "_graft_semdedup"),
      p.encoded + "\ngarbage header\n1.0,0.0")
    val ex3 = intercept[IllegalArgumentException] {
      StreamingSemDedup.readCentroids(store3, p)
    }
    assert(ex3.getMessage.contains("unparseable centroid header"))
  }

  test("failOnOversized raises in-plan when a cluster crosses the cap across batches") {
    val store = dir()
    val p = Params(numBuckets = 4, k = 2, minCosine = 0.99,
      maxCluster = 2, failOnOversized = true)
    StreamingSemDedup.applyBatch(
      Seq((1L, v(1, 0)), (2L, v(0, 1)), (3L, v(0.9, 0.1))).toDF("doc_id", "embedding"),
      0L, "doc_id", "embedding", store, p)
    // cluster 0 already holds {1, 3}; one more crosses maxCluster=2
    val ex = intercept[Exception] {
      StreamingSemDedup.applyBatch(
        Seq((4L, v(0.8, 0.2))).toDF("doc_id", "embedding"),
        1L, "doc_id", "embedding", store, p)
    }
    def msg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msg(ex).contains("maxCluster=2"), msg(ex))
  }
}
