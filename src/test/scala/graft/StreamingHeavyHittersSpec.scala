package graft

import java.nio.file.Files

import graft.operators.HeavyHitters
import graft.streaming.StreamingHeavyHitters

/** Streaming Misra-Gries maintenance ([[StreamingHeavyHitters]]). */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private val k = 4
  // a skewed token stream: "hot" dominates, "warm" clears 1/5, the
  // rest is a long tail of singletons
  private def batchA = (Seq.fill(40)("hot") ++ Seq.fill(12)("warm") ++
    (1 to 10).map(i => s"tail_a$i")).toDF("tok")
  private def batchB = (Seq.fill(25)("hot") ++ Seq.fill(14)("warm") ++
    (1 to 12).map(i => s"tail_b$i")).toDF("tok")

  test("merged summaries are a bounded-error superset of the true heavy hitters") {
    val path = Files.createTempDirectory("graft-shh").toString + "/store"
    StreamingHeavyHitters.initialize(batchA, "tok", path, k)
    StreamingHeavyHitters.applyBatch(batchB, 1L, "tok", path, k)
    val (total, cands) = StreamingHeavyHitters.approx(spark, path, k)
    assert(total === batchA.count() + batchB.count())

    // reference: exact heavy hitters over the concatenated stream
    val exact = HeavyHitters.exact(batchA.unionAll(batchB), "tok", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet.subsetOf(cands.keySet),
      s"true heavy hitters $exact must survive the merge, got $cands")
    // every merged count underestimates by at most total/(k+1)
    val bound = total / (k + 1)
    cands.foreach { case (v, c) =>
      val truth = exact.getOrElse(v, c) // non-HH candidates: bound still holds
      assert(c <= truth + bound && c >= truth - bound, s"$v: $c vs $truth")
    }
  }

  test("replaying a batch and compacting both preserve the answer") {
    val path = Files.createTempDirectory("graft-shh2").toString + "/store"
    StreamingHeavyHitters.initialize(batchA, "tok", path, k)
    StreamingHeavyHitters.applyBatch(batchB, 7L, "tok", path, k)
    val before = StreamingHeavyHitters.approx(spark, path, k)
    StreamingHeavyHitters.applyBatch(batchB, 7L, "tok", path, k) // replay
    assert(StreamingHeavyHitters.approx(spark, path, k) === before)

    def partitions = spark.read.parquet(path)
      .select(org.apache.spark.sql.functions.col("__batch_id").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    // compacting below the uncommitted batch leaves its partition
    // untouched (replay safety) and changes no answer
    StreamingHeavyHitters.compact(spark, path, k, upToBatchId = 0L)
    assert(StreamingHeavyHitters.approx(spark, path, k) === before)
    assert(partitions === Set(-1L, 7L))
    // once batch 7 is committed, folding it shrinks the store to the
    // bootstrap partition, still answer-preserving
    StreamingHeavyHitters.compact(spark, path, k, upToBatchId = 7L)
    assert(StreamingHeavyHitters.approx(spark, path, k) === before)
    assert(partitions === Set(-1L))
  }

  test("compact below the bootstrap partition fails loud instead of corrupting") {
    val path = Files.createTempDirectory("graft-shh4").toString + "/store"
    StreamingHeavyHitters.initialize(batchA, "tok", path, k)
    val before = StreamingHeavyHitters.approx(spark, path, k)
    val e = intercept[IllegalArgumentException] {
      StreamingHeavyHitters.compact(spark, path, k, upToBatchId = -2L)
    }
    assert(e.getMessage.contains("upToBatchId"))
    assert(StreamingHeavyHitters.approx(spark, path, k) === before)
  }

  test("a stream value equal to the total sentinel is excluded, not a runtime failure") {
    val path = Files.createTempDirectory("graft-shh5").toString + "/store"
    val poisoned = batchA.unionAll(
      Seq(StreamingHeavyHitters.TotalKey, StreamingHeavyHitters.TotalKey).toDF("tok"))
    StreamingHeavyHitters.initialize(poisoned, "tok", path, k)
    val (total, cands) = StreamingHeavyHitters.approx(spark, path, k)
    assert(total === batchA.count(), "sentinel rows must not count toward the total")
    assert(!cands.contains(StreamingHeavyHitters.TotalKey))
  }

  test("compaction leaves no temp/old directories behind") {
    val base = Files.createTempDirectory("graft-shh6").toString
    val path = base + "/store"
    StreamingHeavyHitters.initialize(batchA, "tok", path, k)
    StreamingHeavyHitters.applyBatch(batchB, 1L, "tok", path, k)
    StreamingHeavyHitters.compact(spark, path, k, upToBatchId = 1L)
    val siblings = new java.io.File(base).list().toSet
    assert(siblings === Set("store"), s"stray compaction dirs: $siblings")
  }

  test("mismatched sketch sizes fail loud") {
    val path = Files.createTempDirectory("graft-shh3").toString + "/store"
    StreamingHeavyHitters.initialize(batchA, "tok", path, k)
    val e = intercept[IllegalArgumentException] {
      StreamingHeavyHitters.applyBatch(batchB, 1L, "tok", path, k + 1)
    }
    assert(e.getMessage.contains("sketch-size mismatch"))
  }
}
