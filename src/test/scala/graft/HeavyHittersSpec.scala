package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** Exact two-pass heavy hitters: equality with brute force under random
  * streams and partitionings (the Misra-Gries candidate sweep must
  * never lose a true heavy hitter), strict-threshold semantics, null
  * handling, bounded sketch size, and the no-join recount plan. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def brute(values: Seq[String], denom: Int): Map[String, Long] = {
    val total = values.size.toLong
    values.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * denom > total }.toMap
  }

  test("exact == brute force over random skewed streams and partitionings") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      // zipf-ish: value i drawn with weight 1/(i+1)
      val alphabet = (0 until 40).map(i => s"v$i")
      val weights  = alphabet.indices.map(i => 1.0 / (i + 1))
      val cum      = weights.scanLeft(0.0)(_ + _).tail
      val totalW   = cum.last
      val stream = Seq.fill(2000 + rnd.nextInt(1000)) {
        val x = rnd.nextDouble() * totalW
        alphabet(cum.indexWhere(x <= _))
      }
      val df = stream.toDF("token").repartition(1 + rnd.nextInt(8))
      for (denom <- Seq(5, 20)) {
        val got = HeavyHitters.exact(df, "token", denom)
          .as[(String, Long)].collect().toMap
        assert(got == brute(stream, denom), s"trial $trial denom $denom")
      }
    }
  }

  test("threshold is strict: exactly total/denom does not qualify") {
    // total 8, denom 4: "a" has 2*4 == 8 (excluded), "b" has 3*4 > 8
    val df = Seq("a", "a", "b", "b", "b", "c", "d", "e").toDF("token")
    val got = HeavyHitters.exact(df, "token", 4).as[(String, Long)].collect().toMap
    assert(got == Map("b" -> 3L))
  }

  test("nulls are skipped and do not count toward the total") {
    // non-null total 4; "a" x3 -> 3*2 > 4 qualifies at denom=2
    val df = Seq(Some("a"), Some("a"), Some("a"), Some("b"), None, None)
      .toDF("token")
    val got = HeavyHitters.exact(df, "token", 2).as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 3L))
  }

  test("Misra-Gries buffer stays bounded: ≤2k physical under reduce, ≤k after merge") {
    val mg = new HeavyHitters.MisraGries(5)
    val rnd = new scala.util.Random(13)
    var b = mg.zero
    for (_ <- 1 to 5000) {
      b = mg.reduce(b, s"t${rnd.nextInt(100)}")
      assert(b.physicalSize <= 10) // lazy-cut buffer compacts at 2k
      assert(b.snapshot.size <= 10)
    }
    var m = mg.zero
    for (_ <- 1 to 50) {
      var p = mg.zero
      for (_ <- 1 to 100) p = mg.reduce(p, s"t${rnd.nextInt(100)}")
      m = mg.merge(m, p)
      assert(m.physicalSize <= 5) // merge applies the cut-to-k rule
    }
  }

  test("buffer underestimate stays within N/(k+1) of true counts") {
    // the superset guarantee rests on this bound; check it directly on
    // a skewed stream against true counts
    val k   = 8
    val mg  = new HeavyHitters.MisraGries(k)
    val rnd = new scala.util.Random(29)
    val stream = Seq.fill(4000)(s"t${(rnd.nextGaussian().abs * 20).toInt}")
    var b = mg.zero
    stream.foreach(v => b = mg.reduce(b, v))
    val est  = b.snapshot
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = stream.size.toLong / (k + 1)
    truth.foreach { case (v, c) =>
      val e = est.getOrElse(v, 0L)
      assert(e <= c, s"$v overestimated: $e > $c")
      assert(e >= c - bound, s"$v underestimated beyond N/(k+1): $e < $c - $bound")
    }
  }

  test("recount pass is join-free: candidates probe as an IN-set predicate") {
    val df = Seq.fill(500)("hot").union(Seq.tabulate(300)(i => s"cold$i")).toDF("token")
    val plan = HeavyHitters.exact(df, "token", 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"recount must be scan-local, no join:\n$plan")
    assert(plan.contains("HashAggregate"), plan)
  }
}
