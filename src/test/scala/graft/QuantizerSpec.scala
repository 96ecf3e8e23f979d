package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quantizer

/** Driver-side coarse quantizer (IVF training): determinism, shape,
  * and that Lloyd's actually separates well-separated clusters. */
class QuantizerSpec extends AnyFunSuite {

  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  test("deterministic for a fixed seed, sensitive to the seed") {
    val rnd = new scala.util.Random(7)
    val sample = Array.fill(200)(unit(Array.fill(8)(rnd.nextGaussian())))
    val a = Quantizer.lloyd(sample, k = 4, iters = 10, seed = 42L)
    val b = Quantizer.lloyd(sample, k = 4, iters = 10, seed = 42L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val c = Quantizer.lloyd(sample, k = 4, iters = 10, seed = 43L)
    assert(a.map(_.toSeq).toSeq != c.map(_.toSeq).toSeq)
  }

  test("returns exactly k centroids even when the sample is smaller than k") {
    val sample = Array(unit(Array(1.0, 0.0)), unit(Array(0.0, 1.0)))
    val cs = Quantizer.lloyd(sample, k = 5, iters = 3, seed = 1L)
    assert(cs.length == 5)
    assert(cs.forall(_.length == 2))
  }

  test("separates well-separated clusters (each centroid near one true center)") {
    val rnd = new scala.util.Random(11)
    val centers = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 1.0))
    val sample = Array.tabulate(300) { i =>
      val c = centers(i % 3)
      unit(c.map(x => x + 0.05 * rnd.nextGaussian()))
    }
    val cs = Quantizer.lloyd(sample, k = 3, iters = 15, seed = 42L)
    // every true center has a centroid within cosine >= 0.99
    centers.foreach { t =>
      val best = cs.map { c =>
        val cu = unit(c)
        cu.zip(t).map { case (x, y) => x * y }.sum
      }.max
      assert(best >= 0.99, s"no centroid near ${t.toSeq}: best cosine $best")
    }
  }
}
