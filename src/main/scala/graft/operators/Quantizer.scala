package graft.operators

/** Driver-side coarse quantizer training for IVF
  * ([[Similarity.ivfKnn]]): seeded kmeans++ init + Lloyd's iterations
  * over a bounded sample.
  *
  * Deliberately NOT distributed: the quantizer only ever sees a
  * fixed-size sample (the IVF recipe — train on a sample, assign the
  * full corpus distributed), so training cost is
  * O(sample * k * iters * dim) on the driver — microseconds next to a
  * cluster job per Lloyd's iteration, and byte-for-byte deterministic
  * for a given seed on any cluster topology.
  */
object Quantizer {

  /** kmeans++ initialization (Arthur & Vassilvitskii 2007) with a
    * seeded RNG, then `iters` Lloyd's iterations. Input vectors are
    * expected L2-normalized; distance is squared Euclidean. Empty
    * clusters keep their previous centroid. Returns exactly `k`
    * centroids (padding by cycling the sample if sample < k). */
  def lloyd(sample: Array[Array[Double]], k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    require(sample.nonEmpty, "quantizer sample is empty")
    val rnd = new scala.util.Random(seed)
    val n   = sample.length
    val dim = sample(0).length

    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }

    // kmeans++: first center uniform, then proportional to D^2
    val centers = new Array[Array[Double]](k)
    centers(0) = sample(rnd.nextInt(n)).clone()
    val minD2 = Array.fill(n)(Double.PositiveInfinity)
    var c = 1
    while (c < k) {
      var i = 0
      while (i < n) {
        val d = d2(sample(i), centers(c - 1))
        if (d < minD2(i)) minD2(i) = d
        i += 1
      }
      val total = minD2.sum
      if (total <= 0) {
        // degenerate sample (fewer distinct points than k): cycle
        centers(c) = sample(c % n).clone()
      } else {
        var r = rnd.nextDouble() * total
        var j = 0
        while (j < n - 1 && r > minD2(j)) { r -= minD2(j); j += 1 }
        centers(c) = sample(j).clone()
      }
      c += 1
    }

    // Lloyd's
    var it = 0
    while (it < iters) {
      val sums   = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      var i = 0
      while (i < n) {
        val v = sample(i)
        var best = 0; var bestD = Double.PositiveInfinity
        var ci = 0
        while (ci < k) {
          val d = d2(v, centers(ci))
          if (d < bestD) { bestD = d; best = ci }
          ci += 1
        }
        counts(best) += 1
        val s = sums(best)
        var j = 0
        val m = math.min(dim, v.length)
        while (j < m) { s(j) += v(j); j += 1 }
        i += 1
      }
      var ci = 0
      while (ci < k) {
        if (counts(ci) > 0) {
          val s = sums(ci)
          var j = 0
          while (j < dim) { s(j) /= counts(ci); j += 1 }
          centers(ci) = s
        } // empty cluster: keep previous centroid
        ci += 1
      }
      it += 1
    }
    centers
  }
}
