package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc timing/plan probe (dev/test only, not part of the driver
  * contract): `sbt "Test/runMain graft.Probe"`. Rewritten per
  * investigation; currently: OPQ vs plain PQ recall across candidate
  * fixtures + params (round 15 OPQ bring-up). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.Similarity

    val dim = 16
    def fixture(name: String, vec: Int => Array[Float], n: Int = 40): Unit = {
      val df = (0L until n.toLong).map(i => i -> vec(i.toInt)).toDF("vec_id", "embedding")
      val queries = df.filter(col("vec_id") < 10)
      val brute = Similarity.knnBrute(df, queries, "vec_id", "embedding", 3)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      def recall(hits: Array[org.apache.spark.sql.Row]): Double = {
        val got = hits.map(r => (r.getLong(0), r.getLong(1))).toSet
        brute.count(got.contains).toDouble / brute.size
      }
      for (m <- Seq(4, 8); kc <- Seq(4, 8); sl <- Seq(5)) {
        val pq = recall(Similarity.pqKnn(df, queries, "vec_id", "embedding",
          k = 3, m = m, kCodes = kc, shortlist = sl).collect())
        val opq = recall(Similarity.opqKnn(df, queries, "vec_id", "embedding",
          k = 3, m = m, kCodes = kc, shortlist = sl).collect())
        println(f"[probe] $name m=$m kc=$kc sl=$sl: PQ $pq%.3f  OPQ $opq%.3f  ${if (opq >= pq) "OK" else "WORSE"}")
      }
    }

    // A: energy concentrated in first 4 dims
    fixture("concentrated", seed => Array.tabulate(dim) { d =>
      (if (d < 4) math.sin(seed * 31 + d * 3)
       else 0.02 * math.sin(seed * 7 + d)).toFloat
    })
    // B: pairwise correlation straddling blocks
    fixture("straddle", seed => {
      val base = Array.tabulate(dim / 2)(d => math.sin(seed * 31 + d * 3))
      Array.tabulate(dim)(d => (base(d % (dim / 2)) + 0.05 * math.sin(seed * 7 + d)).toFloat)
    })
    // C: clustered corpus (8 clusters) + noise, energy concentrated
    fixture("clustered", seed => {
      val c = seed % 8
      Array.tabulate(dim) { d =>
        (if (d < 4) math.sin(c * 131 + d * 5) + 0.15 * math.sin(seed * 31 + d)
         else 0.02 * math.sin(seed * 7 + d)).toFloat
      }
    })
    // D: smooth line (the existing family fixture)
    fixture("line", seed => Array.tabulate(dim)(d => math.sin(seed * 31 + d).toFloat))
    spark.stop()
  }
}
