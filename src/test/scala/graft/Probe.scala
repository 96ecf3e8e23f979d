package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing/plan probe (dev/test only, not part of the driver
  * contract): `sbt "Test/runMain graft.Probe"`. Rewritten per
  * investigation; currently: the round-4 second-batch operators
  * (sessionize / as-of / chunks / repetition / decontaminate). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeNoop3(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      def run(): Unit = f.write.format("noop").mode("overwrite").save()
      run() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $name: median ${times(1)}%.3f s (${times.map(t => f"$t%.3f").mkString(", ")})")
    }
    val explain = sys.env.get("PROBE_EXPLAIN").contains("1")
    def probe(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      if (explain) { println(s"===== $name ====="); f.explain("formatted") }
      timeNoop3(name)(f)
    }

    probe("events_sessionize")(QueriesEvents.eventsSessionize(spark, sfDir))
    probe("events_asof_join")(QueriesEvents.eventsAsofJoin(spark, sfDir))
    probe("text_chunks")(QueriesExt.textChunks(spark, sfDir))
    probe("text_repetition")(QueriesExt.textRepetition(spark, sfDir))
    probe("decon_ngram_overlap")(QueriesExt.deconNgramOverlap(spark, sfDir))
    probe("decon_clean")(QueriesExt.deconClean(spark, sfDir))
    spark.stop()
  }
}
