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

    {
      val df = graft.operators.Profile.moments(
        sources.ParquetTables.readTable(spark, sfDir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      df.collect() // warm: analysis + codegen + execution
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); df.collect(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] moments_collect_memoized: median ${times(1)}%.3f s (${times.map(t => f"$t%.3f").mkString(", ")})")
      val t1 = System.nanoTime()
      val df2 = graft.operators.Profile.moments(
        sources.ParquetTables.readTable(spark, sfDir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      df2.queryExecution.executedPlan // force planning only
      println(f"[probe] moments_planning_only: ${(System.nanoTime() - t1) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
