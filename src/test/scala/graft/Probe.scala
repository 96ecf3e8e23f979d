package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing probe (dev/test only, not part of the driver contract):
  * `sbt "Test/runMain graft.Probe"`. */
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
    val docs = sources.ParquetTables.readTable(spark, sfDir, "documents")

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    time("shinglesRaw exploded") {
      operators.Dedup.shinglesRaw(docs, "doc_id", "text").write
        .format("noop").mode("overwrite").save()
    }
    time("shingles distinct") {
      operators.Dedup.shingles(docs, "doc_id", "text").write
        .format("noop").mode("overwrite").save()
    }
    time("minhashSignatures") {
      operators.Dedup.minhashSignatures(docs, "doc_id", "text").write
        .format("noop").mode("overwrite").save()
    }
    time("minhashLshPairs") {
      operators.Dedup.minhashLshPairs(docs, "doc_id", "text").write
        .format("noop").mode("overwrite").save()
    }
    time("fact_populate_parent") {
      Queries.factPopulateParent(spark, sfDir).write
        .format("noop").mode("overwrite").save()
    }
    println(Queries.factPopulateParent(spark, sfDir).queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
