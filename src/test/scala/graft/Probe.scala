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

    import org.apache.spark.sql.functions._
    println(s"[probe] docs rows: ${docs.count()}")
    def timeNoop3(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      def run(): Unit = f.write.format("noop").mode("overwrite").save()
      run() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $name: median ${times(1)}%.3f s (${times.map(t => f"$t%.3f").mkString(", ")})")
    }
    timeNoop3("docs scan only")(docs.select("doc_id", "text"))
    timeNoop3("multimodal_decode (current)")(QueriesExt.multimodalDecode(spark, sfDir))
    timeNoop3("decode columnar (md5/octet_length only)")(
      docs.select(col("doc_id").cast("long").as("doc_id"),
        octet_length(col("text").cast("binary")).as("byte_len"),
        md5(col("text").cast("binary")).as("checksum")))
    timeNoop3("embed_knn_lsh (current)")(QueriesExt.embedKnnLsh(spark, sfDir))
    timeNoop3("embed_knn_ivf")(QueriesExt.embedKnnIvf(spark, sfDir))
    spark.stop()
  }
}
