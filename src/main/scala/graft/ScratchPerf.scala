package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway helper for optimization work (r17): builds a persistent
  * copy of the ann_nights pipeline's source tables so the pipeline can
  * be run standalone (plan-artifact capture). Not part of any
  * contract; delete freely. */
object ScratchPerf {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/r17_annsrc"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = sources.ParquetTables.readTable(spark, "/root/testdata/sf0.1", "embeddings")
    val withPage = e.select(col("vec_id"),
      concat(lit("http://h/p"), col("vec_id")).as("url"),
      concat(lit("v"), col("vec_id")).as("text"),
      col("embedding"))
    val n1 = withPage.filter(col("vec_id") % 3 === 0)
    operators.AnnIndex.trainIvf(n1, "vec_id", "embedding", nCells = 16)
      .write.mode("overwrite").parquet(s"$out/ann_centroids.parquet")
    operators.AnnIndex.trainIvfPq(n1, "vec_id", "embedding",
      spark.read.parquet(s"$out/ann_centroids.parquet"))
      .write.mode("overwrite").parquet(s"$out/ann_books.parquet")
    withPage.filter(col("vec_id") < 10)
      .write.mode("overwrite").parquet(s"$out/queries.parquet")
    withPage.write.mode("overwrite").parquet(s"$out/pages.parquet")
    println(s"wrote sources under $out")
    spark.stop()
  }
}
