package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway micro-benchmark main for optimization work (r17) —
  * not part of any contract; delete freely. */
object ScratchPerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(2000).select(col("id"),
      (col("id") % 16).cast("int").as("cell"),
      expr("transform(sequence(1, 8), x -> cast(id % 17 as int))").as("codes"))
    df.write.mode("overwrite").parquet("/tmp/scratchperf/warm") // warm writer path
    df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-44s med ${times.sorted.apply(2)}%7.3fs  min ${times.min}%7.3fs")
    }
    t("noop 1task") { df.coalesce(1).write.format("noop").mode("overwrite").save() }
    t("noop 32task") { df.write.format("noop").mode("overwrite").save() }
    t("parquet write 1 file") {
      df.coalesce(1).write.mode("overwrite").parquet("/tmp/scratchperf/a") }
    t("parquet write 1 file, no _SUCCESS") {
      spark.conf.set("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      df.coalesce(1).write.mode("overwrite").parquet("/tmp/scratchperf/a2")
      spark.conf.set("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "true") }
    t("parquet write 32 files flat") {
      df.repartition(32).write.mode("overwrite").parquet("/tmp/scratchperf/a3") }
    t("parquet APPEND 1 file") {
      df.coalesce(1).write.mode("append").parquet("/tmp/scratchperf/ap") }
    t("parquet write partitionBy16, 1task") {
      df.coalesce(1).write.mode("overwrite").partitionBy("cell")
        .parquet("/tmp/scratchperf/b") }
    t("read 1-file + count") {
      spark.read.parquet("/tmp/scratchperf/a").count() }
    t("read 16-dir + count") {
      spark.read.parquet("/tmp/scratchperf/b").count() }
    t("parquet write 8 files flat") {
      df.repartition(8).write.mode("overwrite").parquet("/tmp/scratchperf/c8") }
    t("parquet write 32 files, block.size 8MB") {
      spark.conf.set("spark.hadoop.parquet.block.size", (8 << 20).toString)
      df.repartition(32).write.mode("overwrite").parquet("/tmp/scratchperf/c32b")
      spark.conf.unset("spark.hadoop.parquet.block.size") }
    t("parquet write 32 files, uncompressed") {
      df.repartition(32).write.mode("overwrite")
        .option("compression", "uncompressed").parquet("/tmp/scratchperf/c32u") }
    t("parquet write 32 files, initSize 64k") {
      spark.conf.set("spark.hadoop.parquet.page.size.row.check.min", "10")
      spark.conf.set("spark.hadoop.parquet.writer.initial-buffer-size", (64 << 10).toString)
      df.repartition(32).write.mode("overwrite").parquet("/tmp/scratchperf/c32i")
      spark.conf.unset("spark.hadoop.parquet.writer.initial-buffer-size")
      spark.conf.unset("spark.hadoop.parquet.page.size.row.check.min") }
    t("partitionBy16 from 32 parts (512 files)") {
      df.repartition(32).write.mode("overwrite").partitionBy("cell")
        .parquet("/tmp/scratchperf/d512") }
    spark.stop()
  }
}
