package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet source reader (S-layer).
  *
  * Spark refuses parquet TIMESTAMP(NANOS) columns outright; with
  * `spark.sql.legacy.parquet.nanosAsLong=true` they surface as
  * nanosecond longs instead. This reader inspects the parquet footer,
  * finds nano-timestamp columns, and converts them back to proper
  * TimestampType (microsecond truncation — Spark's native resolution).
  * Sessions created by [[graft.Verify]] / [[graft.Bench]] set the flag.
  */
object ParquetTables {

  def read(spark: SparkSession, path: String): DataFrame = {
    // defensively enable the nanos handling: the driver may hand us a
    // session built without it (it is a runtime-settable SQL conf)
    scala.util.Try(
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true"))
    // MICROS columns written without isAdjustedToUTC (pandas/pyarrow
    // default) would otherwise infer as TIMESTAMP_NTZ under Spark 4,
    // breaking every unix_micros/time-bucket consumer; with inference
    // off they read as plain TimestampType carrying the same raw
    // micros DuckDB sees — byte-identical oracle semantics
    scala.util.Try(
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false"))
    val df = spark.read.parquet(path)
    val sessionTz = scala.util.Try(
      spark.conf.get("spark.sql.session.timeZone")).getOrElse("UTC")
    val deNtz = df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType => f.name
    }.foldLeft(df) { (d, c) =>
      // fallback when the conf cannot apply (Spark-written files carry
      // their NTZ schema in footer metadata, which wins over inference):
      // reinterpret the NTZ wall clock as a UTC instant. The cast shifts
      // the wall clock INTO the session tz (+offset-at-wall);
      // from_utc_timestamp shifts back OUT (-offset-at-instant) — exact
      // identity on the raw micros for any session tz, except wall
      // clocks inside that tz's spring-forward gap (nonexistent local
      // times; the pinned UTC sessions of Verify/Bench have none)
      d.withColumn(c, from_utc_timestamp(col(c).cast("timestamp"), sessionTz))
    }
    nanoTimestampColumns(spark, path).foldLeft(deNtz) { (d, c) =>
      // `div` is exact integral division; `/` would be double division,
      // and epoch nanos (~1.8e18) exceed 2^53, so the rounded quotient
      // can be off by +/-1us and flip time-bucket boundaries
      d.withColumn(c, timestamp_micros(expr(s"`$c` div 1000L")))
    }
  }

  def readTable(spark: SparkSession, dir: String, table: String): DataFrame =
    read(spark, s"$dir/$table.parquet")

  /** Column names whose parquet logical type is TIMESTAMP with NANOS
    * unit, read from the footer of the first data file. */
  private def nanoTimestampColumns(spark: SparkSession, path: String): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val p    = new Path(path)
    val fs   = p.getFileSystem(conf)
    val firstFile: Option[Path] =
      if (fs.getFileStatus(p).isFile) Some(p)
      else
        fs.listStatus(p)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .sortBy(_.getPath.getName)
          .headOption
          .map(_.getPath)
    firstFile match {
      case None => Nil
      case Some(f) =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try {
          reader.getFooter.getFileMetaData.getSchema.getFields.asScala.collect {
            case field
                if field.isPrimitive &&
                  (field.getLogicalTypeAnnotation match {
                    case t: TimestampLogicalTypeAnnotation =>
                      t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
                    case _ => false
                  }) =>
              field.getName
          }.toSeq
        } finally reader.close()
    }
  }
}
