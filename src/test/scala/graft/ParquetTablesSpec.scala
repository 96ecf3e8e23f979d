package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.sources.ParquetTables

/** Pins the NTZ-timestamp read path of [[ParquetTables]].
  *
  * The driver's testdata is written by pandas/pyarrow, whose default
  * parquet timestamp annotation is MICROS with isAdjustedToUTC=false.
  * Spark 4 infers that as TIMESTAMP_NTZ, which breaks every
  * unix_micros/time-bucket consumer downstream. ParquetTables.read must
  * surface such columns as plain TimestampType carrying the SAME raw
  * micros DuckDB sees, for any session time zone.
  */
class ParquetTablesSpec extends SparkSpec {

  private def writeNtz(dir: String): Long = {
    // 2024-03-10 07:30 — during a US DST transition, so a tz-dependent
    // reinterpretation bug would visibly shift the micros. An NTZ value
    // stores its wall clock as raw micros-since-epoch "as if UTC".
    val micros = 1710055800000000L
    spark
      .sql("SELECT TIMESTAMP_NTZ'2024-03-10 07:30:00' AS ts, 1 AS id")
      .write
      .mode("overwrite")
      .parquet(dir)
    micros
  }

  // Spark writes TIMESTAMP_NTZ as isAdjustedToUTC=false MICROS — the
  // exact shape pyarrow produces for the driver's testdata
  test("NTZ parquet column reads back as TimestampType with raw micros intact") {
    val dir    = java.nio.file.Files.createTempDirectory("ntz").toString
    val micros = writeNtz(dir)
    val df     = ParquetTables.read(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got === micros)
  }

  test("raw micros survive under a non-UTC session time zone") {
    val dir    = java.nio.file.Files.createTempDirectory("ntz2").toString
    val micros = writeNtz(dir)
    val tzKey  = "spark.sql.session.timeZone"
    val saved  = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val df = ParquetTables.read(spark, dir)
      assert(df.schema("ts").dataType === TimestampType)
      assert(df.select(unix_micros(col("ts"))).head().getLong(0) === micros)
    } finally spark.conf.set(tzKey, saved)
  }

  // the in-session fallback formula used when the inference conf cannot
  // take effect (Spark-written NTZ footers): cast applies the session
  // tz, from_utc_timestamp undoes it — identity on raw micros for ANY
  // session tz (outside that tz's spring-forward gap)
  test("NTZ fallback reinterpretation is micros-identity under any session tz") {
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    for (tz <- Seq("UTC", "America/New_York", "Asia/Kolkata")) {
      try {
        spark.conf.set(tzKey, tz)
        val micros = 1710055800000000L
        val df = spark
          .sql("SELECT TIMESTAMP_NTZ'2024-03-10 07:30:00' AS t")
        assert(df.schema("t").dataType === TimestampNTZType)
        val got = df
          .select(unix_micros(from_utc_timestamp(col("t").cast("timestamp"), tz)))
          .head()
          .getLong(0)
        assert(got === micros, s"tz=$tz")
      } finally spark.conf.set(tzKey, saved)
    }
  }

  test("driver testdata events.ts surfaces as TimestampType, not NTZ") {
    val df = ParquetTables.readTable(spark, sf("sf0.001"), "events")
    assert(df.schema("ts").dataType === TimestampType)
  }
}
