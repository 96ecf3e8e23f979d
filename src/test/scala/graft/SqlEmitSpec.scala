package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.exec.{Runner, SqlEmit}
import graft.functions.RegisterSketch
import graft.model._

/** `fullrefresh/` / `increfresh/` SQL artifacts (reference
  * `app/Main.hs:75-81`): golden pins on the emitted text, then an
  * execution-equivalence pass — the emitted SQL is RUN through Spark's
  * catalog (create DDL + parameterized populate statements) and must
  * reproduce the Runner's DataFrame pipelines byte-for-byte. This is
  * what keeps the artifacts from diverging from the engine. */
class SqlEmitSpec extends SparkSpec {

  private val env = Fixtures.eventsEnv

  // ---------------------------------------------------------- goldens

  test("dim full populate SQL targets the suffixed table with explicit ids") {
    val sql = SqlEmit.dimensionPopulateSql(
      env, env.facts.head, "dim_event_type", PopulationMode.Full)
    assert(sql.contains("INSERT OVERWRITE TABLE dim_event_type{{suff}} (id, event_type)"))
    assert(sql.contains("row_number() OVER (ORDER BY x.event_type)"))
    assert(sql.contains("coalesce(events.event_type, CAST('__UNKNOWN_VAL__' AS STRING)) AS event_type"))
    assert(sql.contains("WHERE (event_type IS NOT NULL)"))
    assert(sql.contains("AND ts < ?"))
    assert(!sql.contains(">= ?"))
  }

  test("dim incremental populate SQL anti-joins and continues after max(id)") {
    val sql = SqlEmit.dimensionPopulateSql(
      env, env.facts.head, "dim_event_type", PopulationMode.Incremental)
    assert(sql.contains("INSERT INTO dim_event_type (id, event_type)"))
    assert(sql.contains("(SELECT coalesce(max(id), 0) FROM dim_event_type)"))
    assert(sql.contains("LEFT ANTI JOIN dim_event_type"))
    assert(sql.contains("ON dim_event_type.event_type = x.event_type"))
    assert(sql.contains("ts < ? AND ts >= ?"))
    assert(!sql.contains("{{suff}}")) // incremental targets the live table
  }

  test("fact full populate SQL: broadcast dims, staged lookups, one grouped pass") {
    val sql = SqlEmit.factPopulateSql(env, env.facts.head, PopulationMode.Full)
    assert(sql.contains("INSERT OVERWRITE TABLE fact_event_by_minute{{suff}}"))
    // full mode joins the STAGED dim (Fact.hs:189)
    assert(sql.contains("LEFT OUTER JOIN dim_event_type{{suff}} AS dim_event_type"))
    assert(sql.contains("/*+ BROADCAST(dim_event_type) */"))
    assert(sql.contains("CAST(FLOOR(unix_timestamp(events.ts) / 60) AS BIGINT) AS ts_minute_id"))
    assert(sql.contains("sketch_build(CASE WHEN events.user_id IS NOT NULL"))
    assert(sql.contains("sum(CAST(events.value AS DECIMAL(18,6))) AS value_sum"))
    // avg splits into count + sum companions
    assert(sql.contains("AS value_avg_count") && sql.contains("AS value_avg_sum"))
    assert(sql.contains("CAST(coalesce(dim_event_type.id, -1) AS INT) AS event_type_id"))
    assert(sql.contains("GROUP BY"))
    assert(sql.contains("p_day"))
  }

  test("fact incremental populate SQL appends to the live table inside the window") {
    val sql = SqlEmit.factPopulateSql(env, env.facts.head, PopulationMode.Incremental)
    assert(sql.contains("INSERT INTO fact_event_by_minute"))
    assert(sql.contains("LEFT OUTER JOIN dim_event_type AS dim_event_type"))
    assert(sql.contains("events.ts < ? AND events.ts >= ?"))
  }

  test("parent-fact SQL joins the parent source on its FK pairs") {
    val sql = SqlEmit.factPopulateSql(
      Fixtures.tpchEnv, Fixtures.tpchFacts(1), PopulationMode.Full)
    assert(sql.contains("LEFT OUTER JOIN orders"))
    assert(sql.contains("ON lineitem.l_orderkey = orders.o_orderkey"))
  }

  // ---------------------------------------- execution equivalence

  /** Run one emitted statement: substitute `{{suff}}` (the
    * orchestrator's job in the reference), bind `?` params
    * positionally, drop the trailing `;`. */
  private def runSql(sql: String, args: Any*): Unit =
    spark.sql(sql.replace("{{suff}}", "").trim.stripSuffix(";"), args.toArray)

  private def runDdl(ddl: String): Unit =
    spark.sql(ddl.takeWhile(_ != ';'))

  /** Order-insensitive content compare; map-typed sketch columns are
    * canonicalized to sorted entry arrays. */
  private def contents(df: DataFrame): Seq[String] = {
    val canon = df.schema.fields.map { f =>
      if (f.dataType.typeName == "map") sort_array(map_entries(col(f.name))).as(f.name)
      else col(f.name).as(f.name)
    }
    df.select(canon.toSeq: _*)
      .select(df.columns.sorted.map(col).toSeq: _*)
      .collect().map(_.toString).sorted.toSeq
  }

  test("emitted SQL, executed, reproduces the Runner's pipelines (full + incremental)") {
    RegisterSketch.registerSql(spark)
    val lo = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")

    // ---- engine side: DataFrame pipelines via the Runner
    val out    = Files.createTempDirectory("graft-sqlemit").toString
    val runner = new Runner(spark, env, sf("sf0.001"), out)
    runner.fullRefresh(TimeWindow.upTo(lo))
    runner.incrementalRefresh(TimeWindow.between(lo, hi))

    // ---- artifact side: catalog tables populated by the emitted SQL
    spark.sql("CREATE DATABASE IF NOT EXISTS sqlemit")
    spark.catalog.setCurrentDatabase("sqlemit")
    try {
      runner.readSource("events").createOrReplaceTempView("events")
      runner.emitDdl().foreach { case (_, ddl) => runDdl(ddl) }
      val full = runner.emitPopulateSql(PopulationMode.Full)
      val inc  = runner.emitPopulateSql(PopulationMode.Incremental)
      // dims before facts (fact SQL joins the dims), matching topo order
      val tables = Seq(
        "dim_event_type", "dim_app_user",
        "fact_event_by_minute", "fact_user_activity_by_minute")
      tables.foreach(t => runSql(full(t), lo))
      tables.foreach(t => runSql(inc(t), hi, lo))
      tables.foreach { t =>
        assert(contents(spark.table(t)) == contents(spark.read.parquet(s"$out/$t")),
          s"emitted SQL diverged from the engine for $t")
      }
    } finally {
      spark.catalog.setCurrentDatabase("default")
      spark.sql("DROP DATABASE IF EXISTS sqlemit CASCADE")
      spark.catalog.dropTempView("events")
    }
  }

  test("emitted SQL reproduces the parent-join + sketch pipeline (tpch model)") {
    RegisterSketch.registerSql(spark)
    val hi = java.sql.Timestamp.valueOf("2002-01-01 00:00:00")

    val out    = Files.createTempDirectory("graft-sqlemit-tpch").toString
    val runner = new Runner(spark, Fixtures.tpchEnv, sf("sf0.001"), out)
    runner.fullRefresh(TimeWindow.upTo(hi))

    spark.sql("CREATE DATABASE IF NOT EXISTS sqlemit2")
    spark.catalog.setCurrentDatabase("sqlemit2")
    try {
      Seq("orders", "lineitem", "customer")
        .foreach(t => runner.readSource(t).createOrReplaceTempView(t))
      runner.emitDdl().foreach { case (_, ddl) => runDdl(ddl) }
      val full = runner.emitPopulateSql(PopulationMode.Full)
      val tables = Seq(
        "dim_order_status", "dim_order_priority", "dim_line_status",
        "fact_order_by_day", "fact_line_by_day")
      tables.foreach(t => runSql(full(t), hi))
      tables.foreach { t =>
        assert(contents(spark.table(t)) == contents(spark.read.parquet(s"$out/$t")),
          s"emitted SQL diverged from the engine for $t")
      }
    } finally {
      spark.catalog.setCurrentDatabase("default")
      spark.sql("DROP DATABASE IF EXISTS sqlemit2 CASCADE")
      Seq("orders", "lineitem", "customer").foreach(spark.catalog.dropTempView)
    }
  }

  test("emitted SQL reproduces the TenantId + count(col) + max/min pipeline") {
    val hi     = java.sql.Timestamp.valueOf("2002-01-01 00:00:00")
    val out    = Files.createTempDirectory("graft-sqlemit-tenant").toString
    val runner = new Runner(spark, Fixtures.tenantEnv, sf("sf0.001"), out)
    runner.fullRefresh(TimeWindow.upTo(hi))
    spark.sql("CREATE DATABASE IF NOT EXISTS sqlemit3")
    spark.catalog.setCurrentDatabase("sqlemit3")
    try {
      runner.readSource("orders").createOrReplaceTempView("orders")
      runner.emitDdl().foreach { case (_, ddl) => runDdl(ddl) }
      val t = "fact_order_by_tenant_by_day"
      runSql(runner.emitPopulateSql(PopulationMode.Full)(t), hi)
      assert(contents(spark.table(t)) == contents(spark.read.parquet(s"$out/$t")),
        s"emitted SQL diverged from the engine for $t")
    } finally {
      spark.catalog.setCurrentDatabase("default")
      spark.sql("DROP DATABASE IF EXISTS sqlemit3 CASCADE")
      spark.catalog.dropTempView("orders")
    }
  }

  test("emitted SQL reproduces the reference doctest model (DimId + composite FK)") {
    val hi     = java.sql.Timestamp.valueOf("2024-04-01 00:00:00")
    val src    = RingoData.writeSources(spark)
    val out    = Files.createTempDirectory("graft-sqlemit-ringo").toString
    val runner = new Runner(spark, Fixtures.ringoEnv, src, out, partitionFactsByDay = false)
    runner.fullRefresh(TimeWindow.upTo(hi))
    spark.sql("CREATE DATABASE IF NOT EXISTS sqlemit4")
    spark.catalog.setCurrentDatabase("sqlemit4")
    try {
      Seq("session_events", "page_view_events", "referrers")
        .foreach(t => runner.readSource(t).createOrReplaceTempView(t))
      runner.emitDdl().foreach { case (_, ddl) => runDdl(ddl) }
      val full = runner.emitPopulateSql(PopulationMode.Full)
      val tables = Seq(
        "dim_geo", "dim_user_agent", "dim_page_type",
        "fact_session_by_minute", "fact_page_view_by_minute")
      tables.foreach(t => runSql(full(t), hi))
      tables.foreach { t =>
        assert(contents(spark.table(t)) == contents(spark.read.parquet(s"$out/$t")),
          s"emitted SQL diverged from the engine for $t")
      }
    } finally {
      spark.catalog.setCurrentDatabase("default")
      spark.sql("DROP DATABASE IF EXISTS sqlemit4 CASCADE")
      Seq("session_events", "page_view_events", "referrers")
        .foreach(spark.catalog.dropTempView)
    }
  }
}
