package graft

import org.apache.spark.sql.functions._

import graft.functions.RegisterSketch

/** Register sketch (SURVEY §2.8): estimate accuracy vs exact distinct
  * counts, and the register-wise-max merge algebra. */
class SketchSpec extends SparkSpec {

  private val m = RegisterSketch.bucketCount(0.05)

  test("bucket count matches the reference formula: eps=0.05 -> m=512") {
    assert(m == 512)
    assert(RegisterSketch.bucketCount(0.1) == 128)
  }

  test("estimate within tolerance of exact distinct count (events users)") {
    val ev    = sources.ParquetTables.readTable(spark, sf("sf0.01"), "events")
    val build = RegisterSketch.buildAgg(m)
    val row = ev
      .agg(
        build(RegisterSketch.hashColumn(col("user_id"))).as("sk"),
        countDistinct(col("user_id")).as("exact"))
      .select(RegisterSketch.estimateUdf(m)(col("sk")), col("exact"))
      .head()
    val (est, exact) = (row.getLong(0), row.getLong(1))
    // 512 buckets -> ~4.6% standard error; allow 3 sigma
    assert(math.abs(est - exact) <= math.max(3, (exact * 0.15).toLong),
      s"estimate $est vs exact $exact")
  }

  test("merge of partial sketches equals sketch of the union") {
    val ev    = sources.ParquetTables.readTable(spark, sf("sf0.001"), "events")
    val build = RegisterSketch.buildAgg(m)
    val merge = RegisterSketch.mergeAgg(m)
    val whole = ev
      .agg(build(RegisterSketch.hashColumn(col("user_id"))).as("sk"))
      .head().getMap[Int, Int](0)
    val merged = ev
      .groupBy(dayofmonth(col("ts")).as("d"))
      .agg(build(RegisterSketch.hashColumn(col("user_id"))).as("sk"))
      .agg(merge(col("sk")).as("sk"))
      .head().getMap[Int, Int](0)
    assert(whole == merged)
  }

  test("windowed merge == merging exactly the covered daily sketches") {
    val s = spark
    import s.implicits._
    val m     = RegisterSketch.bucketCount(0.05)
    val build = RegisterSketch.buildAgg(m)
    val merge = RegisterSketch.mergeAgg(m)
    // 5 days, users overlapping across days; day 9 missing (gap):
    // a RANGE frame must skip it, not slide over row positions
    val rows = Seq(
      (7L, 1L), (7L, 2L), (8L, 2L), (8L, 3L), (10L, 4L), (11L, 1L), (11L, 5L))
    val daily = rows.toDF("d", "u")
      .groupBy($"d").agg(build(RegisterSketch.hashColumn($"u")).as("sk"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"d").rangeBetween(-2, 0)
    val rolled = daily.withColumn("rsk", merge($"sk").over(w))
      .select($"d", $"rsk").collect()
      .map(r => r.getLong(0) -> r.getMap[Int, Int](1).toMap).toMap
    // expected: merge dailies with day in [d-2, d]
    val dailyMaps = daily.collect()
      .map(r => r.getLong(0) -> r.getMap[Int, Int](1).toMap).toMap
    def manualMerge(ds: Seq[Long]): Map[Int, Int] =
      ds.flatMap(dailyMaps(_).toSeq).groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(rolled(8L) == manualMerge(Seq(7L, 8L)))
    assert(rolled(10L) == manualMerge(Seq(8L, 10L))) // 9 absent, RANGE frame
    assert(rolled(11L) == manualMerge(Seq(10L, 11L)))
  }

  test("property: estimate scales with true cardinality") {
    for (n <- Seq(100, 500, 1000, 2500, 5000, 10000, 20000)) {
      val sketch = (1 to n).foldLeft(Array.fill(m)(-1)) { (buf, i) =>
        val h = scala.util.hashing.MurmurHash3.stringHash(s"v$i") & 0x7FFFFFFF
        val b = h & (m - 1)
        val r = Integer.numberOfLeadingZeros(if (h == 0) 1 else h)
        if (r > buf(b)) buf(b) = r
        buf
      }
      val map = sketch.zipWithIndex.collect { case (r, b) if r >= 0 => b -> r }.toMap
      val est = RegisterSketch.estimate(map, m)
      assert(math.abs(est - n) < n * 0.25 + 10, s"est $est for true $n")
    }
  }

  test("empty sketch estimates zero") {
    assert(RegisterSketch.estimate(Map.empty, m) == 0L)
  }

  test("SQL-registered sketch algebra: build/merge/estimate from spark.sql") {
    RegisterSketch.registerSql(spark, m)
    sources.ParquetTables.readTable(spark, sf("sf0.001"), "events")
      .createOrReplaceTempView("sk_events")
    val viaSql = spark.sql(
      """SELECT sketch_estimate(sketch_merge(s)) AS est
        |FROM (SELECT sketch_build(xxhash64(cast(user_id AS STRING))) AS s
        |      FROM sk_events GROUP BY event_type)""".stripMargin)
      .head().getLong(0)
    val exact = spark.sql("SELECT count(DISTINCT user_id) FROM sk_events").head().getLong(0)
    assert(math.abs(viaSql - exact).toDouble / exact <= 0.15,
      s"sql-path estimate $viaSql vs exact $exact")
  }

  test("FactCountDistinct(None) falls back to the source table PK") {
    import graft.model._
    import graft.model.FactColumnKind._
    val env = Validator.validateEnv(
      Fixtures.eventsTables,
      Seq(Fact("epk", "events", columns = Seq(
        FactColumn("ts", DimTime),
        FactColumn("distinct_events", FactCountDistinct(None))))),
      Settings(timeUnit = TimeUnit.Day), Fixtures.testTypeDefaults).toOption.get
    val ev = sources.ParquetTables.readTable(spark, sf("sf0.001"), "events")
    val out = graft.exec.FactPopulate.populate(
      env, env.findFact("epk").get, TimeWindow.unbounded, _ => ev, _ => ev)
    val est = out
      .agg(RegisterSketch.mergeAgg(m)(col("distinct_events")).as("sk"))
      .select(RegisterSketch.estimateUdf(m)(col("sk"))).head().getLong(0)
    val exact = ev.count() // event_id is unique
    assert(math.abs(est - exact) <= exact * 0.15, s"est $est vs exact $exact")
  }
}
