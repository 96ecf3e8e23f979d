package graft

import graft.exec.Bucketing

/** Bucketed joins must be exchange-free on both sides. */
class BucketingSpec extends SparkSpec {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = java.nio.file.Paths.get("spark-warehouse", name)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  test("join of two same-bucketed tables has no shuffle exchange") {
    dropTable("b_events"); dropTable("b_users")
    val ev = sources.ParquetTables.readTable(spark, sf("sf0.001"), "events")
    Bucketing.writeBucketed(ev.select("event_id", "user_id", "value"), "b_events", "user_id", 8)
    Bucketing.writeBucketed(
      ev.selectExpr("user_id", "event_type"), "b_users", "user_id", 8)
    // disable auto-broadcast so the planner exercises the bucketed
    // sort-merge path (at real scale both sides exceed the threshold)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_events", "b_users", "user_id")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // sanity: the same join on raw (unbucketed) frames shuffles
      val raw = ev.select("event_id", "user_id", "value")
        .join(ev.selectExpr("user_id", "event_type"), Seq("user_id"))
      raw.collect()
      assert(raw.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    dropTable("b_events"); dropTable("b_users")
  }

  test("AQE skew splitting works on shuffled joins but NOT bucketed scans") {
    // The documented reason --salt-parents exists alongside
    // --bucket-parents: AQE's OptimizeSkewedJoin can only split the
    // partitions of a SHUFFLE — a bucketed scan has no exchange to
    // split, so a hot key inside one bucket stays one task. This test
    // pins both halves of that fact.
    import spark.implicits._
    dropTable("sk_left"); dropTable("sk_right")
    // ~98% of left rows share one hot key, payload pads bytes so the
    // hot partition crosses the (lowered) skew threshold
    val left = (1 to 20000)
      .map(i => (if (i % 50 == 0) i.toLong else 7L, "x" * 100)).toDF("k", "payload")
    val right = (1 to 500).map(i => (i.toLong, s"dim$i")).toDF("k", "attr")
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // thresholds are against COMPRESSED shuffle sizes; the hot
      // partition's repetitive payload compresses to a few tens of KB
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (c, _) => c -> spark.conf.get(c) }
    try {
      confs.foreach { case (c, v) => spark.conf.set(c, v) }
      // shuffled join: AQE detects and splits the hot partition
      // collect() executes THIS queryExecution, so executedPlan shows
      // the final AQE plan (a write would plan its own execution)
      val shuffled = left.join(right, Seq("k"), "inner")
      shuffled.collect()
      val shuffledPlan = shuffled.queryExecution.executedPlan.toString
      assert(shuffledPlan.contains("skew=true"), shuffledPlan)
      // bucketed join: no exchange, so AQE has nothing to split — the
      // hot bucket is one task no matter the configs
      Bucketing.writeBucketed(left, "sk_left", "k", 8)
      Bucketing.writeBucketed(right, "sk_right", "k", 8)
      val bucketed = Bucketing.bucketedJoin(spark, "sk_left", "sk_right", "k")
      bucketed.collect()
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange"), bucketedPlan)
      assert(!bucketedPlan.contains("skew=true"),
        "AQE must not (cannot) split a bucketed scan — salting is the skew remedy here")
    } finally {
      prev.foreach { case (c, v) => spark.conf.set(c, v) }
      dropTable("sk_left"); dropTable("sk_right")
    }
  }

  test("bucket rewrite takes a per-table lease; a held fresh lock fails loudly") {
    import graft.exec.Runner
    val out     = java.nio.file.Files.createTempDirectory("graft-bkt-lock").toString
    val dataDir = java.nio.file.Paths.get(out, "_bucketed")
    java.nio.file.Files.createDirectories(dataDir)
    // simulate a concurrent writer: fresh lock on one parent source
    val lock = dataDir.resolve("lineitem._graft_buckets.lock")
    java.nio.file.Files.writeString(lock, java.lang.Long.toString(System.currentTimeMillis()))
    val runner = new Runner(spark, Fixtures.tpchEnv, sf("sf0.001"), out)
    val e = intercept[IllegalStateException](runner.bucketParentSources(4))
    assert(e.getMessage.contains("single-writer"), e.getMessage)
    // a STALE lock (crashed writer) is stolen: backdate it past the lease
    java.nio.file.Files.setLastModifiedTime(
      lock, java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2L * 60 * 60 * 1000))
    val mapping = runner.bucketParentSources(4)
    assert(mapping.nonEmpty)
    assert(!java.nio.file.Files.exists(lock), "lease must be released after the write")
    mapping.values.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("parent-fact populate over bucketed sources: exchange-free SMJ, identical result") {
    import graft.exec.{FactPopulate, Runner}
    import graft.model.TimeWindow
    val out    = java.nio.file.Files.createTempDirectory("graft-bkt").toString
    val runner = new Runner(spark, Fixtures.tpchEnv, sf("sf0.001"), out)
    runner.fullRefresh(TimeWindow.unbounded) // dims + plain-path facts
    val plain = spark.read.parquet(s"$out/fact_line_by_day")

    val mapping = runner.bucketParentSources(8)
    assert(mapping.keySet == Set("lineitem", "orders"))
    // data lives under outDir (not the shared warehouse) so parallel
    // pipelines never clobber each other's buckets
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_bucketed", "lineitem")))
    // rerun reuses the registered tables; a fresh session would
    // re-register over the existing path — simulate by dropping the
    // catalog entries (keeping the data) and calling again
    mapping.values.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_bucketed", "lineitem")),
      "DROP TABLE of the external bucketed table must keep the data")
    val remapped = runner.bucketParentSources(8)
    assert(remapped == mapping)
    // a DIFFERENT bucket count must rewrite, not reuse: registering
    // 8-bucket files as N buckets silently drops rows from bucketed
    // scans
    runner.bucketParentSources(4)
    val numBuckets = spark.sql(s"DESCRIBE TABLE EXTENDED ${mapping("lineitem")}")
      .collect().collectFirst {
        case r if r.getString(0) == "Num Buckets" => r.getString(1).trim
      }
    assert(numBuckets.contains("4"), s"expected rewrite to 4 buckets, got $numBuckets")
    val srcRows = sources.ParquetTables.readTable(spark, sf("sf0.001"), "lineitem").count()
    assert(spark.table(mapping("lineitem")).count() == srcRows)
    runner.bucketParentSources(8) // restore for the plan assertions below
    val lineFact = Fixtures.tpchFacts.find(_.name == "line").get
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the SMJ path for the parent join (at real scale both
      // sides exceed any broadcast threshold); the explicit broadcast()
      // on dim lookups is unaffected by the conf
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketed = FactPopulate.populate(
        Fixtures.tpchEnv, lineFact, TimeWindow.unbounded, runner.readSource, runner.readOut)
      bucketed.collect()
      // AQE plan strings repeat the initial plan; judge the final one
      val plan = bucketed.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // the ONLY shuffle left is the final hash aggregation — the
      // lineitem/orders join itself moves no data
      assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
      val a = bucketed.drop("part_count").collect().map(_.toString).sorted.toSeq
      val b = plain.drop("p_day", "part_count").collect().map(_.toString).sorted.toSeq
      assert(a == b, "bucketed parent join changed the populate result")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      mapping.values.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
