package graft

import org.apache.spark.sql.functions._

import graft.exec.Skew

/** Salted join correctness: identical result set to the plain join,
  * with the build side replicated. */
class SkewSpec extends SparkSpec {

  test("diagnose: hot key gets ceil(share*P) salt, uniform keys get 1, nulls bucket") {
    val s = spark
    import s.implicits._
    // 100 rows for key 1 (50%), 50 for key 2 (25%), 25 singletons, 25 nulls
    val rows = Seq.fill(100)(Option(1L)) ++ Seq.fill(50)(Option(2L)) ++
      (10L to 34L).map(Option(_)) ++ Seq.fill(25)(None: Option[Long])
    val df = rows.toDF("k")
    val out = graft.exec.Skew.diagnose(df, "k", topK = 3, parallelism = 32)
      .collect().map(r => Option(r.get(0)).map(_.toString.toLong) ->
        (r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    // total 200: key 1 -> 500000 ppm, ceil(100*32/200) = 16
    assert(out(Some(1L)) == ((100L, 1, 500000L, 16L)))
    // key 2 -> 250000 ppm, ceil(50*32/200) = 8
    assert(out(Some(2L)) == ((50L, 2, 250000L, 8L)))
    // the null bucket ranks third at 125000 ppm, ceil(25*32/200) = 4
    assert(out(None) == ((25L, 3, 125000L, 4L)))
    // a uniform relation needs no salt
    val uniform = (1L to 64L).toDF("k")
    val u = graft.exec.Skew.diagnose(uniform, "k", topK = 2, parallelism = 32)
      .select("suggested_salt").collect().map(_.getLong(0)).toSet
    assert(u == Set(1L))
    // the global top-k rank is bounded BEFORE any single-partition
    // step: Spark plans the rank<=k filter as a distributed
    // TakeOrderedAndProject (per-partition heaps, merge of tasks*k
    // rows) — at any key cardinality the distinct-key space is never
    // moved to one partition (WindowGroupLimit is the equivalent
    // bound when a partition spec is present)
    val plan = graft.exec.Skew.diagnose(df, "k", topK = 3, parallelism = 32)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject") || plan.contains("WindowGroupLimit"),
      s"expected a bounded top-k plan:\n$plan")
  }

  test("salted inner join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, s"v$i"))
      .toDF("k", "payload")
    val right = (1 to 300).map(i => (i.toLong, s"dim$i")).toDF("k", "attr")
    val plain  = left.join(right, Seq("k"), "inner")
    val salted = Skew.saltedJoin(left, right, "k", salt = 8, "inner")
    assert(salted.count() == plain.count())
    assert(
      salted.collect().map(_.toString).sorted.toSeq ==
        plain.collect().map(_.toString).sorted.toSeq)
  }

  test("salted left outer join preserves unmatched rows exactly once") {
    import spark.implicits._
    val left  = Seq((1L, "a"), (2L, "b"), (99L, "miss")).toDF("k", "payload")
    val right = Seq((1L, "x"), (2L, "y")).toDF("k", "attr")
    val out = Skew.saltedJoin(left, right, "k", salt = 4, "left_outer")
    assert(out.count() == 3)
    assert(out.filter(col("k") === 99 && col("attr").isNull).count() == 1)
  }

  test("salted parent join through the populate path: identical fact, salt bounds the task key") {
    import graft.derive.Extractor
    import graft.exec.{DimPopulate, FactPopulate}
    import graft.model.TimeWindow
    val env = Fixtures.tpchEnv
    val f   = env.findFact("line").get
    def reader(t: String) = sources.ParquetTables.readTable(spark, sf("sf0.001"), t)
    val dims = Extractor.extractAllDimensionTables(env, f)
      .filterNot { case (_, t) => env.tables.contains(t) }
      .map { case (df, dt) =>
        dt.name -> DimPopulate.full(env, df, dt.name, reader(df.tableName), TimeWindow.unbounded).cache()
      }.toMap
    val plain  = FactPopulate.populate(env, f, TimeWindow.unbounded, reader, dims(_))
    val salted = FactPopulate.populate(env, f, TimeWindow.unbounded, reader, dims(_),
      saltParents = Some(8))
    // row-identical through the whole pipeline (joins + defaults +
    // grouped agg + sketch), and no salt column leaks into the schema
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(
      salted.collect().map(_.toString).sorted.toSeq ==
        plain.collect().map(_.toString).sorted.toSeq)
    // with broadcast off (at real scale the parent exceeds any
    // threshold), the parent join must shuffle on (fk, salt): a hot
    // orderkey then spans up to 8 shuffle buckets instead of one —
    // the bounded-per-task-work property salting exists for
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val replanned = FactPopulate.populate(env, f, TimeWindow.unbounded, reader, dims(_),
        saltParents = Some(8))
      val plan = replanned.queryExecution.executedPlan.toString
      assert(plan.contains("__fact_salt"), plan)
      assert(plan.contains("__parent_salt"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join spreads a hot key across shuffle partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.spark_partition_id
    // one key owns ~95% of the probe side
    val left = (1 to 2000).map(i => (if (i % 20 == 0) i.toLong else 7L, s"v$i"))
      .toDF("k", "payload")
    val right = (1 to 300).map(i => (i.toLong, s"dim$i")).toDF("k", "attr")
    val prev  = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevC = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // AQE would re-merge these tiny test partitions into one and mask
      // the spread; at scale the partitions are large and stay apart
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      def hotPartitions(df: org.apache.spark.sql.DataFrame): Long =
        df.filter(col("k") === 7L)
          .withColumn("pid", spark_partition_id())
          .select("pid").distinct().count()
      assert(hotPartitions(left.join(right, Seq("k"), "inner")) == 1L,
        "unsalted: the hot key must collapse into a single task")
      // murmur3(k, salt) % 32 collides some of the salt values into
      // shared buckets (deterministically), so assert spread, not a
      // 1:1 salt-to-partition mapping
      assert(hotPartitions(Skew.saltedJoin(left, right, "k", salt = 16, "inner")) >= 4L,
        "salted: the hot key must spread across salt buckets")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevC)
    }
  }

  test("key histogram surfaces the hot key") {
    import spark.implicits._
    val df = ((1 to 100).map(_ => 7L) ++ Seq(1L, 2L, 3L)).toDF("k")
    val top = Skew.keyHistogram(df, "k", 1).head()
    assert(top.getLong(0) == 7L && top.getLong(1) == 100L)
  }
}
