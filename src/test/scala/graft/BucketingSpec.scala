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
}
