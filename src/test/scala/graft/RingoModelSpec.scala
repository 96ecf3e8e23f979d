package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.exec.Runner
import graft.model.TimeWindow

/** Execute the reference's own doctest model (FIXTURES.md §A) on
  * synthesized data. This is the only fixture whose parent/child source
  * tables share column names (`id`, `created_at`, `publisher_id`,
  * `member_id`) and whose FK join uses multiple column pairs
  * (`session_event_id -> id` AND `publisher_id -> publisher_id`), and
  * whose DimId FK column (`referrer_id`) is nullable — the hard
  * qualification paths of FactPopulate. */
class RingoModelSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("page_view/session model runs end-to-end with correct lookups") {

    val src = RingoData.writeSources(spark)

    val out = Files.createTempDirectory("graft-ringo-out").toString

    val runner = new Runner(spark, Fixtures.ringoEnv, src, out, partitionFactsByDay = false)
    val written = runner.fullRefresh(TimeWindow.unbounded)
    assert(written.toSet == Set(
      "dim_geo", "dim_user_agent", "dim_page_type",
      "fact_session_by_minute", "fact_page_view_by_minute"))

    // dims: distinct coalesced combinations where any source col non-null
    val geo = spark.read.parquet(s"$out/dim_geo")
      .orderBy("id").collect().map(r => r.toSeq.drop(1)).toSeq
    assert(geo == Seq(
      Seq("india", "__UNKNOWN_VAL__", "asia"),
      Seq("india", "pune", "asia")))

    val pageType = spark.read.parquet(s"$out/dim_page_type")
    assert(pageType.select("page_type").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("home", "story"))

    val fact = spark.read.parquet(s"$out/fact_page_view_by_minute")
    assert(fact.columns.toSeq == Seq(
      "created_at_minute_id", "publisher_id", "view_count",
      "referrer_id", "page_type_id", "geo_id", "user_agent_id"))

    // p4's (s1, publisher 9) must MISS the parent join (composite FK) ->
    // geo/user_agent ids coalesce to -1
    val p4row = fact.filter(col("publisher_id") === 9).head()
    assert(p4row.getAs[Int]("geo_id") == -1)
    assert(p4row.getAs[Int]("user_agent_id") == -1)
    assert(p4row.getAs[Int]("referrer_id") == -1) // nullable FK coalesced

    // p1/p2 joined to s1: same minute, same page_type -> one row, count 2
    val minuteOfP1 = ts("2024-03-01 10:00:20").getTime / 1000 / 60
    val p12 = fact.filter(
      col("publisher_id") === 7 && col("created_at_minute_id") === minuteOfP1 &&
        col("referrer_id") === 11).head()
    assert(p12.getAs[Int]("view_count") == 1)
    val p2row = fact.filter(
      col("publisher_id") === 7 && col("created_at_minute_id") === minuteOfP1 &&
        col("referrer_id") === -1).head()
    assert(p2row.getAs[Int]("view_count") == 1)
    // both resolve s1's geo: (india, pune, asia) = dim_geo id 2
    assert(p12.getAs[Int]("geo_id") == 2 && p2row.getAs[Int]("geo_id") == 2)

    // independent oracle: total view counts match source row count
    assert(fact.agg(sum("view_count")).head().getLong(0) == 5L)
    assert(runner.checkUniqueKeys().forall(_._3 == 0))
  }
}
