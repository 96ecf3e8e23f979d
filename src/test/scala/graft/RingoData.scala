package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthesized source data for the reference's doctest model (shared by
  * RingoModelSpec and SqlEmitSpec): parent/child sources with shared
  * column names, a composite FK, a nullable DimId FK, and NULLs across
  * every dim-contributing column. */
object RingoData {

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Write session_events / page_view_events / referrers parquet into a
    * fresh temp dir and return its path. */
  def writeSources(spark: SparkSession): String = {
    import spark.implicits._

    val sessions = Seq(
      // id, created_at, member, publisher, browser, os, ua_name, country, city, continent
      ("s1", ts("2024-03-01 10:00:10"), Some(1), 7, Some("firefox"), Some("linux"),
        Some("ff"), Some("india"), Some("pune"), Some("asia")),
      ("s2", ts("2024-03-01 10:00:50"), None, 7, Some("chrome"), None,
        Some("cr"), Some("india"), None, Some("asia")),
      ("s3", ts("2024-03-01 10:01:20"), Some(2), 8, None, None, None, None, None, None)
    ).toDF("id", "created_at", "member_id", "publisher_id", "browser_name", "os",
      "user_agent_name", "geo_country_name", "geo_city_name", "geo_continent_name")
      .withColumn("user_agent", lit(null).cast("string"))
      .withColumn("geo_most_specific_subdivision_name", lit(null).cast("string"))
      .withColumn("geo_longitude", lit(null).cast("decimal(9,6)"))
      .withColumn("geo_latitude", lit(null).cast("decimal(9,6)"))
      .withColumn("geo_time_zone", lit(null).cast("string"))
      .withColumn("geo_postal_code", lit(null).cast("string"))
      .withColumn("user_agent_type", lit(null).cast("string"))
      .withColumn("user_agent_device", lit(null).cast("string"))
      .withColumn("user_agent_version", lit(null).cast("string"))

    val pageViews = Seq(
      // id, created_at, member, publisher, session_event_id, page_type, referrer_id
      ("p1", ts("2024-03-01 10:00:20"), Some(1), 7, Some("s1"), "story", Some(11)),
      ("p2", ts("2024-03-01 10:00:30"), Some(1), 7, Some("s1"), "story", None),
      ("p3", ts("2024-03-01 10:01:05"), None, 7, Some("s2"), "home", Some(12)),
      // orphan: session id matches s1 but wrong publisher -> join must miss
      ("p4", ts("2024-03-01 10:01:10"), None, 9, Some("s1"), "home", None),
      ("p5", ts("2024-03-01 10:01:40"), Some(2), 8, Some("s3"), "story", None)
    ).toDF("id", "created_at", "member_id", "publisher_id", "session_event_id",
      "page_type", "referrer_id")
      .withColumn("device_tracker_id", lit(null).cast("string"))
      .withColumn("referrer", lit(null).cast("string"))
      .withColumn("url", lit(null).cast("string"))

    val referrers = Seq((11, 7, "google"), (12, 7, "twitter"))
      .toDF("id", "publisher_id", "name")

    val src = Files.createTempDirectory("graft-ringo-src").toString
    sessions.write.parquet(s"$src/session_events.parquet")
    pageViews.write.parquet(s"$src/page_view_events.parquet")
    referrers.write.parquet(s"$src/referrers.parquet")
    src
  }
}
