package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RSS 2.0 / Atom feed parsing — the freshness discovery channel next
  * to [[Sitemaps]]: sites announce NEW resources in feeds long before
  * a sitemap refresh, so a crawl's recency loop polls feeds and pushes
  * the entry links through the same normalize → robots → admission
  * chain as every other frontier source.
  *
  * Same construction discipline as [[Sitemaps]]: pure codegen'd
  * Column chains (`regexp_extract_all` entry split, `posexplode`,
  * per-tag extraction with full-whitespace trim and one-level entity
  * decode), zero UDFs, zero shuffles. Scope: RSS `<item>` children
  * `link`/`title`/`guid`/`pubDate` (tag attributes tolerated), Atom
  * `<entry>` children `title`/`id`/`updated` plus the FIRST `<link>`
  * tag's `href` attribute (Atom links are attributes, not text);
  * CDATA is not interpreted. Both emit one unified shape:
  * `(id, entry_idx, link, title, entry_id, updated)`. */
object Feeds {

  private def entries(
      df: DataFrame, idCol: String, xmlCol: String, entryTag: String): DataFrame =
    df.select(col(idCol),
      posexplode(regexp_extract_all(coalesce(col(xmlCol), lit("")),
        lit(s"(?s)<$entryTag[\\s>].*?</$entryTag>"), lit(0)))
        .as(Seq("entry_idx", "__e")))

  /** One row per RSS `<item>`: `entry_id` is the guid, `updated` the
    * pubDate, both `""` when absent. */
  def rssItems(df: DataFrame, idCol: String, xmlCol: String): DataFrame =
    entries(df, idCol, xmlCol, "item")
      .select(col(idCol), col("entry_idx"),
        Sitemaps.decodeEntities(Sitemaps.tagText(col("__e"), "link")).as("link"),
        Sitemaps.decodeEntities(Sitemaps.tagText(col("__e"), "title")).as("title"),
        Sitemaps.decodeEntities(Sitemaps.tagText(col("__e"), "guid")).as("entry_id"),
        Sitemaps.tagText(col("__e"), "pubDate").as("updated"))

  /** One row per Atom `<entry>`: `link` is the `rel="alternate"`
    * link's `href` when one exists (real feeds often list `rel="self"`
    * first — taking the first tag blindly would frontier the feed's
    * own URL), else the first `<link>` tag's `href`; `entry_id` the
    * `<id>`, `updated` the `<updated>`. */
  def atomEntries(df: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    val alt = regexp_extract(col("__e"),
      "(?s)<link\\b[^>]*\\brel\\s*=\\s*[\"']alternate[\"'][^>]*" +
        "\\bhref\\s*=\\s*[\"']([^\"']*)[\"']", 1)
    val altHrefFirst = regexp_extract(col("__e"),
      "(?s)<link\\b[^>]*\\bhref\\s*=\\s*[\"']([^\"']*)[\"'][^>]*" +
        "\\brel\\s*=\\s*[\"']alternate[\"']", 1)
    val first = regexp_extract(col("__e"),
      "(?s)<link\\b[^>]*\\bhref\\s*=\\s*[\"']([^\"']*)[\"']", 1)
    entries(df, idCol, xmlCol, "entry")
      .select(col(idCol), col("entry_idx"),
        Sitemaps.decodeEntities(
          when(alt =!= "", alt)
            .when(altHrefFirst =!= "", altHrefFirst)
            .otherwise(first)).as("link"),
        Sitemaps.decodeEntities(Sitemaps.tagText(col("__e"), "title")).as("title"),
        Sitemaps.decodeEntities(Sitemaps.tagText(col("__e"), "id")).as("entry_id"),
        Sitemaps.tagText(col("__e"), "updated").as("updated"))
  }
}
