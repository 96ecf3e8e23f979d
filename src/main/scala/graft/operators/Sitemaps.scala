package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap (sitemaps.org XML) parsing — the frontier-construction step
  * AFTER [[Robots]]: a robots.txt names its sitemap files (the
  * `sitemap` records [[Robots.parseRules]] emits), each sitemap lists
  * up to 50,000 URLs (the protocol cap) or, for an index file, up to
  * 50,000 child sitemaps. Feeding the listed URLs through
  * `url_normalize` and an admission store builds a crawl frontier that
  * never re-fetches a known resource.
  *
  * Parsing is a PURE Column chain — `regexp_extract_all` over the XML
  * body, `posexplode`, per-entry `regexp_extract` — so it stays inside
  * whole-stage codegen with zero UDFs and zero shuffles; per-row
  * fan-out is bounded by the protocol's 50k-entries cap. Every pattern
  * avoids backreferences/lookaround so the same strings are valid Java
  * (Spark) and RE2 (a DuckDB oracle) — the [[TextAnalysis.redact]]
  * discipline; `(?s)` + lazy quantifiers are supported by both.
  *
  * Scope (deterministic, documented): `<loc>` values are trimmed and
  * XML-entity-decoded (`&amp;` last, so double-escapes resolve one
  * level); optional `<lastmod>`/`<changefreq>`/`<priority>` come back
  * as trimmed strings, `""` when absent (sitemaps are hand-written
  * often enough that typed parsing belongs to the consumer); CDATA
  * sections are not interpreted. An entry without a `<loc>` yields an
  * empty loc — filter or fail downstream as policy dictates.
  */
object Sitemaps {

  // the five XML entities, ampersand LAST (the safe order — shared
  // convention with the HTML extractor's entity pass)
  private[operators] def decodeEntities(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (e, ch)) => replace(acc, lit(e), lit(ch)) }

  // Spark's trim removes ONLY spaces; hand-written sitemaps indent
  // tag bodies with newlines, so trim the full whitespace class.
  // Attributes on the tag are tolerated (RSS guid isPermaLink etc.).
  private[operators] def tagText(entry: Column, tag: String): Column =
    regexp_replace(
      regexp_extract(entry, s"(?s)<$tag(?:\\s[^>]*)?>(.*?)</$tag>", 1),
      "^\\s+|\\s+$", "")

  private def entries(
      df: DataFrame, idCol: String, xmlCol: String, entryTag: String): DataFrame = {
    // '<url[\s>]' so '<urlset>' does not match as an entry
    val entryPat = s"(?s)<$entryTag[\\s>].*?</$entryTag>"
    df.select(col(idCol),
        posexplode(regexp_extract_all(coalesce(col(xmlCol), lit("")), lit(entryPat), lit(0)))
          .as(Seq("entry_idx", "__e")))
      .select(col(idCol), col("entry_idx"),
        decodeEntities(tagText(col("__e"), "loc")).as("loc"),
        tagText(col("__e"), "lastmod").as("lastmod"),
        tagText(col("__e"), "changefreq").as("changefreq"),
        tagText(col("__e"), "priority").as("priority"))
  }

  /** One row per `<url>` entry of each row's sitemap XML:
    * `(id, entry_idx, loc, lastmod, changefreq, priority)`. */
  def urlEntries(df: DataFrame, idCol: String, xmlCol: String): DataFrame =
    entries(df, idCol, xmlCol, "url")

  /** One row per `<sitemap>` entry of a sitemap INDEX file — the child
    * sitemap locations (same output shape; changefreq/priority are
    * not defined for index entries and come back `""`). */
  def indexEntries(df: DataFrame, idCol: String, xmlCol: String): DataFrame =
    entries(df, idCol, xmlCol, "sitemap")
}
