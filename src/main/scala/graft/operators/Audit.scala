package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit — the load-time data-quality check of a
  * star schema (ringo's populate coalesces failed dim lookups to -1,
  * `src/Ringo/Generator/Populate.hs`; this operator MEASURES that
  * failure mass instead of silently defaulting it).
  *
  * For each declared (child key -> parent key) relationship it reports
  * total child rows, rows with a non-null key, orphan rows (non-null
  * key with no parent) and distinct orphan keys. Shape per FK: the
  * parent's distinct key set anti-joins the child scan — broadcast
  * when the parent is dimension-sized, shuffle otherwise (Catalyst's
  * size-based choice) — followed by partial-aggregated 1-row counts;
  * the child table is scanned once per FK and never collected. A
  * nightly 100 TB audit is |FKs| scans, each embarrassingly parallel.
  */
object Audit {

  /** One audited relationship: (name, child, childKey, parent, parentKey). */
  type Fk = (String, DataFrame, String, DataFrame, String)

  def referential(fks: Seq[Fk]): DataFrame = {
    require(fks.nonEmpty, "at least one FK relationship required")
    fks.map { case (name, child, childKey, parent, parentKey) =>
      val keyed = child.select(col(childKey).as("__k")).filter(col("__k").isNotNull)
      val orphans = keyed.join(
        parent.select(col(parentKey).as("__k")).distinct(), Seq("__k"), "left_anti")
      val childStats = child.agg(
        count(lit(1)).as("child_rows"), count(col(childKey)).as("keyed_rows"))
      val orphanStats = orphans.agg(
        count(lit(1)).as("orphan_rows"), count_distinct(col("__k")).as("orphan_keys"))
      childStats.crossJoin(orphanStats).select(
        lit(name).as("fk"),
        col("child_rows"), col("keyed_rows"),
        col("orphan_rows"), col("orphan_keys"))
    }.reduce(_ unionByName _)
  }
}
