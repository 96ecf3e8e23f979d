package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — classify rows between two states of a keyed table
  * (two dim loads, two CDC compactions, yesterday's vs today's
  * export) as added / removed / changed. The audit primitive behind
  * "what did last night's load actually do", and the cheap way to
  * turn full exports into deltas for incremental maintenance
  * ([[graft.exec.Rollup.mergeIncremental]],
  * `graft.operators.Scd2.merge`).
  *
  * Attribute comparison is a null-safe struct equality (`<=>`) over
  * the non-key columns — field-wise, no fingerprint hashing, so there
  * are no collision or encoding concerns and the DuckDB oracle
  * mirrors it with IS DISTINCT FROM. Unchanged rows are dropped
  * early, right after the join.
  *
  * Shape: one full-outer shuffle join on the key (both sides
  * partition-prune and column-prune to key+attrs); at 100 TB the two
  * snapshots bucket/cluster by the same key and the join is
  * co-located. Output: key columns + change ('added' | 'removed' |
  * 'changed').
  */
object Snapshot {

  def diff(before: DataFrame, after: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(before.columns.toSeq == after.columns.toSeq,
      s"snapshot schemas differ: ${before.columns.toSeq} vs ${after.columns.toSeq}")
    val attrs = before.columns.filterNot(keyCols.contains).toSeq
    require(attrs.nonEmpty, "snapshots have no non-key attributes to compare")
    val b = before.select((keyCols.map(col) :+
      struct(attrs.map(col): _*).as("__b")): _*)
    val a = after.select((keyCols.map(col) :+
      struct(attrs.map(col): _*).as("__a")): _*)
    b.join(a, keyCols, "full_outer")
      .withColumn("change",
        when(col("__b").isNull, lit("added"))
          .when(col("__a").isNull, lit("removed"))
          .when(!(col("__b") <=> col("__a")), lit("changed")))
      .filter(col("change").isNotNull)
      .select((keyCols.map(col) :+ col("change")): _*)
  }
}
