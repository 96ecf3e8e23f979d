package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed managed-table writes (the D3 `bucketBy` path, SURVEY §2.9):
  * co-locating two tables on their join key lets repeated joins run
  * shuffle-free — at 100 TB the dominant cost of a fact-to-fact or
  * fact-to-bigdim join is the exchange, and bucketing pays it once at
  * write time instead of per query.
  */
object Bucketing {

  /** Write `df` as a managed bucketed table (sorted within buckets for
    * merge-friendly reads). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int
  ): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket column — planner emits
    * a sort-merge join with NO exchange on either side. */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String,
      joinType: String = "inner"
  ): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
