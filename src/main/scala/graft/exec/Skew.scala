package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join splitting only applies to sort-merge joins and only
  * per-partition; for a pathologically hot key in an equi-join (the
  * classic 100 TB failure mode: one tenant/one null-bucket holding 10%
  * of rows) explicit salting bounds the per-task work deterministically:
  * the build side is replicated `salt` times, the probe side scatters
  * each hot key's rows across the replicas by a row-hash.
  */
object Skew {

  /** Equi-join `left.key == right.key` with the right side replicated
    * `salt` ways. Produces exactly the same rows as the plain join for
    * any join type where right side is the build/lookup side
    * ("inner", "left_outer").
    *
    * The salt column on the probe side is derived from a hash of the
    * whole row — deterministic, no RNG state, stable under retries. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salt: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(salt > 1, "salt must be > 1")
    require(joinType == "inner" || joinType == "left_outer",
      s"unsupported join type for salted join: $joinType")
    val leftSalted = left.withColumn(
      "__salt",
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(salt.toLong)).cast("int"))
    val rightSalted = right
      .withColumn("__salt_arr", sequence(lit(0), lit(salt - 1)))
      .withColumn("__salt", explode(col("__salt_arr")))
      .drop("__salt_arr")
    leftSalted
      .join(rightSalted, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Top key frequencies — the diagnostic for choosing salting; cheap
    * (single partial-agg pass + small sort). */
  def keyHistogram(df: DataFrame, key: String, topK: Int = 20): DataFrame =
    df.groupBy(col(key)).count().orderBy(col("count").desc).limit(topK)
}
