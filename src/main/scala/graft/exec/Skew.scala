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

  /** Measure-then-salt: the diagnosis that decides whether
    * [[saltedJoin]] is needed and with which factor. Reports the
    * top-k heaviest join keys with exact integer share
    * (parts-per-million, floor `div` — engine-portable) and a
    * suggested salt: the number of `parallelism`-wide task slots this
    * key's rows should scatter over so no task holds more than ~1/P
    * of the relation, `max(1, ceil(share * P))`. A suggestion of 1
    * means the key is fine unsalted. One partial-aggregated groupBy;
    * the global top-k is a TakeOrdered (per-task bounded heaps, never
    * a full-key-set sort), and the rank window runs over the ALREADY
    * LIMITED ≤ topK rows — the global-window input is bounded by
    * construction (PlanSpec-pinned); the 1-row total attaches by
    * broadcast crossJoin, no driver collect. NULL keys group together
    * deliberately — the null bucket IS the classic hot key. */
  def diagnose(df: DataFrame, keyCol: String, topK: Int, parallelism: Int): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(parallelism > 0, s"parallelism must be positive, got $parallelism")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val total  = counts.agg(sum(col("n")).as("__total"))
    // nulls-last pinned explicitly: Spark defaults ASC NULLS FIRST,
    // DuckDB NULLS LAST — a count tie against the null bucket would
    // otherwise rank differently across engines. The limit uses the
    // SAME total order as the rank, so limit-then-rank equals
    // rank-then-filter exactly.
    val byShare = Seq(col("n").desc, col(keyCol).asc_nulls_last)
    val w = org.apache.spark.sql.expressions.Window.orderBy(byShare: _*)
    counts
      .orderBy(byShare: _*).limit(topK)
      .withColumn("rank", row_number().over(w).cast("int"))
      .crossJoin(broadcast(total))
      // decimal operands: n * 1e6 overflows a long once a key holds
      // ~1e13 rows — exactly the regime this diagnosis exists for
      .withColumn("share_ppm",
        expr("(CAST(n AS DECIMAL(38,0)) * 1000000) div CAST(__total AS DECIMAL(38,0))"))
      .withColumn("suggested_salt",
        greatest(lit(1L), expr(
          s"(CAST(n AS DECIMAL(38,0)) * $parallelism + __total - 1)" +
            " div CAST(__total AS DECIMAL(38,0))")))
      .select(col(keyCol), col("n"), col("rank"),
        col("share_ppm"), col("suggested_salt"))
  }

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
