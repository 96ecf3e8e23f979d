package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * Sorting a 100 TB fact by ONE column gives perfect min/max pruning
  * on that column and none on any other; interleaving the bits of two
  * coordinates makes file-level min/max ranges tight in BOTH
  * dimensions at once, so scans filtered on either (or both) skip most
  * files. This is the layout trick behind Delta/Iceberg OPTIMIZE
  * ZORDER; Spark itself only needs a sort key, which is what
  * [[zValue]] computes.
  *
  * Everything is integer shift/mask arithmetic (whole-stage-codegen
  * friendly, no UDF) and exactly reproducible across engines — the
  * DuckDB oracle mirrors the same constants.
  */
object ZOrder {

  /** Interleave the low 31 bits of `a` and `b` (a in even positions,
    * b in odd): a 62-bit non-negative Morton key. Inputs must already
    * be non-negative rank/bucket values below 2^31 — fail-loud
    * otherwise (a silently wrapped coordinate would scramble the
    * curve, not error).
    */
  def zValue(a: Column, b: Column): Column = {
    def guarded(c: Column): Column =
      when(c < 0L || c > 0x7FFFFFFFL, raise_error(
        concat(lit("zValue coordinate out of [0, 2^31): "), c.cast("string"))))
        .otherwise(c)
    spread(guarded(a)).bitwiseOR(shiftleft(spread(guarded(b)), 1))
  }

  /** Spread bits of a 32-bit value so bit i lands at position 2i. */
  private def spread(c: Column): Column = {
    var x: Column = c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** N-column Morton key: bit i of coordinate j lands at position
    * `i*N + j` — column 0 in the lowest lane, so the 2-column case is
    * bit-identical to [[zValue]] (spec-pinned). The 63-bit non-negative
    * budget splits as `floor(63/N)` bits per coordinate; every input
    * must be in `[0, 2^(63/N))`, enforced fail-loud like [[zValue]] (a
    * silently wrapped coordinate would scramble the curve, not error).
    *
    * Built as a flat OR of shift/mask terms — pure integer arithmetic,
    * whole-stage-codegen'd; the range guard wraps the whole key once
    * per row rather than once per term.
    */
  def zValueN(coords: Seq[Column]): Column = {
    val n = coords.size
    require(n >= 2, s"zValueN needs at least 2 coordinates, got $n")
    require(n <= 21, s"zValueN supports at most 21 coordinates (63-bit budget), got $n")
    val bitsPer = 63 / n
    val limit   = 1L << bitsPer
    val longs   = coords.map(_.cast("long"))
    val bad     = longs.map(c => c < 0L || c >= limit).reduce(_ || _)
    val terms = longs.zipWithIndex.flatMap { case (c, j) =>
      (0 until bitsPer).map(i =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j))
    }
    when(bad, raise_error(concat(
      lit(s"zValueN coordinate out of [0, 2^$bitsPer): ("),
      concat_ws(", ", longs.map(_.cast("string")): _*), lit(")"))))
      .otherwise(terms.reduce(_ bitwiseOR _))
  }

  /** The [[zValueN]] interleave as a DuckDB QUERY for oracle
    * mirroring: one flat OR of `((c >> i) & 1) << (i*N + j)` terms —
    * text grows linearly with the bit budget (unlike the inline
    * magic-mask fold, which doubles per step). `fromSql` exposes
    * `keepCols` and the coordinate columns; the result adds `zval`. */
  def zValueNQuerySql(fromSql: String, keepCols: Seq[String], coords: Seq[String]): String = {
    val n = coords.size
    require(n >= 2, s"zValueNQuerySql needs at least 2 coordinates, got $n")
    val bitsPer = 63 / n
    val terms = coords.zipWithIndex.flatMap { case (c, j) =>
      (0 until bitsPer).map(i =>
        s"(((CAST($c AS BIGINT) >> $i) & 1) << ${i * n + j})")
    }
    // OR operators go at line END: a line-leading "|" would be eaten
    // as a margin by the stripMargin below.
    s"""SELECT ${keepCols.mkString(", ")},
       |       (${terms.mkString(" |\n        ")}) AS zval
       |FROM $fromSql""".stripMargin
  }

  /** The same interleave as a DuckDB QUERY (decimal constants), for
    * oracle mirroring: each spread step binds to an alias in a nested
    * subquery, so every input expression appears exactly once per step
    * — the inline-expression form doubles the text per fold step (32
    * copies of each coordinate by step five) and grows exponentially
    * with curve width. `fromSql` supplies the source relation (a table
    * name or parenthesized subquery) exposing `keepCols`, `a` and `b`;
    * the result adds a `zval` column. */
  def zValueQuerySql(fromSql: String, keepCols: Seq[String], a: String, b: String): String = {
    val keep  = keepCols.mkString(", ")
    val masks = Seq(
      16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
      4  -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
      1  -> 0x5555555555555555L)
    val seed =
      s"""SELECT $keep,
         |       (CAST($a AS BIGINT) & 4294967295) AS xa,
         |       (CAST($b AS BIGINT) & 4294967295) AS xb
         |FROM $fromSql""".stripMargin
    val spread = masks.foldLeft(seed) { case (inner, (shift, mask)) =>
      s"""SELECT $keep,
         |       ((xa | (xa << $shift)) & $mask) AS xa,
         |       ((xb | (xb << $shift)) & $mask) AS xb
         |FROM (
         |$inner
         |)""".stripMargin
    }
    s"""SELECT $keep, (xa | (xb << 1)) AS zval
       |FROM (
       |$spread
       |)""".stripMargin
  }

  /** Lay `df` out on the z-curve of (aCol, bCol): range-partition on
    * the Morton key into `numPartitions` output files, sorted within
    * each. File-level (aCol, bCol) min/max ranges become hypercubes on
    * the curve — both dimensions prune. The key column is dropped from
    * the output; layout is an ordering property.
    */
  def zorderBy(
      df: DataFrame, aCol: String, bCol: String, numPartitions: Int
  ): DataFrame =
    layoutByKey(df, zValue(col(aCol), col(bCol)), numPartitions)

  /** [[zorderBy]] over N columns via [[zValueN]]: file-level min/max
    * ranges become hypercubes on the N-dimensional curve — every
    * filtered dimension prunes. Note the coverage trade: each extra
    * dimension costs interleave bits (63/N per column), so ranges get
    * coarser — 2-4 dimensions is the useful regime, matching the
    * Delta/Iceberg ZORDER guidance. */
  def zorderByN(df: DataFrame, cols: Seq[String], numPartitions: Int): DataFrame =
    layoutByKey(df, zValueN(cols.map(col)), numPartitions)

  private def layoutByKey(df: DataFrame, key: Column, numPartitions: Int): DataFrame = {
    require(numPartitions > 0, s"numPartitions must be positive, got $numPartitions")
    require(!df.columns.contains("__z"),
      "zorder layout would overwrite existing column '__z' — rename it first")
    df.withColumn("__z", key)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
