package graft.exec

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Deterministic surrogate key assignment (P3 in SURVEY §2.0).
  *
  * The reference delegates to Postgres `serial`
  * (`src/Ringo/Types/Internal.hs:160-161`); ids are dense, 1-based,
  * assigned at insert. Here: global sort on the natural key followed by
  * `zipWithIndex`. Unlike a single-partition `row_number()` window this
  * stays fully distributed (range-partitioned sort + a cheap
  * partition-size count job), so it holds for dimension tables of any
  * size; ids are gap-free and deterministic because the sort order is
  * total (natural keys are unique post-distinct).
  */
object SurrogateKeys {

  /** Prepend `idColName` = 1 + offset, 2 + offset, ... in natural-key
    * sort order. Equivalent to SQL
    * `row_number() OVER (ORDER BY keyCols) + offset`. */
  def assign(
      df: DataFrame,
      keyCols: Seq[String],
      idColName: String,
      idType: DataType,
      offset: Long = 0L
  ): DataFrame = {
    val sorted = df.sort(keyCols.map(col): _*)
    val schema = StructType(
      StructField(idColName, LongType, nullable = false) +: sorted.schema.fields)
    val withIds = sorted.rdd
      .zipWithIndex()
      .map { case (row, i) => Row.fromSeq((i + 1L + offset) +: row.toSeq) }
    val out = df.sparkSession.createDataFrame(withIds, schema)
    if (idType == LongType) out
    else out.withColumn(idColName, col(idColName).cast(idType))
  }
}
