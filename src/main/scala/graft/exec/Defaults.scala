package graft.exec

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.derive.SqlTypes
import graft.model.{Column => MCol, TypeDefaults}

/** NULL-default projection (F2 in SURVEY §2.0): `coalesce(col,
  * typeDefault)` on nullable columns only
  * (`src/Ringo/Generator/Internal.hs:24-36`).
  */
object Defaults {

  /** Parse a SQL default literal (e.g. `-1`, `'__UNKNOWN_VAL__'`,
    * `'...'::uuid`) into a Spark literal of the column's type.
    * Postgres `::type` suffix casts are stripped; the value is cast to
    * the column's mapped Spark type. */
  def defaultLiteral(sqlLiteral: String, columnType: String): Column = {
    val cleaned = sqlLiteral.trim.replaceAll("::[a-zA-Z_ ]+$", "")
    expr(cleaned).cast(SqlTypes.toDataType(columnType))
  }

  /** The default literal for a column, resolved by type-prefix match;
    * errors if validation missed it (mirrors the reference's `error`). */
  def forColumn(defaults: TypeDefaults, column: MCol): Column =
    defaults
      .forType(column.columnType)
      .map(defaultLiteral(_, column.columnType))
      .getOrElse(throw new IllegalStateException(
        s"Default value not known for column type: ${column.columnType}"))

  /** `coalesce(col, default)` when nullable, the bare column otherwise. */
  def coalesced(c: Column, column: MCol, defaults: TypeDefaults): Column =
    if (column.isNullable) coalesce(c, forColumn(defaults, column)) else c
}
