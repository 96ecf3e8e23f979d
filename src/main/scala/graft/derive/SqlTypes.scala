package graft.derive

import org.apache.spark.sql.types._

import graft.model.{Column => MCol, Nullable, Table => MTable}

/** SQL-type-string -> Spark DataType translation (SURVEY §1.3).
  * The reference treats types as opaque strings; we interpret just
  * enough to materialize derived tables as typed parquet.
  */
object SqlTypes {

  private val NumericRe = """numeric\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val NumericPRe = """numeric\s*\(\s*(\d+)\s*\)""".r

  def toDataType(sqlType: String): DataType = {
    val t = sqlType.trim.toLowerCase
    t match {
      case "smallint" | "smallserial"            => ShortType
      case "integer" | "int" | "int4" | "serial" => IntegerType
      case "bigint" | "int8" | "bigserial"       => LongType
      case "real" | "float4"                     => FloatType
      case "double precision" | "float8" | "double" => DoubleType
      case "boolean" | "bool"                    => BooleanType
      case "date"                                => DateType
      case "uuid"                                => StringType
      case "json" | "jsonb" =>
        // sketch container (SURVEY §2.8): sparse register map, not JSON text
        MapType(IntegerType, IntegerType, valueContainsNull = false)
      case NumericRe(p, s)                       => DecimalType(p.toInt, s.toInt)
      case NumericPRe(p)                         => DecimalType(p.toInt, 0)
      case "numeric" | "decimal"                 => DecimalType(38, 18)
      case _ if t.startsWith("timestamp")        => TimestampType
      case _ if t.startsWith("character") || t.startsWith("varchar") ||
                t.startsWith("char") || t == "text" => StringType
      case other =>
        throw new IllegalArgumentException(s"unmapped SQL type: $other")
    }
  }

  def toStructField(c: MCol): StructField =
    StructField(c.name, toDataType(c.columnType), nullable = c.nullable == Nullable.Null)

  def toStructType(t: MTable): StructType = StructType(t.columns.map(toStructField))
}
