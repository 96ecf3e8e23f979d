package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.derive.SqlTypes
import graft.exec.Defaults
import graft.model.{Column => MCol, Nullable, TypeDefaults}

/** Table-driven tests for the SQL-type translation and default-literal
  * parsing (SURVEY §7.4.5 calls these out as easy to get subtly
  * wrong). */
class SqlTypesSpec extends AnyFunSuite {

  test("SQL type string -> Spark DataType") {
    val cases: Seq[(String, DataType)] = Seq(
      "integer" -> IntegerType,
      "serial" -> IntegerType,
      "smallserial" -> ShortType,
      "bigserial" -> LongType,
      "bigint" -> LongType,
      "smallint" -> ShortType,
      "double precision" -> DoubleType,
      "real" -> FloatType,
      "boolean" -> BooleanType,
      "uuid" -> StringType,
      "text" -> StringType,
      "character varying(50)" -> StringType,
      "character varying(1024)" -> StringType,
      "timestamp without time zone" -> TimestampType,
      "timestamp with time zone" -> TimestampType,
      "date" -> DateType,
      "numeric(9,6)" -> DecimalType(9, 6),
      "numeric(18, 2)" -> DecimalType(18, 2),
      "numeric(10)" -> DecimalType(10, 0),
      "json" -> MapType(IntegerType, IntegerType, valueContainsNull = false)
    )
    cases.foreach { case (sql, dt) =>
      assert(SqlTypes.toDataType(sql) == dt, s"for $sql")
    }
  }

  test("unmapped type raises") {
    intercept[IllegalArgumentException](SqlTypes.toDataType("interval"))
  }

  test("nullability carries into StructField") {
    assert(SqlTypes.toStructField(MCol("a", "bigint", Nullable.NotNull)) ==
      StructField("a", LongType, nullable = false))
    assert(SqlTypes.toStructField(MCol("a", "bigint", Nullable.Null)).nullable)
  }

  test("default literal parsing: numbers, strings, pg casts, timestamps") {
    // values verified by evaluating against a literal dataframe
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq(1).toDF("x")
    def eval(sql: String, colType: String): Any =
      df.select(Defaults.defaultLiteral(sql, colType)).head().get(0)
    assert(eval("-1", "integer") == -1)
    assert(eval("'__UNKNOWN_VAL__'", "text") == "__UNKNOWN_VAL__")
    assert(eval("'00000000-0000-0000-0000-000000000000'::uuid", "uuid") ==
      "00000000-0000-0000-0000-000000000000")
    assert(eval("false", "boolean") == false)
    assert(eval("timestamp'1970-01-01 00:00:00'", "timestamp without time zone") ==
      java.sql.Timestamp.valueOf("1970-01-01 00:00:00"))
    assert(eval("-1", "numeric(18,6)") == new java.math.BigDecimal("-1.000000"))
  }

  test("coalesced applies default only to nullable columns") {
    val spark = SparkSpec.session
    val defaults = TypeDefaults(Map("bigint" -> "-1"))
    import spark.implicits._
    val df = Seq((Some(5L), 7L), (None, 8L)).toDF("a", "b")
    val out = df.select(
      Defaults.coalesced(org.apache.spark.sql.functions.col("a"),
        MCol("a", "bigint", Nullable.Null), defaults).as("a"),
      Defaults.coalesced(org.apache.spark.sql.functions.col("b"),
        MCol("b", "bigint", Nullable.NotNull), defaults).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((5L, 7L), (-1L, 8L)))
  }
}
