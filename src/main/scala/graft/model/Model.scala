package graft.model

/** Core model ADTs for the star-schema transformer.
  *
  * Semantics derived from the reference at /root/reference
  * (quintype/ringo): `src/Ringo/Types/Internal.hs:23-198`. Re-expressed
  * as idiomatic Scala case classes / sealed traits; no code is copied.
  */

sealed trait Nullable
object Nullable {
  case object Null    extends Nullable
  case object NotNull extends Nullable
}

/** A column of a declared OLTP table or a derived OLAP table.
  * `columnType` is an opaque SQL type string (e.g. "integer", "uuid",
  * "character varying(50)") exactly as in the reference
  * (`src/Ringo/Types/Internal.hs:29-33`); interpretation is limited to
  * the serial-family mapping, prefix matching against type defaults,
  * and the SQL-type -> Spark DataType translation in
  * [[graft.derive.SqlTypes]].
  */
final case class Column(
    name: String,
    columnType: String,
    nullable: Nullable = Nullable.Null
) {
  def isNullable: Boolean = nullable == Nullable.Null
}

/** Declared table constraints (`src/Ringo/Types/Internal.hs:41-44`).
  * Spark does not enforce them; FK pairs drive join conditions, UKs
  * drive dedup keys / uniqueness assertions, PKs document surrogate
  * keys.
  */
sealed trait TableConstraint
object TableConstraint {
  final case class PrimaryKey(column: String)         extends TableConstraint
  final case class UniqueKey(columns: Seq[String])    extends TableConstraint
  final case class ForeignKey(table: String, columnMapping: Seq[(String, String)])
      extends TableConstraint
}

final case class Table(
    name: String,
    columns: Seq[Column],
    constraints: Seq[TableConstraint] = Nil
) {
  def findColumn(colName: String): Option[Column] = columns.find(_.name == colName)
}

/** Time bucket granularity (`src/Ringo/Types/Internal.hs:61-72`). */
sealed abstract class TimeUnit(val unitName: String, val seconds: Long)
object TimeUnit {
  case object Second extends TimeUnit("second", 1L)
  case object Minute extends TimeUnit("minute", 60L)
  case object Hour   extends TimeUnit("hour", 3600L)
  case object Day    extends TimeUnit("day", 86400L)
  case object Week   extends TimeUnit("week", 604800L)
  val all: Seq[TimeUnit] = Seq(Second, Minute, Hour, Day, Week)
  def fromName(s: String): TimeUnit =
    all.find(_.unitName == s.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"unknown time unit: $s"))
}

/** The 11 fact-column roles (`src/Ringo/Types/Internal.hs:87-116`).
  * The GADT type-indices of the reference collapse to a plain sealed
  * trait; exhaustiveness is via pattern matching.
  */
sealed trait FactColumnKind
object FactColumnKind {
  /** Event timestamp; becomes the time-bucket grouping key. */
  case object DimTime                                     extends FactColumnKind
  /** Degenerate dimension kept inline; grouping key. */
  case object NoDimId                                     extends FactColumnKind
  /** Like NoDimId, additionally drives the (tenant, time) composite index. */
  case object TenantId                                    extends FactColumnKind
  /** FK to an existing (declared) dimension table. */
  final case class DimId(targetTable: String)             extends FactColumnKind
  /** Value contributing to a derived dimension table `dim_<target>`. */
  final case class DimVal(targetTable: String)            extends FactColumnKind
  /** count(*) (None) or count(col) (Some col). */
  final case class FactCount(sourceColumn: Option[String]) extends FactColumnKind
  /** Probabilistic distinct count of col (or of the source PK when None). */
  final case class FactCountDistinct(sourceColumn: Option[String]) extends FactColumnKind
  final case class FactSum(sourceColumn: String)          extends FactColumnKind
  /** Decomposed into count+sum columns for re-aggregability. */
  final case class FactAverage(sourceColumn: String)      extends FactColumnKind
  final case class FactMax(sourceColumn: String)          extends FactColumnKind
  final case class FactMin(sourceColumn: String)          extends FactColumnKind
}

/** `src/Ringo/Types/Internal.hs:101-116`: target column + role. */
final case class FactColumn(targetColumn: String, kind: FactColumnKind) {
  import FactColumnKind._
  /** Source-table column this fact column reads
    * (`src/Ringo/Types/Internal.hs:120-132`). */
  def sourceColumnName: Option[String] = kind match {
    case DimTime | NoDimId | TenantId    => Some(targetColumn)
    case DimId(_) | DimVal(_)            => Some(targetColumn)
    case FactCount(src)                  => src
    case FactCountDistinct(src)          => src
    case FactSum(src)                    => Some(src)
    case FactAverage(src)                => Some(src)
    case FactMax(src)                    => Some(src)
    case FactMin(src)                    => Some(src)
  }
}

final case class Fact(
    name: String,
    tableName: String,
    persistent: Boolean = true,
    parentNames: Seq[String] = Nil,
    columns: Seq[FactColumn] = Nil
)

/** All knobs, with the reference defaults
  * (`src/Ringo/Types/Internal.hs:134-169`). */
final case class Settings(
    dimPrefix: String = "dim_",
    factPrefix: String = "fact_",
    timeUnit: TimeUnit = TimeUnit.Minute,
    avgCountColumnSuffix: String = "_count",
    avgSumColumnSuffix: String = "_sum",
    dimTableIdColumnName: String = "id",
    dimTableIdColumnType: String = "serial",
    factCountColumnType: String = "integer",
    factCountDistinctErrorRate: Double = 0.05,
    factInfix: String = "_by_",
    dependenciesJsonFileName: String = "dependencies.json",
    factsJsonFileName: String = "facts.json",
    dimensionsJsonFileName: String = "dimensions.json",
    foreignKeyIdCoalesceValue: Int = -1,
    tableNameSuffixTemplate: String = "{{suff}}",
    // Engine extension (no reference analogue — Postgres has no
    // broadcast): the largest estimated dim size FactPopulate may
    // force-broadcast for its lookup joins. Dims above this (a
    // DimVal-derived dimension over a high-cardinality natural key can
    // be arbitrarily large) join WITHOUT the hint, leaving the
    // build-side choice to Catalyst/AQE runtime statistics.
    dimBroadcastMaxBytes: Long = 256L * 1024 * 1024
)

sealed trait ValidationError
object ValidationError {
  final case class MissingTable(table: String)                          extends ValidationError
  final case class DuplicateTable(table: String)                        extends ValidationError
  final case class MissingFact(fact: String)                            extends ValidationError
  final case class DuplicateFact(fact: String)                          extends ValidationError
  final case class MissingColumn(table: String, column: String)         extends ValidationError
  final case class DuplicateColumn(table: String, column: String)       extends ValidationError
  final case class MissingTimeColumn(table: String)                     extends ValidationError
  final case class MissingNotNullConstraint(table: String, column: String) extends ValidationError
  final case class MissingTypeDefault(columnType: String)               extends ValidationError
  /** Engine extension (not in the reference taxonomy): a parent-fact
    * cycle, which the reference's recursive validation would loop on
    * forever and derivation could never order. */
  final case class CyclicFactParents(fact: String)                      extends ValidationError
}

/** SQL-type-prefix -> default literal (SQL text), prefix-matched
  * (`src/Ringo/Generator/Internal.hs:32-36`): first match in ascending
  * key order, exactly like the reference's `find` over `Map.toList`
  * (so "timestamp" shadows "timestamp without time zone" when both are
  * declared, because it sorts first). */
final case class TypeDefaults(defaults: Map[String, String]) {
  /** Default literal for a column type, matching by prefix. */
  def forType(columnType: String): Option[String] =
    defaults.toSeq
      .sortBy { case (prefix, _) => prefix }
      .find { case (prefix, _) => columnType.startsWith(prefix) }
      .map(_._2)
}

/** Validated model bundle; only constructed via
  * [[graft.model.Validator.validateEnv]] (cf. `src/Ringo.hs:142-143`). */
final case class Env private[model] (
    tables: Seq[Table],
    facts: Seq[Fact],
    settings: Settings,
    typeDefaults: TypeDefaults
) {
  def findTable(name: String): Option[Table] = tables.find(_.name == name)
  def findFact(name: String): Option[Fact]   = facts.find(_.name == name)
}

sealed trait PopulationMode
object PopulationMode {
  case object Full        extends PopulationMode
  case object Incremental extends PopulationMode
}

/** Refresh window bounds, the executable analogue of the reference's
  * `?` time placeholders (`src/Ringo/Generator/Populate/Fact.hs:213-215`).
  * Full refresh has only an upper bound; incremental has both. Windows
  * must be aligned to the settings TimeUnit (SURVEY §7.4.3). */
final case class TimeWindow(lower: Option[java.sql.Timestamp], upper: Option[java.sql.Timestamp])
object TimeWindow {
  val unbounded: TimeWindow = TimeWindow(None, None)
  def upTo(hi: java.sql.Timestamp): TimeWindow = TimeWindow(None, Some(hi))
  def between(lo: java.sql.Timestamp, hi: java.sql.Timestamp): TimeWindow =
    TimeWindow(Some(lo), Some(hi))
}
