package graft.model

/** Naming / renaming rules (N1 in SURVEY §2.0).
  * Reference: `src/Ringo/Extractor/Internal.hs:34-59`,
  * `src/Ringo/Generator/Internal.hs:38-41`.
  */
object Naming {

  /** Strip the `<dim>_` prefix from a contributing column's name
    * (`Extractor/Internal.hs:34-36`): `geo_country_name` in dim `geo`
    * becomes `country_name`; unprefixed names pass through. */
  def dimColumnName(dimName: String, columnName: String): String = {
    val prefix = dimName + "_"
    if (columnName.startsWith(prefix)) columnName.stripPrefix(prefix) else columnName
  }

  /** `<col>_<unit>_<idCol>`, e.g. `created_at_minute_id`
    * (`Extractor/Internal.hs:38-40`). */
  def timeUnitColumnName(dimIdColName: String, colName: String, timeUnit: TimeUnit): String =
    s"${colName}_${timeUnit.unitName}_${dimIdColName}"

  /** FK id column in the fact table for a dimension
    * (`Extractor/Internal.hs:42-48`): for an *existing* (declared)
    * dimension table, the name of the fact's DimId target column; for a
    * *derived* dimension, `<dim-without-prefix>_<idCol>`. */
  def factDimFKIdColumnName(
      dimPrefix: String,
      dimIdColName: String,
      dimFact: Fact,
      dimTable: Table,
      declaredTables: Seq[Table]
  ): String =
    if (declaredTables.contains(dimTable)) {
      dimFact.columns.collectFirst {
        case FactColumn(target, FactColumnKind.DimId(t)) if t == dimTable.name => target
      }.getOrElse(
        throw new IllegalStateException(s"no DimId column targeting ${dimTable.name}"))
    } else {
      val base =
        if (dimTable.name.startsWith(dimPrefix)) dimTable.name.stripPrefix(dimPrefix)
        else dimTable.name
      s"${base}_${dimIdColName}"
    }

  /** `fact_<name>_by_<unit>` (`Extractor/Internal.hs:50-52`). */
  def extractedFactTableName(
      factPrefix: String,
      factInfix: String,
      factName: String,
      timeUnit: TimeUnit
  ): String = s"$factPrefix$factName$factInfix${timeUnit.unitName}"

  /** Postgres serial-family -> plain integer family for FK columns
    * (`Extractor/Internal.hs:54-59`). */
  def idColTypeToFKIdColType(columnType: String): String =
    columnType.toLowerCase match {
      case "serial"      => "integer"
      case "smallserial" => "smallint"
      case "bigserial"   => "bigint"
      case _             => columnType
    }

  /** Full-refresh writes target the suffixed (staging) table; incremental
    * writes target the live table (`Generator/Internal.hs:38-41`) —
    * enables swap-in-place full rebuilds. */
  def suffixTableName(popMode: PopulationMode, suffix: String, tableName: String): String =
    popMode match {
      case PopulationMode.Full        => tableName + suffix
      case PopulationMode.Incremental => tableName
    }

  /** Resolve the mustache-style suffix template to a concrete staging
    * suffix. The reference emits the template literally into its SQL
    * (`{{suff}}` by default) and leaves substitution to the
    * orchestrator; an executable run must substitute it itself.
    * A template with no placeholder is already concrete and passes
    * through; an empty template disables staging. */
  def resolveSuffixTemplate(template: String, suff: String): String =
    template.replace("{{suff}}", suff)

  /** Column-name mapping (dimCol -> factSourceCol) for a derived dim
    * (`Generator/Internal.hs:16-21`). */
  def dimColumnMapping(dimPrefix: String, fact: Fact, dimTableName: String): Seq[(String, String)] =
    fact.columns.collect {
      case FactColumn(target, FactColumnKind.DimVal(t)) if dimPrefix + t == dimTableName =>
        (dimColumnName(t, target), target)
    }
}
