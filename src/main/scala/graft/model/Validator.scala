package graft.model

import graft.model.FactColumnKind._
import graft.model.ValidationError._

/** Model validation, ported 1:1 from the reference
  * (`src/Ringo/Validator.hs:33-110`). The only way to obtain an [[Env]].
  */
object Validator {

  def validateEnv(
      tables: Seq[Table],
      facts: Seq[Fact],
      settings: Settings,
      typeDefaults: TypeDefaults
  ): Either[Seq[ValidationError], Env] = {
    val tableVs = tables.flatMap(validateTable(tables, _))
    val factVs  = facts.flatMap(validateFact(tables, facts, typeDefaults, _))
    val dupTableVs = findDups(tables.map(_.name)).map(DuplicateTable)
    val dupFactVs  = findDups(facts.map(_.name)).map(DuplicateFact)
    val dupColVs = tables.flatMap { t =>
      findDups(t.columns.map(_.name)).map(DuplicateColumn(t.name, _))
    }
    val vs = (tableVs ++ factVs ++ dupTableVs ++ dupFactVs ++ dupColVs).distinct
    if (vs.isEmpty) Right(Env(tables, facts, settings, typeDefaults)) else Left(vs)
  }

  /** `Validator.hs:28-31`: column must exist in the table. */
  private def checkTableForCol(table: Table, colName: String): Seq[ValidationError] =
    if (table.columns.exists(_.name == colName)) Nil
    else Seq(MissingColumn(table.name, colName))

  /** `Validator.hs:33-46`: every constraint's columns must exist; FK
    * target tables must exist and their referenced columns too. */
  private def validateTable(tables: Seq[Table], table: Table): Seq[ValidationError] =
    table.constraints.flatMap {
      case TableConstraint.PrimaryKey(col)  => checkTableForCol(table, col)
      case TableConstraint.UniqueKey(cols)  => cols.flatMap(checkTableForCol(table, _))
      case TableConstraint.ForeignKey(oTableName, colMap) =>
        tables.find(_.name == oTableName) match {
          case Some(oTable) =>
            colMap.flatMap { case (c, _) => checkTableForCol(table, c) } ++
              colMap.flatMap { case (_, c) => checkTableForCol(oTable, c) }
          case None => Seq(MissingTable(oTableName))
        }
    }

  /** `Validator.hs:48-92`. The `visiting` set guards against parent
    * cycles (which the reference would recurse forever on) — a cyclic
    * parent declaration simply stops recursing; the cycle itself
    * surfaces later as a dependency-ordering failure. */
  private def validateFact(
      tables: Seq[Table],
      facts: Seq[Fact],
      typeDefaults: TypeDefaults,
      fact: Fact,
      visiting: Set[String] = Set.empty
  ): Seq[ValidationError] =
    tables.find(_.name == fact.tableName) match {
      case None => Seq(MissingTable(fact.tableName))
      case Some(table) =>
        val tableVs = validateTable(tables, table)
        val parentVs = fact.parentNames.flatMap { pName =>
          facts.find(_.name == pName) match {
            case None => Seq(MissingFact(pName))
            case Some(_) if visiting.contains(pName) || pName == fact.name =>
              Seq(CyclicFactParents(pName))
            case Some(pFact) =>
              validateFact(tables, facts, typeDefaults, pFact, visiting + fact.name)
          }
        }
        val colVs = fact.columns.flatMap { fc =>
          fc.sourceColumnName.toSeq.flatMap(checkTableForCol(table, _)) ++
            (fc.kind match {
              case DimId(target) if !tables.exists(_.name == target) =>
                Seq(MissingTable(target))
              case _ => Nil
            })
        }
        val timeCols = fact.columns.collect { case FactColumn(c, DimTime) => c }
        val timeVs =
          if (timeCols.isEmpty) Seq(MissingTimeColumn(fact.tableName)) else Nil
        // The DimTime column must be declared NOT NULL (`Validator.hs:60-64`).
        val notNullVs = timeCols.flatMap { cName =>
          table.findColumn(cName).toSeq.collect {
            case col if col.isNullable => MissingNotNullConstraint(fact.tableName, cName)
          }
        }
        // Every DimVal/NoDimId/TenantId/DimId source column's type must
        // prefix-match a type default (`Validator.hs:66-75`).
        val defaultNeedingCols =
          fact.columns.collect { case FactColumn(c, DimVal(_)) => c } ++
            fact.columns.collect { case FactColumn(c, NoDimId) => c } ++
            fact.columns.collect { case FactColumn(c, TenantId) => c } ++
            fact.columns.collect { case FactColumn(c, DimId(_)) => c }
        val typeDefaultVs = defaultNeedingCols.flatMap { cName =>
          table.findColumn(cName).toSeq.collect {
            case col if typeDefaults.forType(col.columnType).isEmpty =>
              MissingTypeDefault(col.columnType)
          }
        }
        tableVs ++ parentVs ++ colVs ++ timeVs ++ notNullVs ++ typeDefaultVs
    }

  private def findDups(names: Seq[String]): Seq[String] =
    names.sorted.groupBy(identity).collect { case (n, g) if g.size > 1 => n }.toSeq.sorted
}
