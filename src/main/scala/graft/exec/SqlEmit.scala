package graft.exec

import graft.derive.SqlTypes
import graft.model._
import graft.model.FactColumnKind._

/** Populate-SQL artifact emission — the reference's primary product
  * (`app/Main.hs:75-81` writes `fullrefresh/<table>.sql` and
  * `increfresh/<table>.sql` next to `create/<table>.sql`;
  * `src/Ringo/Generator/Populate/Dimension.hs:27-60`,
  * `src/Ringo/Generator/Populate/Fact.hs:127-230`).
  *
  * The emitted text is Spark SQL describing EXACTLY the pipelines
  * [[DimPopulate]] / [[FactPopulate]] execute — the same coalesce
  * defaults, time bucketing, broadcast dim lookups and aggregates — so
  * an orchestrator driving a Spark catalog (or a human reading the
  * artifacts) sees the engine's real semantics. SqlEmitSpec *runs* the
  * emitted SQL and asserts it reproduces the DataFrame pipelines, so
  * the artifacts cannot silently diverge from the engine.
  *
  * Contract (mirroring the reference artifacts):
  *  - window bounds are `?` parameter markers (the reference's JDBC
  *    placeholders) — runnable as-is via Spark parameterized SQL
  *    (`spark.sql(text, args)`): full refresh takes (upper);
  *    incremental takes (upper, lower);
  *  - full-refresh statements target `<table><suffix-template>` (the
  *    reference's `{{suff}}` staging contract,
  *    `Generator/Internal.hs:38-41`) and OVERWRITE; incremental
  *    statements target the live table and append;
  *  - in full mode the fact's dim lookups read the suffixed (staged)
  *    dims, as the reference's generated subqueries do (`Fact.hs:189`);
  *  - count-distinct columns call the `sketch_build` SQL function
  *    ([[graft.functions.RegisterSketch.registerSql]] must have run).
  */
object SqlEmit {

  private def sqlType(columnType: String): String =
    SqlTypes.toDataType(columnType).sql

  /** FK-id SQL type (serial family -> integer family). */
  private def idSqlType(s: Settings): String =
    sqlType(Naming.idColTypeToFKIdColType(s.dimTableIdColumnType))

  /** SQL text of [[Defaults.defaultLiteral]]: strip Postgres `::type`
    * suffix casts, cast to the column's Spark type. */
  private def defaultLit(defaults: TypeDefaults, c: Column): String = {
    val raw = defaults
      .forType(c.columnType)
      .getOrElse(throw new IllegalStateException(
        s"Default value not known for column type: ${c.columnType}"))
    val cleaned = raw.trim.replaceAll("::[a-zA-Z_ ]+$", "")
    s"CAST($cleaned AS ${sqlType(c.columnType)})"
  }

  /** SQL text of [[Defaults.coalesced]]: wrap nullable columns only. */
  private def coalesced(qualified: String, c: Column, defaults: TypeDefaults): String =
    if (c.isNullable) s"coalesce($qualified, ${defaultLit(defaults, c)})" else qualified

  private def findColumn(t: Table, name: String): Column =
    t.findColumn(name)
      .getOrElse(throw new IllegalStateException(s"missing column ${t.name}.$name"))

  /** The shared `SELECT DISTINCT natural-keys FROM source WHERE ...`
    * core of both dim populate modes ([[DimPopulate.candidates]]). */
  private def dimCandidatesSql(
      env: Env, fact: Fact, dimTableName: String, popMode: PopulationMode): String = {
    val s         = env.settings
    val mapping   = Naming.dimColumnMapping(s.dimPrefix, fact, dimTableName)
    val factTable = env.findTable(fact.tableName).get
    val timeCol   = fact.columns.collectFirst { case FactColumn(c, DimTime) => c }.get
    val selectCols = mapping.map { case (dimC, srcC) =>
      s"${coalesced(s"${fact.tableName}.$srcC", findColumn(factTable, srcC), env.typeDefaults)} AS $dimC"
    }
    val notNull = mapping.map { case (_, srcC) => s"$srcC IS NOT NULL" }.mkString(" OR ")
    val window = popMode match {
      case PopulationMode.Full        => s"$timeCol < ?"
      case PopulationMode.Incremental => s"$timeCol < ? AND $timeCol >= ?"
    }
    s"""SELECT DISTINCT
       |       ${selectCols.mkString(",\n       ")}
       |     FROM ${fact.tableName}
       |     WHERE ($notNull)
       |       AND $window""".stripMargin
  }

  /** Populate SQL for one derived dimension table.
    *
    * Surrogate ids are explicit (the reference delegates to Postgres
    * `serial`; Spark has no serial columns): `row_number()` in
    * natural-key order — the SQL form of [[SurrogateKeys.assign]] —
    * continuing after `max(id)` in incremental mode. New-row detection
    * is a LEFT ANTI join (the engine's formulation of the reference's
    * outer-join-all-IS-NULL). */
  def dimensionPopulateSql(
      env: Env, fact: Fact, dimTableName: String, popMode: PopulationMode): String = {
    val s       = env.settings
    val mapping = Naming.dimColumnMapping(s.dimPrefix, fact, dimTableName)
    val idCol   = s.dimTableIdColumnName
    val keys    = mapping.map(_._1)
    val inner   = dimCandidatesSql(env, fact, dimTableName, popMode)
    val orderBy = keys.map(k => s"x.$k").mkString(", ")
    val insertCols = (idCol +: keys).mkString(", ")
    popMode match {
      case PopulationMode.Full =>
        val target = dimTableName + s.tableNameSuffixTemplate
        s"""INSERT OVERWRITE TABLE $target ($insertCols)
           |SELECT
           |    CAST(row_number() OVER (ORDER BY $orderBy) AS ${idSqlType(s)}) AS $idCol,
           |    x.*
           |  FROM
           |    ($inner) AS x;
           |""".stripMargin
      case PopulationMode.Incremental =>
        val antiCond = mapping
          .map { case (dimC, _) => s"$dimTableName.$dimC = x.$dimC" }
          .mkString("\n         AND ")
        s"""INSERT INTO $dimTableName ($insertCols)
           |SELECT
           |    CAST((SELECT coalesce(max($idCol), 0) FROM $dimTableName)
           |         + row_number() OVER (ORDER BY $orderBy) AS ${idSqlType(s)}) AS $idCol,
           |    x.*
           |  FROM
           |    ($inner) AS x
           |    LEFT ANTI JOIN $dimTableName
           |      ON $antiCond;
           |""".stripMargin
    }
  }

  /** Populate SQL for an extracted fact table: the single
    * scan-join-aggregate statement [[FactPopulate.populate]] executes —
    * parent-source LEFT OUTER joins, broadcast-hinted derived-dim
    * lookups (replacing the reference's per-row correlated subqueries),
    * one GROUP BY with every aggregate in the same pass (the
    * reference's second UPDATE scan for sketches collapses into it).
    *
    * @param includePartitionDay append the `p_day` epoch-day partition
    *        column ([[Runner]]'s fact partitioning, D3) */
  def factPopulateSql(
      env: Env, fact: Fact, popMode: PopulationMode,
      includePartitionDay: Boolean = true): String = {
    import graft.derive.Extractor
    val s       = env.settings
    val allDims = Extractor.extractAllDimensionTables(env, fact)
    val fTable  = env.findTable(fact.tableName).get
    def qual(c: String) = s"${fact.tableName}.$c"

    // ---- FROM: source LEFT OUTER JOIN parent sources (F5)
    val parentTables = allDims.map(_._1.tableName).distinct.filter(_ != fact.tableName)
    val parentJoins = parentTables.map { oTableName =>
      val fkPairs = fTable.constraints.collectFirst {
        case TableConstraint.ForeignKey(t, pairs) if t == oTableName => pairs
      }.getOrElse(throw new IllegalStateException(
        s"no FK from ${fact.tableName} to parent source $oTableName"))
      val cond = fkPairs
        .map { case (c1, c2) => s"${qual(c1)} = $oTableName.$c2" }
        .mkString(" AND ")
      s"""    LEFT OUTER JOIN $oTableName
         |      ON $cond""".stripMargin
    }

    // ---- derived-dim lookups (F4): full mode reads the staged dims
    val derivedDims = allDims.filterNot { case (_, t) => env.tables.contains(t) }
    val dimJoins = derivedDims.map { case (dimFact, dimTable) =>
      val srcTable = env.findTable(dimFact.tableName).get
      val cond = Naming
        .dimColumnMapping(s.dimPrefix, dimFact, dimTable.name)
        .map { case (dimC, srcC) =>
          val rhs = coalesced(
            s"${dimFact.tableName}.$srcC", findColumn(srcTable, srcC), env.typeDefaults)
          s"${dimTable.name}.$dimC = $rhs"
        }
        .mkString("\n         AND ")
      val source = Naming.suffixTableName(popMode, s.tableNameSuffixTemplate, dimTable.name)
      s"""    LEFT OUTER JOIN $source AS ${dimTable.name}
         |      ON $cond""".stripMargin
    }
    val broadcastHint =
      if (derivedDims.isEmpty) ""
      else s"/*+ BROADCAST(${derivedDims.map(_._2.name).mkString(", ")}) */ "

    // ---- select list: (outputName, sqlExpr, isGroupKey) in the exact
    // order FactPopulate builds its colMap
    val countType = sqlType(s.factCountColumnType)
    val factCols: Seq[(String, String, Boolean)] = fact.columns.flatMap {
      case FactColumn(cName, kind) =>
        kind match {
          case DimTime =>
            val outName = Naming.timeUnitColumnName(s.dimTableIdColumnName, cName, s.timeUnit)
            val e = s"CAST(FLOOR(unix_timestamp(${qual(cName)}) / ${s.timeUnit.seconds}) AS BIGINT)"
            Seq((outName, e, true))
          case NoDimId | TenantId =>
            Seq((cName, coalesced(qual(cName), findColumn(fTable, cName), env.typeDefaults), true))
          case FactCount(srcOpt) =>
            val cnt = srcOpt.map(c => s"count(${qual(c)})").getOrElse("count(1)")
            Seq((cName, s"CAST($cnt AS $countType)", false))
          case FactCountDistinct(srcOpt) =>
            val srcName = srcOpt.getOrElse(
              fTable.constraints.collectFirst { case TableConstraint.PrimaryKey(c) => c }.get)
            val hashed = s"CASE WHEN ${qual(srcName)} IS NOT NULL" +
              s" THEN xxhash64(CAST(${qual(srcName)} AS STRING)) END"
            Seq((cName, s"sketch_build($hashed)", false))
          case FactSum(src) =>
            val t = sqlType(findColumn(fTable, src).columnType)
            Seq((cName, s"sum(CAST(${qual(src)} AS $t))", false))
          case FactMax(src) =>
            val t = sqlType(findColumn(fTable, src).columnType)
            Seq((cName, s"max(CAST(${qual(src)} AS $t))", false))
          case FactMin(src) =>
            val t = sqlType(findColumn(fTable, src).columnType)
            Seq((cName, s"min(CAST(${qual(src)} AS $t))", false))
          case FactAverage(src) =>
            val t = sqlType(findColumn(fTable, src).columnType)
            Seq(
              (cName + s.avgCountColumnSuffix, s"CAST(count(${qual(src)}) AS $countType)", false),
              (cName + s.avgSumColumnSuffix, s"sum(CAST(${qual(src)} AS $t))", false))
          case DimId(_) | DimVal(_) => Nil
        }
    }
    val dimCols: Seq[(String, String, Boolean)] = allDims.map { case (dimFact, dimTable) =>
      val fkColName = Naming.factDimFKIdColumnName(
        s.dimPrefix, s.dimTableIdColumnName, dimFact, dimTable, env.tables)
      val raw =
        if (env.tables.contains(dimTable)) {
          val fkCol = findColumn(env.findTable(dimFact.tableName).get, fkColName)
          val q     = s"${dimFact.tableName}.$fkColName"
          if (fkCol.isNullable) s"coalesce($q, ${s.foreignKeyIdCoalesceValue})" else q
        } else
          s"coalesce(${dimTable.name}.${s.dimTableIdColumnName}, ${s.foreignKeyIdCoalesceValue})"
      (fkColName, s"CAST($raw AS ${idSqlType(s)})", true)
    }

    val colMap    = factCols ++ dimCols
    val timeIdCol = Naming.timeUnitColumnName(
      s.dimTableIdColumnName, DimPopulate.timeColumnOf(fact), s.timeUnit)
    // p_day repeats the bucket expression (no lateral alias dependence);
    // it is a pure function of the time bucket, so adding it to GROUP BY
    // leaves the grouping unchanged
    val timeIdExpr = colMap.collectFirst { case (n, e, _) if n == timeIdCol => e }.get
    val pDay =
      if (includePartitionDay)
        Seq(("p_day", s"CAST(FLOOR($timeIdExpr * ${s.timeUnit.seconds} / 86400) AS BIGINT)", true))
      else Nil
    val allCols   = colMap ++ pDay
    val selectSql = allCols.map { case (n, e, _) => s"$e AS $n" }.mkString(",\n    ")
    // GROUP BY ordinals, not aliases: an alias that shadows a source
    // column present in several joined tables (e.g. publisher_id on
    // both parent and child) resolves ambiguously — the reference
    // dodges this with its xxff_ alias prefix, ordinals dodge it
    // without uglifying the artifact
    val groupKeys = allCols.zipWithIndex.collect { case ((_, _, true), i) => (i + 1).toString }
    val hasAggs   = allCols.exists(!_._3)

    val window = popMode match {
      case PopulationMode.Full        => s"${qual(DimPopulate.timeColumnOf(fact))} < ?"
      case PopulationMode.Incremental =>
        val t = qual(DimPopulate.timeColumnOf(fact))
        s"$t < ? AND $t >= ?"
    }
    val factTableName = Naming.extractedFactTableName(
      s.factPrefix, s.factInfix, fact.name, s.timeUnit)
    val (insertVerb, target) = popMode match {
      case PopulationMode.Full =>
        ("INSERT OVERWRITE TABLE", factTableName + s.tableNameSuffixTemplate)
      case PopulationMode.Incremental => ("INSERT INTO", factTableName)
    }
    val fromSql = (s"    ${fact.tableName}" +: (parentJoins ++ dimJoins)).mkString("\n")
    val distinct = if (hasAggs) "" else "DISTINCT\n    "
    val groupBy =
      if (hasAggs) s"\n  GROUP BY\n    ${groupKeys.mkString(",\n    ")}" else ""
    // record the sketch width the engine uses: sketch_build must be
    // registered with the SAME m or merged sketches silently mix
    // incompatible widths (RegisterSketch.registerSql scaladoc)
    val sketchHeader =
      if (fact.columns.exists(_.kind.isInstanceOf[FactCountDistinct])) {
        val m = graft.functions.RegisterSketch.bucketCount(s.factCountDistinctErrorRate)
        s"-- requires: RegisterSketch.registerSql(spark, m = $m)  " +
          s"-- error rate ${s.factCountDistinctErrorRate}\n"
      } else ""
    s"""$sketchHeader$insertVerb $target (${allCols.map(_._1).mkString(", ")})
       |SELECT $broadcastHint$distinct
       |    $selectSql
       |  FROM
       |$fromSql
       |  WHERE $window$groupBy;
       |""".stripMargin
  }
}
