package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.derive.{Extractor, SqlTypes}
import graft.exec.Defaults
import graft.model._
import graft.model.FactColumnKind._

/** Structured Streaming surface (SURVEY §2.11): the same fact layout as
  * the batch populate, fed from a stream.
  *
  * The reference has no streaming; its incremental refresh is
  * micro-batch over a time window. This is the natural Spark extension:
  * tumbling `window(ts, timeUnit)` aggregation with a watermark for
  * late data, dimension lookups as stream-static broadcast joins, and
  * the same output schema (time bucket id, degenerate dims, FK ids,
  * count/sum/min/max/avg-decomposed measures) so streamed rows append
  * into the identical fact table layout.
  *
  * FactCountDistinct rides the same streaming aggregation when
  * `includeSketches = true` (default): the register sketch is an
  * ordinary mergeable aggregate, so each emitted window carries its
  * registers and downstream roll-ups merge them register-wise — no
  * second scan. Set it false to fall back to the batch-backfill
  * division of labor (counts/sums streamed, sketches built by the
  * periodic batch pass, as in the reference's two-phase UPDATE).
  */
object StreamingFactPopulate {

  /** Build the streaming aggregation for `fact` over a streaming source
    * DataFrame. Returns a streaming DataFrame in append-compatible
    * shape (use with watermark + append mode, or complete mode for
    * tests). */
  def aggregate(
      env: Env,
      fact: Fact,
      stream: DataFrame,
      readDim: String => DataFrame,
      watermark: String = "10 minutes",
      includeSketches: Boolean = true
  ): DataFrame = {
    val s = env.settings
    val fTable = env
      .findTable(fact.tableName)
      .getOrElse(throw new IllegalStateException(s"missing table ${fact.tableName}"))
    def srcColumn(c: String) =
      fTable.findColumn(c).getOrElse(throw new IllegalStateException(s"missing column $c"))

    val timeColName = fact.columns.collectFirst { case FactColumn(c, DimTime) => c }
      .getOrElse(throw new IllegalStateException("fact has no DimTime column"))

    val srcAlias = fact.tableName
    val withWm   = stream.withWatermark(timeColName, watermark).alias(srcAlias)

    // stream-static dimension lookups (broadcast joins)
    val allDims = Extractor.extractAllDimensionTables(env, fact)
    require(
      allDims.forall { case (df, _) => df.tableName == fact.tableName },
      "streaming populate supports single-source facts (no parent-fact joins on streams)")
    val withDims = allDims.foldLeft(withWm) { case (acc, (dimFact, dimTable)) =>
      if (env.tables.contains(dimTable)) acc
      else {
        val cond = Naming
          .dimColumnMapping(s.dimPrefix, dimFact, dimTable.name)
          .map { case (dimColName, sourceColName) =>
            col(s"${dimTable.name}.$dimColName") ===
              Defaults.coalesced(
                col(s"$srcAlias.$sourceColName"), srcColumn(sourceColName), env.typeDefaults)
          }
          .reduce(_ && _)
        acc.join(broadcast(readDim(dimTable.name).alias(dimTable.name)), cond, "left_outer")
      }
    }

    val coalesceFKId: Column => Column = c => coalesce(c, lit(s.foreignKeyIdCoalesceValue))

    val groupKeys: Seq[(String, Column)] =
      fact.columns.flatMap {
        case FactColumn(cName, k) if k == NoDimId || k == TenantId =>
          Seq(cName -> Defaults.coalesced(
            col(s"$srcAlias.$cName"), srcColumn(cName), env.typeDefaults))
        case _ => Nil
      } ++ allDims.map { case (dimFact, dimTable) =>
        val fkName = Naming.factDimFKIdColumnName(
          s.dimPrefix, s.dimTableIdColumnName, dimFact, dimTable, env.tables)
        val e =
          if (env.tables.contains(dimTable)) {
            val fkCol = srcColumn(fkName)
            if (fkCol.isNullable) coalesceFKId(col(fkName)) else col(fkName)
          } else coalesceFKId(col(s"${dimTable.name}.${s.dimTableIdColumnName}"))
        fkName -> e.cast(SqlTypes.toDataType(Naming.idColTypeToFKIdColType(s.dimTableIdColumnType)))
      }

    val aggs: Seq[Column] = fact.columns.flatMap { case FactColumn(cName, kind) =>
      kind match {
        case FactCountDistinct(srcOpt) if includeSketches =>
          import graft.functions.RegisterSketch
          val srcName = srcOpt.getOrElse(
            fTable.constraints.collectFirst { case TableConstraint.PrimaryKey(c) => c }
              .getOrElse(throw new IllegalStateException(
                s"FactCountDistinct with no source column needs a PK on ${fTable.name}")))
          val m = RegisterSketch.bucketCount(s.factCountDistinctErrorRate)
          Seq(RegisterSketch.buildAgg(m)(
            RegisterSketch.hashColumn(col(s"$srcAlias.$srcName"))).as(cName))
        case FactCount(srcOpt) =>
          val cnt = srcOpt.map(c => count(col(s"$srcAlias.$c"))).getOrElse(count(lit(1)))
          Seq(cnt.cast(SqlTypes.toDataType(s.factCountColumnType)).as(cName))
        case FactSum(src) =>
          Seq(sum(col(s"$srcAlias.$src").cast(SqlTypes.toDataType(srcColumn(src).columnType))).as(cName))
        case FactMax(src) =>
          Seq(max(col(s"$srcAlias.$src").cast(SqlTypes.toDataType(srcColumn(src).columnType))).as(cName))
        case FactMin(src) =>
          Seq(min(col(s"$srcAlias.$src").cast(SqlTypes.toDataType(srcColumn(src).columnType))).as(cName))
        case FactAverage(src) =>
          val t = SqlTypes.toDataType(srcColumn(src).columnType)
          Seq(
            count(col(s"$srcAlias.$src")).cast(SqlTypes.toDataType(s.factCountColumnType))
              .as(cName + s.avgCountColumnSuffix),
            sum(col(s"$srcAlias.$src").cast(t)).as(cName + s.avgSumColumnSuffix))
        case _ => Nil
      }
    }

    val timeIdName = Naming.timeUnitColumnName(s.dimTableIdColumnName, timeColName, s.timeUnit)
    val bucket     = window(col(s"$srcAlias.$timeColName"), s"${s.timeUnit.seconds} seconds")

    require(aggs.nonEmpty,
      "streaming populate needs at least one aggregate fact column")
    withDims
      .groupBy(bucket.as("w") +: groupKeys.map { case (n, e) => e.as(n) }: _*)
      .agg(aggs.head, aggs.tail: _*)
      // window start -> the same bigint bucket id as the batch layout
      .withColumn(timeIdName,
        floor(unix_timestamp(col("w.start")) / s.timeUnit.seconds).cast("long"))
      .drop("w")
  }
}
