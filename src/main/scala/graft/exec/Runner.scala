package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.derive.Extractor
import graft.model._

/** End-to-end ETL runner: derives the dimensional model from an [[Env]]
  * and executes the populate pipelines in dependency order, writing
  * parquet. Replaces the reference's emit-SQL-and-let-an-orchestrator-
  * run-it lifecycle (SURVEY §3.1 step 5) with a single in-session run.
  */
final class Runner(spark: SparkSession, env: Env, sourceDir: String, outDir: String) {

  def readSource(name: String): DataFrame =
    graft.sources.ParquetTables.readTable(spark, sourceDir, name)

  def readOut(name: String): DataFrame =
    spark.read.parquet(s"$outDir/$name")

  /** Derived dimension tables with their declaring fact, deduped across
    * facts (first declaration wins, as in the reference's `nubBy`). */
  def derivedDims: Seq[(Fact, Table)] =
    env.facts
      .flatMap(f => Extractor.extractAllDimensionTables(env, f))
      .filterNot { case (_, t) => env.tables.contains(t) }
      .distinctBy(_._2.name)

  /** Full refresh of every derived table: dims first, then facts in
    * parent-before-child order. Each table is written once; fact reads
    * resolve dims from the just-written parquet. */
  def fullRefresh(window: TimeWindow = TimeWindow.unbounded): Seq[String] = {
    val dimNames = derivedDims.map { case (fact, dimTable) =>
      val df = DimPopulate.full(env, fact, dimTable.name, readSource(fact.tableName), window)
      write(df, dimTable.name)
      dimTable.name
    }
    val factNames = factsInTopoOrder.filter(_.persistent).map { fact =>
      val df = FactPopulate.populate(env, fact, window, readSource, readOut)
      write(df, factTableNameOf(fact))
      factTableNameOf(fact)
    }
    dimNames ++ factNames
  }

  /** Incremental refresh over an aligned window: appends new dim rows
    * (anti-join, ids continuing after the existing max) and appends the
    * window's fact rows. Bucket keys are disjoint across aligned
    * windows, so appends never double-count (SURVEY §4, last row). */
  def incrementalRefresh(window: TimeWindow): Seq[String] = {
    require(window.lower.nonEmpty && window.upper.nonEmpty,
      "incremental refresh needs both window bounds")
    val dimNames = derivedDims.map { case (fact, dimTable) =>
      val newRows = DimPopulate.incremental(
        env, fact, dimTable.name, readSource(fact.tableName), readOut(dimTable.name), window)
      append(newRows, dimTable.name)
      dimTable.name
    }
    val factNames = factsInTopoOrder.filter(_.persistent).map { fact =>
      val df = FactPopulate.populate(env, fact, window, readSource, readOut)
      append(df, factTableNameOf(fact))
      factTableNameOf(fact)
    }
    dimNames ++ factNames
  }

  def factTableNameOf(fact: Fact): String = {
    val s = env.settings
    Naming.extractedFactTableName(s.factPrefix, s.factInfix, fact.name, s.timeUnit)
  }

  /** Facts ordered so parents populate before children. */
  def factsInTopoOrder: Seq[Fact] = {
    val byName = env.facts.map(f => f.name -> f).toMap
    val seen   = scala.collection.mutable.LinkedHashSet.empty[String]
    def visit(f: Fact): Unit =
      if (!seen.contains(f.name)) {
        f.parentNames.foreach(p => visit(byName(p)))
        seen += f.name
      }
    env.facts.foreach(visit)
    seen.toSeq.map(byName)
  }

  private def write(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").parquet(s"$outDir/$table")

  private def append(df: DataFrame, table: String): Unit =
    df.write.mode("append").parquet(s"$outDir/$table")
}
