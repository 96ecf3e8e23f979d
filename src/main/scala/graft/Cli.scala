package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.exec.Runner
import graft.model._
import graft.sources.{MetadataSink, ModelParser}

/** CLI entry point — the executable analogue of the reference's
  * `ringo INPUT OUTPUT` (`app/Main.hs:24-83`), except the generated
  * dataflows are *run*, not written out as SQL text:
  *
  * {{{
  * runMain graft.Cli MODEL.yaml SOURCE_DIR OUT_DIR \
  *   [--incremental LO HI]  [--upper HI]  [--no-partition]  [settings...]
  * }}}
  *
  * Every Settings knob has a flag, mirroring the reference's arg parser
  * (`app/Ringo/ArgParser.hs:23-90`): `--dim-prefix`, `--fact-prefix`,
  * `--time-unit second|minute|hour|day|week`, `--avg-count-col-suffix`,
  * `--avg-sum-col-suffix`, `--dim-id-col-name`, `--dim-id-col-type`,
  * `--fact-count-col-type`, `--count-distinct-error-rate`,
  * `--fact-infix`, `--dependencies-json`, `--facts-json`,
  * `--dimensions-json`, `--fk-id-coalesce-value`, `--suffix-template`.
  *
  * Emits dependencies.json / dimensions.json / facts.json metadata and
  * per-table physical plans alongside the populated parquet tables.
  */
object Cli {

  private[graft] val settingsFlags: Set[String] = Set(
    "--dim-prefix", "--fact-prefix", "--time-unit", "--avg-count-col-suffix",
    "--avg-sum-col-suffix", "--dim-id-col-name", "--dim-id-col-type",
    "--fact-count-col-type", "--count-distinct-error-rate", "--fact-infix",
    "--dependencies-json", "--facts-json", "--dimensions-json",
    "--fk-id-coalesce-value", "--suffix-template")
  private[graft] val modeFlags: Set[String] =
    Set("--incremental", "--upper", "--no-partition")

  private[graft] def parseSettings(
      rest: Seq[String], usageExit: String => Nothing): Settings = {
    rest.filter(_.startsWith("--")).foreach { f =>
      if (!settingsFlags.contains(f) && !modeFlags.contains(f))
        usageExit(s"unknown flag: $f")
    }
    def flag(name: String): Option[String] = {
      val i = rest.indexOf(name)
      if (i < 0) None
      else rest.lift(i + 1).orElse(usageExit(s"$name requires a value"))
    }
    var s = Settings()
    flag("--dim-prefix").foreach(v => s = s.copy(dimPrefix = v))
    flag("--fact-prefix").foreach(v => s = s.copy(factPrefix = v))
    flag("--time-unit").foreach { v =>
      s = s.copy(timeUnit =
        try TimeUnit.fromName(v)
        catch { case _: IllegalArgumentException => usageExit(s"--time-unit: unknown unit '$v'") })
    }
    flag("--avg-count-col-suffix").foreach(v => s = s.copy(avgCountColumnSuffix = v))
    flag("--avg-sum-col-suffix").foreach(v => s = s.copy(avgSumColumnSuffix = v))
    flag("--dim-id-col-name").foreach(v => s = s.copy(dimTableIdColumnName = v))
    flag("--dim-id-col-type").foreach(v => s = s.copy(dimTableIdColumnType = v))
    flag("--fact-count-col-type").foreach(v => s = s.copy(factCountColumnType = v))
    flag("--count-distinct-error-rate").foreach(v =>
      s = s.copy(factCountDistinctErrorRate =
        v.toDoubleOption.getOrElse(usageExit(s"--count-distinct-error-rate: bad double '$v'"))))
    flag("--fact-infix").foreach(v => s = s.copy(factInfix = v))
    flag("--dependencies-json").foreach(v => s = s.copy(dependenciesJsonFileName = v))
    flag("--facts-json").foreach(v => s = s.copy(factsJsonFileName = v))
    flag("--dimensions-json").foreach(v => s = s.copy(dimensionsJsonFileName = v))
    flag("--fk-id-coalesce-value").foreach(v =>
      s = s.copy(foreignKeyIdCoalesceValue =
        v.toIntOption.getOrElse(usageExit(s"--fk-id-coalesce-value: bad int '$v'"))))
    flag("--suffix-template").foreach(v => s = s.copy(tableNameSuffixTemplate = v))
    s
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: graft.Cli MODEL.yaml SOURCE_DIR OUT_DIR [--incremental LO HI] [--upper HI] [--no-partition]")
      sys.exit(2)
    }
    val Array(modelPath, sourceDir, outDir) = args.take(3)
    val rest = args.drop(3).toSeq

    def usageExit(msg: String): Nothing = {
      System.err.println(msg)
      System.err.println(
        "usage: graft.Cli MODEL.yaml SOURCE_DIR OUT_DIR [--incremental LO HI] [--upper HI] [--no-partition]")
      sys.exit(2)
    }
    def parseTs(flag: String, s: Option[String]): Timestamp =
      s.map(v =>
        try Timestamp.valueOf(v)
        catch {
          case _: IllegalArgumentException =>
            usageExit(s"$flag: invalid timestamp '$v' (expected 'yyyy-MM-dd HH:mm:ss')")
        }).getOrElse(usageExit(s"$flag requires timestamp operand(s)"))

    val window =
      if (rest.contains("--incremental")) {
        val i = rest.indexOf("--incremental")
        TimeWindow.between(
          parseTs("--incremental", rest.lift(i + 1)),
          parseTs("--incremental", rest.lift(i + 2)))
      } else if (rest.contains("--upper")) {
        TimeWindow.upTo(parseTs("--upper", rest.lift(rest.indexOf("--upper") + 1)))
      } else TimeWindow.unbounded

    val parsed = ModelParser.parseFile(modelPath) match {
      case Left(err) => System.err.println(err); sys.exit(1); throw new IllegalStateException
      case Right(p)  => p
    }
    val (tables, facts, defaults) = parsed
    val settings = parseSettings(rest, usageExit)
    val env = Validator.validateEnv(tables, facts, settings, defaults) match {
      case Left(errors) =>
        errors.foreach(e => System.err.println(s"validation: $e"))
        sys.exit(1); throw new IllegalStateException
      case Right(e) => e
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val runner =
      new Runner(spark, env, sourceDir, outDir, partitionFactsByDay = !rest.contains("--no-partition"))
    val written =
      if (window.lower.nonEmpty) runner.incrementalRefresh(window)
      else runner.fullRefresh(window)
    written.foreach(t => println(s"populated: $outDir/$t"))

    MetadataSink.writeAll(env, outDir)
    val plansDir = Paths.get(outDir, "plans")
    Files.createDirectories(plansDir)
    runner.emitPlans(window).foreach { case (table, plan) =>
      Files.writeString(plansDir.resolve(s"$table.txt"), plan)
    }
    // create/<table>.sql, like the reference's DDL artifact directory
    val createDir = Paths.get(outDir, "create")
    Files.createDirectories(createDir)
    runner.emitDdl().foreach { case (table, ddl) =>
      Files.writeString(createDir.resolve(s"$table.sql"), ddl)
    }
    val violations = runner.checkUniqueKeys().filter(_._3 > 0)
    violations.foreach { case (t, c, n) =>
      System.err.println(s"QUALITY VIOLATION: $t $c has $n duplicate keys")
    }
    spark.stop()
    if (violations.nonEmpty) sys.exit(3)
  }
}
