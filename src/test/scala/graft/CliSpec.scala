package graft

import java.nio.file.{Files, Paths}

/** End-to-end CLI contract: YAML model in, staged full refresh +
  * atomic swap, all artifact directories out (the reference's
  * `ringo INPUT OUTPUT` lifecycle, `app/Main.hs:24-83`, plus
  * execution). */
class CliSpec extends SparkSpec {

  private def tempDir(): String = Files.createTempDirectory("graft-cli").toString

  test("full refresh run: staged write, swap to live, all artifacts emitted") {
    val out = tempDir()
    val violations = Cli.run(
      Seq("examples/events_model.yaml", sf("sf0.001"), out,
        "--upper", "2024-01-15 00:00:00"), spark)
    assert(violations.isEmpty)
    // staging swapped away: live tables only
    for (t <- Seq("dim_event_type", "fact_event_by_minute")) {
      assert(Files.exists(Paths.get(out, t)), s"live $t missing")
      assert(!Files.exists(Paths.get(out, t + "_staging")), s"staged $t left behind")
    }
    assert(spark.read.parquet(s"$out/fact_event_by_minute").count() > 0)
    // the reference's three SQL artifact dirs + plans + metadata
    for (d <- Seq("create", "fullrefresh", "increfresh"))
      assert(Files.exists(Paths.get(out, d, "fact_event_by_minute.sql")), s"$d artifact missing")
    assert(Files.exists(Paths.get(out, "plans", "fact_event_by_minute.txt")))
    assert(Files.exists(Paths.get(out, "dependencies.json")))
    val fullSql = Files.readString(Paths.get(out, "fullrefresh", "dim_event_type.sql"))
    assert(fullSql.contains("INSERT OVERWRITE TABLE dim_event_type{{suff}}"))

    // incremental run on top appends to the live tables without staging
    val before = spark.read.parquet(s"$out/fact_event_by_minute").count()
    val v2 = Cli.run(
      Seq("examples/events_model.yaml", sf("sf0.001"), out,
        "--incremental", "2024-01-15 00:00:00", "2024-02-01 00:00:00"), spark)
    assert(v2.isEmpty)
    assert(spark.read.parquet(s"$out/fact_event_by_minute").count() > before)
  }

  test("--suffix-template '' disables staging (in-place full refresh)") {
    val out = tempDir()
    val violations = Cli.run(
      Seq("examples/events_model.yaml", sf("sf0.001"), out,
        "--upper", "2024-01-15 00:00:00", "--suffix-template", ""), spark)
    assert(violations.isEmpty)
    assert(Files.exists(Paths.get(out, "fact_event_by_minute")))
    // in-place mode: full-refresh SQL artifacts target the bare table
    val fullSql = Files.readString(Paths.get(out, "fullrefresh", "dim_event_type.sql"))
    assert(fullSql.contains("INSERT OVERWRITE TABLE dim_event_type ("))
  }

  test("--compact maintenance mode keeps content, live tables untouched mid-run") {
    val out = tempDir()
    Cli.run(Seq("examples/events_model.yaml", sf("sf0.001"), out,
      "--upper", "2024-01-15 00:00:00"), spark)
    Cli.run(Seq("examples/events_model.yaml", sf("sf0.001"), out,
      "--incremental", "2024-01-15 00:00:00", "2024-02-01 00:00:00"), spark)
    val before = spark.read.parquet(s"$out/fact_event_by_minute")
      .collect().map(_.toString).sorted.toSeq
    val v = Cli.run(Seq("examples/events_model.yaml", sf("sf0.001"), out, "--compact"), spark)
    assert(v.isEmpty)
    val after = spark.read.parquet(s"$out/fact_event_by_minute")
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
  }

  test("--version prints the banner with exit code 0, short aliases parse") {
    // --version anywhere in the args wins, before any validation
    // (`ArgParser.hs:106-113`)
    val v = intercept[Cli.CliError](Cli.run(Seq("--version"), spark))
    assert(v.code == 0 && v.msg.startsWith("graft "))
    // -d/-f/-t normalize to their long forms (`ArgParser.hs:27-41`):
    // a prefixed run through the aliases must produce the renamed tables
    val out = tempDir()
    val violations = Cli.run(
      Seq("examples/events_model.yaml", sf("sf0.001"), out,
        "--upper", "2024-01-15 00:00:00",
        "-d", "d_", "-f", "f_", "-t", "hour"), spark)
    assert(violations.isEmpty)
    assert(Files.exists(Paths.get(out, "d_event_type")), "-d alias ignored")
    assert(Files.exists(Paths.get(out, "f_event_by_hour")), "-f/-t aliases ignored")
  }

  test("--salt-parents validates and excludes --bucket-parents") {
    val e1 = intercept[Cli.CliError](
      Cli.run(Seq("examples/events_model.yaml", sf("sf0.001"), tempDir(),
        "--salt-parents", "1"), spark))
    assert(e1.code == 2 && e1.msg.contains("salt count > 1"))
    val e2 = intercept[Cli.CliError](
      Cli.run(Seq("examples/events_model.yaml", sf("sf0.001"), tempDir(),
        "--salt-parents", "4", "--bucket-parents", "8"), spark))
    assert(e2.code == 2 && e2.msg.contains("cannot be combined"))
  }

  test("refresh modes are mutually exclusive") {
    val e1 = intercept[Cli.CliError](
      Cli.run(Seq("examples/events_model.yaml", sf("sf0.001"), tempDir(),
        "--compact", "--incremental", "2024-01-01 00:00:00", "2024-02-01 00:00:00"), spark))
    assert(e1.code == 2 && e1.msg.contains("--compact cannot be combined"))
    val e2 = intercept[Cli.CliError](
      Cli.run(Seq("examples/events_model.yaml", sf("sf0.001"), tempDir(),
        "--compact", "--upper", "2024-01-01 00:00:00"), spark))
    assert(e2.code == 2)
    val e3 = intercept[Cli.CliError](
      Cli.run(Seq("examples/events_model.yaml", sf("sf0.001"), tempDir(),
        "--incremental", "2024-01-01 00:00:00", "2024-02-01 00:00:00",
        "--upper", "2024-01-01 00:00:00"), spark))
    assert(e3.code == 2 && e3.msg.contains("mutually exclusive"))
  }

  test("usage errors throw CliError instead of exiting") {
    val e1 = intercept[Cli.CliError](Cli.run(Seq("model.yaml"), spark))
    assert(e1.code == 2)
    val e2 = intercept[Cli.CliError](
      Cli.run(Seq("examples/events_model.yaml", sf("sf0.001"), tempDir(), "--bogus"), spark))
    assert(e2.code == 2 && e2.msg.contains("unknown flag"))
    val e3 = intercept[Cli.CliError](
      Cli.run(Seq("examples/events_model.yaml", sf("sf0.001"), tempDir(),
        "--incremental", "not-a-timestamp", "2024-01-01 00:00:00"), spark))
    assert(e3.code == 2 && e3.msg.contains("invalid timestamp"))
  }
}
