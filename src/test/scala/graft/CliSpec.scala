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

  // ------------------------------------------------------------ pipeline subcommand
  test("pipeline subcommand: 5-step curation chain end-to-end from YAML") {
    val out = tempDir()
    Cli.run(Seq("pipeline", "examples/curate_pipeline.yaml", sf("sf0.001"), out), spark)
    val docs = sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")
    // every step materialized, no staging debris
    for (t <- Seq("deduped", "kept", "sampled", "chunks", "packed")) {
      assert(Files.exists(Paths.get(out, t)), s"step output $t missing")
      assert(!Files.exists(Paths.get(out, t + "_staging")), s"staged $t left behind")
    }
    // dedup_exact keeps exactly one row per content fingerprint
    val deduped = spark.read.parquet(s"$out/deduped")
    assert(deduped.count() ==
      graft.operators.Dedup.exact(docs, "doc_id", "text").count())
    assert(deduped.columns.toSeq == docs.columns.toSeq, "survivor steps keep the schema")
    // each survivor step emits a subset of its input's ids
    def ids(t: String) = spark.read.parquet(s"$out/$t")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids("kept").subsetOf(ids("deduped")))
    assert(ids("sampled").subsetOf(ids("kept")))
    assert(ids("sampled").nonEmpty)
    // shape-changing tail: chunks carry text windows, packed sequences
    val packed = spark.read.parquet(s"$out/packed")
    for (c <- Seq("shard", "seq_id", "seq_pos", "chunk_text"))
      assert(packed.columns.contains(c), s"packed missing $c")
    assert(packed.count() == spark.read.parquet(s"$out/chunks").count())
    // plan artifacts: one per step, same contract as the warehouse path
    for (t <- Seq("deduped", "kept", "sampled", "chunks", "packed"))
      assert(Files.exists(Paths.get(out, "plans", s"$t.txt")), s"plan for $t missing")
    // run manifest: one record per step, row counts matching the tables
    val manifest = Files.readString(Paths.get(out, "pipeline_manifest.json"))
    for (t <- Seq("deduped", "kept", "sampled", "chunks", "packed")) {
      assert(manifest.contains(s""""name":"$t""""), s"manifest missing $t")
      assert(manifest.contains(
        s""""rows":${spark.read.parquet(s"$out/$t").count()}"""),
        s"manifest row count for $t wrong:\n$manifest")
    }
  }

  test("pipeline subcommand: splits, token_estimate, and dedup_prefix compose") {
    val out  = tempDir()
    val yaml = Files.createTempFile("graft-pipe-ops", ".yaml")
    Files.writeString(yaml,
      """pipeline: budget_test
        |id: doc_id
        |text: text
        |steps:
        |  - name: nearded
        |    op: dedup_prefix
        |    input: documents
        |    params: { minJaccard: 0.8 }
        |  - name: budgeted
        |    op: token_estimate
        |  - name: assigned
        |    op: splits
        |    params: { train: 0.8, valid: 0.1, test: 0.1, by: source }
        |""".stripMargin)
    Cli.run(Seq("pipeline", yaml.toString, sf("sf0.001"), out), spark)
    val docs = sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")
    val nearded = spark.read.parquet(s"$out/nearded")
    // prefix survivors match the operator run directly
    val wantSurvivors = graft.operators.Dedup.survivors(docs, "doc_id",
      graft.operators.Dedup.jaccardPrefixPairs(docs, "doc_id", "text", 3, 0.8))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(nearded.select("doc_id").collect().map(_.getLong(0)).toSet == wantSurvivors)
    val assigned = spark.read.parquet(s"$out/assigned")
    assert(assigned.columns.contains("n_tokens_est"), "annotations must chain")
    assert(assigned.columns.contains("split"))
    // grouped split: every source lands wholly in one split
    assert(assigned.select("source", "split").distinct().count() ==
      assigned.select("source").distinct().count())
  }

  test("pipeline subcommand: line_dedup, dedup_prefix keep:longest, shuffle_shards chain") {
    val s = spark
    import s.implicits._
    val src = tempDir()
    val out = tempDir()
    Seq(
      (1L, "HEADER\none two three four five six seven eight nine ten\nFOOTER", "en"),
      (2L, "HEADER\none two three four five six seven eight nine ten eleven twelve\nFOOTER", "en"),
      (3L, "totally different unique content here\nsecond line", "de")
    ).toDF("doc_id", "text", "lang").write.parquet(s"$src/documents.parquet")
    val yaml = Files.createTempFile("graft-pipe-line", ".yaml")
    Files.writeString(yaml,
      """pipeline: line_chain
        |id: doc_id
        |text: text
        |steps:
        |  - name: unlined
        |    op: line_dedup
        |    input: documents
        |  - name: best
        |    op: dedup_prefix
        |    params: { minJaccard: 0.5, keep: longest }
        |  - name: shuffled
        |    op: shuffle_shards
        |    params: { shards: 4, salt: t }
        |""".stripMargin)
    Cli.run(Seq("pipeline", yaml.toString, src, out), spark)
    // line_dedup strips HEADER/FOOTER (df=2) everywhere, keeps ride-along cols
    val unlined = spark.read.parquet(s"$out/unlined")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[String]("lang")))).toMap
    assert(unlined(1L) == (("one two three four five six seven eight nine ten", "en")))
    assert(unlined(2L) == (("one two three four five six seven eight nine ten eleven twelve", "en")))
    assert(unlined(3L) == (("totally different unique content here\nsecond line", "de")))
    // docs 1+2 are trigram-Jaccard 0.8 near-dups after the strip;
    // keep:longest keeps doc 2 (NOT the min id)
    val best = spark.read.parquet(s"$out/best")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(best == Set(2L, 3L))
    // shuffle annotation: shard in range, dense pos per shard
    val shuffled = spark.read.parquet(s"$out/shuffled")
    assert(shuffled.count() == 2)
    val rows = shuffled.select("shard", "pos").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.forall { case (sh, _) => sh >= 0 && sh < 4 })
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted.toSeq == (0L until g.size).toSeq)
    }
  }

  test("pipeline subcommand: examples/web_pipeline.yaml runs the round-7 surface end-to-end") {
    val out = tempDir()
    Cli.run(Seq("pipeline", "examples/web_pipeline.yaml", sf("sf0.001"), out), spark)
    val docs = sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")
    assert(spark.read.parquet(s"$out/validated").count() == docs.count())
    val shuffled = spark.read.parquet(s"$out/shuffled")
    // survivor steps shrink or hold; annotations ride through the chain
    assert(shuffled.count() <= docs.count() && shuffled.count() > 0)
    for (c <- Seq("doc_id", "text", "n_tokens_est", "shard", "pos"))
      assert(shuffled.columns.contains(c), s"missing $c")
    // the manifest records all five steps
    val manifest = Files.readString(Paths.get(out, "pipeline_manifest.json"))
    for (t <- Seq("validated", "unlined", "deduped", "budgeted", "shuffled"))
      assert(manifest.contains(s""""name":"$t""""), s"manifest missing $t")
  }

  test("pipeline subcommand: expect gate passes clean corpora through, blocks dirty ones unpublished") {
    val s = spark
    import s.implicits._
    val src = tempDir()
    val out = tempDir()
    Seq((1L, "alpha text", "en"), (2L, "beta text", "en"))
      .toDF("doc_id", "text", "lang").write.parquet(s"$src/documents.parquet")
    val okYaml = Files.createTempFile("graft-pipe-expect", ".yaml")
    Files.writeString(okYaml,
      """pipeline: gated
        |id: doc_id
        |text: text
        |steps:
        |  - name: validated
        |    op: expect
        |    input: documents
        |    params: { minRows: 2, notNull: "doc_id,lang", unique: doc_id, nonEmptyText: true }
        |  - name: normalized
        |    op: normalize
        |""".stripMargin)
    Cli.run(Seq("pipeline", okYaml.toString, src, out), spark)
    assert(spark.read.parquet(s"$out/validated").count() == 2, "gate passes the corpus through")
    assert(Files.exists(Paths.get(out, "normalized")), "chain continues past a green gate")

    // dirty corpus: duplicate id + a null lang + too few rows for minRows 5
    val src2 = tempDir()
    val out2 = tempDir()
    Seq((1L, "x", "en"), (1L, "y", null: String))
      .toDF("doc_id", "text", "lang").write.parquet(s"$src2/documents.parquet")
    val badYaml = Files.createTempFile("graft-pipe-expect-bad", ".yaml")
    Files.writeString(badYaml,
      """pipeline: gated_bad
        |id: doc_id
        |text: text
        |steps:
        |  - name: validated
        |    op: expect
        |    input: documents
        |    params: { minRows: 5, notNull: lang, unique: doc_id }
        |""".stripMargin)
    val e = intercept[IllegalStateException](
      Cli.run(Seq("pipeline", badYaml.toString, src2, out2), spark))
    assert(e.getMessage.contains("not_null_lang"), e.getMessage)
    assert(e.getMessage.contains("doc_id_unique"), e.getMessage)
    assert(e.getMessage.contains("min_rows"), e.getMessage)
    // the staged write never promoted: no published table
    assert(!Files.exists(Paths.get(out2, "validated")),
      "a failing gate must not publish the table")
  }

  test("pipeline subcommand: semdedup prunes embedded near-dups, passes docs without embeddings") {
    val s = spark
    import s.implicits._
    val src = tempDir()
    val out = tempDir()
    Seq(
      (1L, "first doc"), (2L, "second doc"), (3L, "third doc"), (4L, "no embedding doc")
    ).toDF("doc_id", "text").write.parquet(s"$src/documents.parquet")
    Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)), // identical to 1 -> pruned (larger id)
      (3L, Array(0.0f, 1.0f))  // orthogonal -> kept
    ).toDF("doc_id", "embedding").write.parquet(s"$src/embeddings.parquet")
    val yaml = Files.createTempFile("graft-pipe-sem", ".yaml")
    Files.writeString(yaml,
      """pipeline: sem_chain
        |id: doc_id
        |text: text
        |steps:
        |  - name: pruned
        |    op: semdedup
        |    input: documents
        |    params: { embeddings: embeddings, k: 1, minCosine: 0.9 }
        |""".stripMargin)
    Cli.run(Seq("pipeline", yaml.toString, src, out), spark)
    val kept = spark.read.parquet(s"$out/pruned")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("pipeline subcommand: decontaminate resolves its benchmark from SOURCE_DIR") {
    val src = tempDir()
    val out = tempDir()
    val docs = sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")
    docs.write.parquet(s"$src/documents.parquet")
    // benchmark = 5 real documents; decontamination must drop AT LEAST
    // those (plus any doc sharing an 8-gram with them)
    val bench = docs.orderBy("doc_id").limit(5)
    bench.write.parquet(s"$src/bench_documents.parquet")
    val yaml = Files.createTempFile("graft-pipe", ".yaml")
    Files.writeString(yaml,
      """pipeline: decon_test
        |id: doc_id
        |text: text
        |steps:
        |  - name: clean
        |    op: decontaminate
        |    input: documents
        |    params: { benchmark: bench_documents, n: 8 }
        |""".stripMargin)
    Cli.run(Seq("pipeline", yaml.toString, src, out), spark)
    val cleanIds = spark.read.parquet(s"$out/clean")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val benchIds = bench.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(benchIds.intersect(cleanIds).isEmpty,
      "benchmark documents must not survive decontamination")
    assert(cleanIds.nonEmpty, "unrelated documents must survive")
  }

  test("pipeline subcommand: spec errors fail loud before Spark starts") {
    def specError(body: String): String = {
      val yaml = Files.createTempFile("graft-pipe-bad", ".yaml")
      Files.writeString(yaml,
        s"pipeline: bad\nid: doc_id\ntext: text\nsteps:\n$body")
      val e = intercept[Cli.CliError] {
        Cli.run(Seq("pipeline", yaml.toString, sf("sf0.001"), tempDir()),
          fail("session must not be forced on a spec error"))
      }
      assert(e.code == 1)
      e.msg
    }
    assert(specError("  - { name: a, op: nope, input: documents }\n")
      .contains("unknown op"))
    assert(specError("  - { name: a, op: dedup_exact, input: documents, params: { frac: 1 } }\n")
      .contains("does not take param"))
    assert(specError(
      "  - { name: a, op: dedup_exact, input: b }\n" +
        "  - { name: b, op: dedup_exact, input: a }\n")
      .contains("cycle"))
    assert(specError("  - { name: a, op: dedup_exact }\n")
      .contains("first step must name an input"))
    // path traversal must be a spec error, not a write outside OUT_DIR
    assert(specError("  - { name: ../escape, op: dedup_exact, input: documents }\n")
      .contains("unsafe"))
    assert(specError("  - { name: a, op: dedup_exact, input: ../../etc }\n")
      .contains("unsafe"))
  }

  test("pipeline subcommand: lm_score and decontaminate_bloom ops run in a chain") {
    val src = tempDir()
    val out = tempDir()
    val docs = sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")
    docs.write.parquet(s"$src/documents.parquet")
    docs.orderBy("doc_id").limit(5).write.parquet(s"$src/bench_documents.parquet")
    val yaml = Files.createTempFile("graft-pipe-lm", ".yaml")
    Files.writeString(yaml,
      """pipeline: lm_chain
        |id: doc_id
        |text: text
        |steps:
        |  - name: clean
        |    op: decontaminate_bloom
        |    input: documents
        |    params: { benchmark: bench_documents, n: 8 }
        |  - name: scored
        |    op: lm_score
        |""".stripMargin)
    Cli.run(Seq("pipeline", yaml.toString, src, out), spark)
    // bloom path drops the benchmark docs like the exact path does
    val cleanIds = spark.read.parquet(s"$out/clean")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!cleanIds.contains(
      docs.orderBy("doc_id").limit(1).collect()(0).getLong(0)))
    assert(cleanIds.nonEmpty)
    val scored = spark.read.parquet(s"$out/scored")
    assert(scored.columns.contains("doc_id"))
    assert(scored.count() == cleanIds.size, "self-referenced LM scores every input doc")
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
