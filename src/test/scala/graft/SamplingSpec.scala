package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic hash sampling: reproducible membership, weight
  * accuracy, disjoint/exhaustive splits, salt independence, and
  * stability under corpus growth (the properties rand()-sampling
  * lacks). */
class SamplingSpec extends SparkSpec {

  private lazy val docs =
    sources.ParquetTables.readTable(spark, sf("sf0.01"), "documents")

  test("hexThreshold boundaries") {
    assert(Sampling.hexThreshold(0.0) == "0000") // empty sample
    assert(Sampling.hexThreshold(0.1) == "1999")
    assert(Sampling.hexThreshold(0.8) == "cccc")
    assert(Sampling.hexThreshold(1.0) == "g") // sorts above every hex char
  }

  test("hash sample: deterministic membership, fraction within tolerance") {
    val a = Sampling.hashSample(docs, "doc_id", 0.2, salt = "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs, "doc_id", 0.2, salt = "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same key+salt must give the same sample")
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.2) < 0.03, s"got ${a.size / n}, wanted ~0.2")
    // a different salt draws an independent sample (not the same set)
    val c = Sampling.hashSample(docs, "doc_id", 0.2, salt = "s2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(c != a)
    // independence: overlap ~ 0.2 * 0.2 of the corpus
    assert(math.abs(a.intersect(c).size / n - 0.04) < 0.02)
    // fraction 1.0 keeps everything ("g" threshold edge)
    assert(Sampling.hashSample(docs, "doc_id", 1.0).count() == n.toLong)
    assert(Sampling.hashSample(docs, "doc_id", 0.0).count() == 0L)
  }

  test("weighted systematic PPS: exact hand-computed picks, partition-invariant") {
    val s = spark
    import s.implicits._
    // weights 1,2,3,4 -> total 10, k=5, step=2; cums 1,3,6,10
    // picks: 1//2-0//2=0, 3//2-1//2=1, 6//2-3//2=2, 10//2-6//2=2
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("id", "w")
    def run(p: Int) = Sampling.weightedSystematic(df, "id", "w", k = 5, partitions = p)
      .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("picks"))).toMap
    val one = run(1)
    assert(one == Map(2L -> 1L, 3L -> 2L, 4L -> 2L)) // id 1 gets 0 picks
    assert(one.values.sum == 5L) // exactly k when step divides total
    // the cumulative line depends on data + key order only, never on
    // the partition count (the two-phase offsets are exact)
    assert(run(7) == one && run(3) == one)
    // zero-weight rows are never picked
    val z = Sampling.weightedSystematic(
      Seq((1L, 0L), (2L, 10L)).toDF("id", "w"), "id", "w", k = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(z == Set(2L))
    // duplicate keys: totals stay exact (ROWS frame, not RANGE —
    // RANGE would give peers one shared cumulative value and
    // double-count); per-row attribution is tie-order-dependent and
    // deliberately not asserted
    val dup = Sampling.weightedSystematic(
      Seq((1L, 3L), (1L, 1L), (2L, 4L)).toDF("id", "w"), "id", "w", k = 4)
      .agg(sum(col("picks"))).head.getLong(0)
    assert(dup == 4L, s"total 8, step 2 -> exactly 4 picks, got $dup")

    // k beyond the total weight fails loudly, not silently empty
    val ex = intercept[Exception] {
      Sampling.weightedSystematic(
        Seq((1L, 2L), (2L, 1L)).toDF("id", "w"), "id", "w", k = 10).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("exceeds the total weight")))
  }

  test("domain mix: budget-proportional mixture, keep-all cap, drops unlisted") {
    val base = docs.select(col("doc_id"), col("source"), col("n_chars"))
    val weights = Seq("src0" -> 60L, "src1" -> 25L, "src2" -> 10L, "src3" -> 5L)
    val mixed = Sampling.domainMix(base, "doc_id", "source", "n_chars",
      weights, budgetTokens = 20000L, salt = "mix")
    // deterministic
    val ids = mixed.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.domainMix(base, "doc_id", "source", "n_chars",
      weights, budgetTokens = 20000L, salt = "mix")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == ids2)
    // unlisted domains are excluded
    val kept = mixed.select("source").distinct().collect().map(_.getString(0)).toSet
    assert(kept.subsetOf(weights.map(_._1).toSet))
    // src0's target (12k chars) exceeds its ~8k corpus -> keep-all
    val perSrc = mixed.groupBy("source").agg(
      count(lit(1)).as("n"), sum("n_chars").as("chars"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val src0All = base.filter(col("source") === "src0").count()
    assert(perSrc("src0")._1 == src0All, "capped domain must keep everything")
    // partial domains keep a strict, non-empty subset near their target
    val src1Target = 20000.0 * 25 / 100
    val src1Total  = base.filter(col("source") === "src1").count()
    assert(perSrc("src1")._1 > 0 && perSrc("src1")._1 < src1Total)
    assert(math.abs(perSrc("src1")._2 - src1Target) / src1Target < 0.5,
      s"src1 kept ${perSrc("src1")._2} chars, target ~$src1Target")
    // scale shape: thresholds broadcast, corpus never exchanged
    val plan = mixed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("domain mix epochs: an over-weighted small domain delivers its share via replication") {
    val base = docs.select(col("doc_id"), col("source"), col("n_chars"))
    val weights = Seq("src0" -> 3L, "src1" -> 1L)
    // budget sized so src0's share = ~3.5 corpus masses: 3 full epochs
    // plus a ~half fractional epoch (a non-empty strict subset even at
    // 25 docs/source)
    val budget = 37000L
    val mixed = Sampling.domainMixEpochs(base, "doc_id", "source", "n_chars",
      weights, budgetTokens = budget, maxEpochs = 4, salt = "ep")
    val t0 = base.filter(col("source") === "src0").agg(sum("n_chars")).head.getLong(0)
    val n0 = base.filter(col("source") === "src0").count()
    val target0 = budget * 3 / 4
    val fullEpochs = (target0 / t0).toInt
    assert(fullEpochs >= 2, s"fixture drift: src0 total $t0 — re-derive the expectations")
    // every full epoch replicates the complete domain
    for (e <- 0 until fullEpochs)
      assert(mixed.filter(col("source") === "src0" && col("epoch") === e).count() == n0,
        s"full epoch $e must contain the whole domain")
    // the fractional last epoch is a strict non-empty subset
    val frac = mixed.filter(col("source") === "src0" && col("epoch") === fullEpochs).count()
    assert(frac > 0 && frac < n0)
    // delivered token mass reaches the share (vs domainMix's keep-all
    // under-delivery of just t0): at least the full epochs exactly,
    // and near the target within hash-bucket granularity
    val delivered = mixed.filter(col("source") === "src0")
      .agg(sum("n_chars")).head.getLong(0)
    assert(delivered >= fullEpochs * t0)
    assert(delivered > t0, "upsampling must beat the keep-all cap")
    assert(math.abs(delivered - target0).toDouble / target0 < 0.25,
      s"delivered $delivered vs target $target0")
    // (id, epoch) is unique per domain
    assert(mixed.groupBy("doc_id", "epoch", "source").count()
      .filter(col("count") > 1).count() == 0)
    // determinism
    val again = Sampling.domainMixEpochs(base, "doc_id", "source", "n_chars",
      weights, budgetTokens = budget, maxEpochs = 4, salt = "ep")
      .select("doc_id", "epoch").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(again === mixed.select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet)
  }

  test("temperature weights: alpha 1 proportional, alpha 0 uniform, flattening in between") {
    val totals = Seq("big" -> 900000L, "mid" -> 90000L, "small" -> 10000L)
    // alpha 1: shares proportional to mass (ratios preserved at scale)
    val w1 = Sampling.temperatureWeights(totals, alpha = 1.0).toMap
    assert(w1("big") === 900000L && w1("mid") === 90000L && w1("small") === 10000L)
    // alpha 0: uniform
    val w0 = Sampling.temperatureWeights(totals, alpha = 0.0).toMap
    assert(w0.values.toSet.size === 1)
    // alpha 0.3 (the XLM-R point): strictly between — order preserved,
    // but small's SHARE strictly beats its proportional share
    val w3 = Sampling.temperatureWeights(totals, alpha = 0.3).toMap
    assert(w3("big") > w3("mid") && w3("mid") > w3("small"))
    val sum3 = w3.values.sum.toDouble
    assert(w3("small") / sum3 > 10000.0 / 1000000.0,
      "temperature must boost the small domain's share")
    assert(w3("big") / sum3 < 0.9, "and shrink the big domain's")
    // determinism and the min-1 floor
    assert(Sampling.temperatureWeights(totals, 0.3) ===
      Sampling.temperatureWeights(totals, 0.3))
    val tiny = Sampling.temperatureWeights(
      Seq("a" -> 1L, "b" -> 1000000000000L), alpha = 1.0).toMap
    assert(tiny("a") >= 1L)
    intercept[IllegalArgumentException] {
      Sampling.temperatureWeights(Seq("a" -> 0L), 0.5)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureWeights(totals, 1.5)
    }
  }

  test("domain mix epochs: downsampled domain equals domainMix at epoch 0; epoch cap raises") {
    val base = docs.select(col("doc_id"), col("source"), col("n_chars"))
    val eps = Sampling.domainMixEpochs(base, "doc_id", "source", "n_chars",
      Seq("src2" -> 1L), budgetTokens = 4000L, maxEpochs = 4, salt = "mix")
    assert(eps.select("epoch").distinct().collect().map(_.getInt(0)).toSeq === Seq(0))
    val plain = Sampling.domainMix(base, "doc_id", "source", "n_chars",
      Seq("src2" -> 1L), budgetTokens = 4000L, salt = "mix")
    assert(eps.drop("epoch").collect().map(_.toString).sorted.toSeq ===
      plain.collect().map(_.toString).sorted.toSeq)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val ex = intercept[Exception] {
      Sampling.domainMixEpochs(base, "doc_id", "source", "n_chars",
        Seq("src0" -> 1L), budgetTokens = 100000L, maxEpochs = 2).collect()
    }
    assert(messages(ex).exists(_.contains("maxEpochs")))
  }

  test("domain mix epochs: absent or zero-mass weighted domains raise, not vanish") {
    val base = docs.select(col("doc_id"), col("source"), col("n_chars"))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    // a weights entry naming a domain absent from df used to disappear
    // in the inner join — silent under-delivery of the budget
    val exAbsent = intercept[Exception] {
      Sampling.domainMixEpochs(base, "doc_id", "source", "n_chars",
        Seq("src0" -> 1L, "no_such_domain" -> 1L),
        budgetTokens = 10000L, maxEpochs = 4).collect()
    }
    assert(messages(exAbsent).exists(_.contains("no positive token mass")))
    // a domain whose token mass sums to zero used to div-by-zero into
    // NULL thresholds and vanish the same way
    val zeroed = base.withColumn("n_chars",
      when(col("source") === "src1", lit(0L)).otherwise(col("n_chars")))
    val exZero = intercept[Exception] {
      Sampling.domainMixEpochs(zeroed, "doc_id", "source", "n_chars",
        Seq("src0" -> 1L, "src1" -> 1L),
        budgetTokens = 10000L, maxEpochs = 4).collect()
    }
    assert(messages(exZero).exists(_.contains("no positive token mass")))
  }

  test("domain mix: huge budget keeps every listed domain in full") {
    val base = docs.select(col("doc_id"), col("source"), col("n_chars"))
    val all = Sampling.domainMix(base, "doc_id", "source", "n_chars",
      Seq("src4" -> 1L, "src5" -> 1L), budgetTokens = 100000000L)
    val want = base.filter(col("source").isin("src4", "src5")).count()
    assert(all.count() == want)
    assert(all.columns.toSeq == base.columns.toSeq)
  }

  test("splits reject negative weights (silently-starved split otherwise)") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(docs, "doc_id",
        Seq("train" -> 0.5, "valid" -> -0.2, "test" -> 0.7))
    }
  }

  test("splits: disjoint, exhaustive, weighted, stable under growth") {
    val weights = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val assigned = Sampling.assignSplits(docs, "doc_id", weights)
    val counts = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(counts.keySet == Set("train", "valid", "test"))
    assert(counts.values.sum == n.toLong, "splits must be exhaustive")
    assert(math.abs(counts("train") / n - 0.8) < 0.03)
    assert(math.abs(counts("valid") / n - 0.1) < 0.02)
    assert(math.abs(counts("test") / n - 0.1) < 0.02)
    // membership is a pure function of the key: assigning over a SUBSET
    // of the corpus gives every surviving row the same split
    val subsetAssign = Sampling.assignSplits(
      docs.filter(col("doc_id") % 3 === 0), "doc_id", weights)
      .select("doc_id", "split")
    val full = assigned.select("doc_id", "split")
      .withColumnRenamed("split", "full_split")
    assert(subsetAssign.join(full, "doc_id")
      .filter(col("split") =!= col("full_split")).count() == 0L)
  }

  test("stratified sample: exactly k per stratum, deterministic, WindowGroupLimit plan") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang", k = 10, salt = "s")
    val counts = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val strata = docs.select("lang").distinct().count()
    assert(counts.size == strata.toInt)
    assert(counts.values.forall(_ == 10L), s"every stratum must yield exactly k: $counts")
    // deterministic: the same call selects the same rows
    val a = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedSample(docs, "doc_id", "lang", k = 10, salt = "s")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // a stratum smaller than k yields all its rows (no padding, no error)
    val tiny = Sampling.stratifiedSample(
      docs.filter(col("doc_id") < 3), "doc_id", "lang", k = 10)
    assert(tiny.count() == docs.filter(col("doc_id") < 3).count())
    // bounded pre-shuffle state: the rank filter plans as WindowGroupLimit
    val plan = sampled.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
    intercept[IllegalArgumentException](
      Sampling.stratifiedSample(docs, "doc_id", "lang", k = 0))
  }

  test("quantileStrata keeps every quartile populated near the target fraction") {
    val ev = sources.ParquetTables.readTable(spark, sf("sf0.001"), "events")
    val out = Sampling.quantileStrata(
      ev, Seq("event_type"), "value", "event_id",
      buckets = 4, fraction = 0.5, salt = "qs")
    // per (type, quartile): the kept share is binomial around 0.5 —
    // with ~50 rows per cell, [0.25, 0.75] is a >6-sigma band
    val shares = out.groupBy("event_type", "quantile_bucket")
      .agg(count(lit(1)).as("kept"))
      .collect().map(_.getLong(2))
    val cells = ev.select("event_type").distinct().count() * 4
    assert(shares.length == cells, s"every quartile cell must survive")
    // determinism: same salt, same membership
    val again = Sampling.quantileStrata(
      ev, Seq("event_type"), "value", "event_id", 4, 0.5, "qs")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val first = out.select("event_id").collect().map(_.getLong(0)).toSet
    assert(again === first)
    // quartile labels partition each group evenly (ntile property)
    val byQ = ev.filter(col("value").isNotNull)
      .count()
    assert(first.size > byQ / 4 && first.size < 3 * byQ / 4)
  }

  test("shuffleShards: every row kept, shard in range, pos dense from 0 per shard") {
    val docs = sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")
    val out = Sampling.shuffleShards(docs.select("doc_id"), "doc_id", shards = 8, salt = "t")
    assert(out.count() == docs.count())
    val byShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("d"))
      .collect()
    assert(byShard.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 8))
    byShard.foreach { r =>
      assert(r.getLong(2) == 0L, "pos starts at 0")
      assert(r.getLong(3) == r.getLong(1) - 1, "pos is dense")
      assert(r.getLong(4) == r.getLong(1), "pos is unique per shard")
    }
  }

  test("shuffleShards: deterministic across runs; different salts give different permutations") {
    val docs = sources.ParquetTables.readTable(spark, sf("sf0.001"), "documents")
      .select("doc_id")
    def perm(salt: String): Map[Long, (Int, Long)] =
      Sampling.shuffleShards(docs, "doc_id", 8, salt)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val a = perm("s1")
    assert(perm("s1") == a)
    val b = perm("s2")
    assert(a != b, "independent salts should not reproduce the permutation")
    // shuffle decorrelates corpus order: adjacent ids rarely stay adjacent
    val adjacentKept = a.keys.toSeq.sorted.sliding(2).count {
      case Seq(x, y) => a(x)._1 == a(y)._1 && a(y)._2 == a(x)._2 + 1
      case _         => false
    }
    assert(adjacentKept < a.size / 10,
      s"$adjacentKept of ${a.size} adjacent id pairs survived adjacent — not shuffled")
    intercept[IllegalArgumentException](Sampling.shuffleShards(docs, "doc_id", 0))
  }
}
