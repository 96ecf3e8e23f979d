package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling — the reproducibility primitive
  * of a training-data pipeline (corpus decimation, held-out splits,
  * A/B slices). Where `rand()`-based sampling changes membership on
  * every run/partitioning, hash sampling is a pure per-row function of
  * (key, salt): stable across runs, engines and cluster layouts, and
  * exactly reproducible by any system with md5 (the DuckDB oracles
  * compare the literal membership, not just counts).
  *
  * Mechanics: the first `HexDigits` hex chars of `md5(key || salt)`
  * are compared lexically against a threshold — uniform over 16^4
  * buckets, scan-local (codegen'd md5, zero shuffle), O(1) state.
  * Different salts give independent samples; the same salt gives the
  * same sample anywhere.
  */
object Sampling {

  private val HexDigits = 4
  private val Buckets   = 1 << (4 * HexDigits) // 65536

  /** Zero-padded lowercase hex threshold for `fraction`: rows with
    * hash prefix strictly below it are in-sample — exactly
    * `floor(fraction * 65536)` of the 65536 buckets. */
  private[graft] def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    val b = math.floor(fraction * Buckets).toLong
    // "g" sorts above every hex char, so fraction 1.0 keeps everything
    // (a 5-char "10000" would compare lexically BELOW "ffff")
    if (b >= Buckets) "g" else f"$b%04x"
  }

  /** The 4-hex-char bucket key of a row. */
  private def bucketKey(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(salt))), 1, HexDigits)

  /** Keep a deterministic `fraction` of rows, keyed by `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double, salt: String = ""): DataFrame =
    df.filter(bucketKey(col(keyCol), salt) < lit(hexThreshold(fraction)))

  /** Quantile-stratified sampling: label every row with its per-group
    * value quantile bucket (ntile over the (value, tie) total order —
    * engine-portable, no interpolation) and hash-sample UNIFORMLY
    * WITHIN each bucket. The curation play this enables: "keep 25% of
    * each quality quartile" preserves the score distribution's shape,
    * where a global sample lets the dominant quartile swamp the tails
    * and a top-k cut throws the tails away entirely. Membership stays
    * a pure function of (tie key, salt); the quantile label is a pure
    * function of the corpus — both deterministic, both scan-local
    * after the one ntile window exchange. Null values carry no rank
    * and are dropped (the [[graft.operators.Winsorize]] rule). */
  def quantileStrata(
      df: DataFrame, groupCols: Seq[String], valueCol: String, tieCol: String,
      buckets: Int, fraction: Double, salt: String = ""
  ): DataFrame = {
    require(buckets >= 2, s"need at least 2 quantile buckets, got $buckets")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol), col(tieCol))
    hashSample(
      df.filter(col(valueCol).isNotNull)
        .withColumn("quantile_bucket", ntile(buckets).over(w)),
      tieCol, fraction, salt)
  }

  /** Assign every row to a named split with the given weights (summing
    * to <= 1; any remainder falls into the LAST split, so (train 0.8,
    * valid 0.1, test 0.1) is exhaustive and disjoint by construction).
    * Membership is stable under corpus growth: a row's split never
    * changes when other rows are added or removed. */
  def assignSplits(
      df: DataFrame, keyCol: String,
      weights: Seq[(String, Double)], salt: String = ""
  ): DataFrame = {
    require(weights.nonEmpty, "at least one split required")
    require(weights.forall(_._2 >= 0.0),
      s"split weights must be non-negative: $weights") // a negative weight
    // would make the cumulative thresholds non-monotonic and silently
    // starve the following split
    require(weights.map(_._2).sum <= 1.0 + 1e-9, "split weights must sum to <= 1")
    val key = bucketKey(col(keyCol), salt)
    val cumulative = weights.init.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
      .zip(weights.init.map(_._1))
    // thresholds are cumulative, so the FIRST matching when-branch must
    // win: build the chain inside-out so branches keep declaration order
    val ordered = cumulative.reverse.foldLeft(lit(weights.last._1): Column) {
      case (elseCol, (cum, name)) => when(key < lit(hexThreshold(cum)), lit(name)).otherwise(elseCol)
    }
    df.withColumn("split", ordered)
  }

  /** Domain-mixture downsampling to a token budget — the corpus-mixing
    * primitive of a training run ("60% web, 25% books, …, capped at N
    * tokens total"). Each listed domain keeps a deterministic hash
    * sample sized so its expected token mass is
    * `budget * weight / sum(weights)`; a domain whose corpus is
    * already below its target keeps everything (acceptance capped at
    * 1), and domains not listed are dropped. Membership is a pure
    * function of (key, salt) — stable across runs and engines like
    * [[hashSample]], and the per-domain acceptance thresholds are
    * computed in exact integer arithmetic (decimal div, no float
    * rounding) so any md5-capable system reproduces the sample
    * bit-for-bit.
    *
    * Plan shape: one partial-aggregated groupBy over the corpus for
    * per-domain token totals (|domains| rows), a broadcast join of the
    * thresholds, and a scan-local codegen'd md5 filter — the corpus is
    * never shuffled.
    */
  def domainMix(
      df: DataFrame, keyCol: String, domainCol: String, tokenCol: String,
      weights: Seq[(String, Long)], budgetTokens: Long, salt: String = ""
  ): DataFrame = {
    require(weights.nonEmpty, "at least one domain weight required")
    require(weights.forall(_._2 > 0), s"weights must be positive: $weights")
    require(budgetTokens > 0, s"budget must be positive: $budgetTokens")
    val sumW = weights.map(_._2).sum
    val spark = df.sparkSession
    import spark.implicits._
    val wDf = weights.toDF(domainCol, "__w")
    val totals = df.groupBy(col(domainCol))
      .agg(sum(col(tokenCol)).cast("decimal(38,0)").as("__toks"))
    // buckets-in-sample of 65536, floored exactly: decimal `div` is a
    // true integral divide (no intermediate float, no decimal-scale
    // rounding), so engines agree even when the quotient grazes an
    // integer boundary
    val thr = totals.join(wDf, Seq(domainCol))
      .withColumn("__buckets", expr(
        s"(CAST($Buckets AS DECIMAL(38,0)) * CAST($budgetTokens AS DECIMAL(38,0))" +
          s" * CAST(__w AS DECIMAL(38,0))) div (CAST($sumW AS DECIMAL(38,0)) * __toks)"))
      .withColumn("__thr",
        when(col("__buckets") >= Buckets, lit("g")) // keep-all (see hexThreshold)
          .otherwise(format_string("%04x", col("__buckets"))))
      .select(col(domainCol), col("__thr"))
    df.join(broadcast(thr), Seq(domainCol))
      .filter(bucketKey(col(keyCol), salt) < col("__thr"))
      .drop("__thr")
      .select(df.columns.toIndexedSeq.map(col): _*)
  }

  /** Temperature-scaled mixture weights — the published multilingual
    * sampling rule [Conneau et al. 2020 (XLM-R) §3.1; the mBERT
    * exponentiated-smoothing trick]: sampling shares `p_i ∝ n_i^α`
    * flatten the domain-size distribution — `α = 1` is proportional
    * (big domains dominate), `α → 0` uniform, `α = 0.3` the XLM-R
    * point. Returns INTEGER weights (share × `scale`, min 1 so no
    * listed domain vanishes) ready for [[domainMix]] /
    * [[domainMixEpochs]]: the weight choice is a driver-side modeling
    * decision — like hand-picking 60/25/10/5 — and membership stays
    * exact given the integers. `StrictMath.pow` for cross-platform
    * determinism of the one floating-point step. */
  def temperatureWeights(
      totals: Seq[(String, Long)], alpha: Double, scale: Long = 1000000L
  ): Seq[(String, Long)] = {
    require(totals.nonEmpty, "at least one domain total required")
    require(totals.forall(_._2 > 0), s"domain totals must be positive: $totals")
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0, 1], got $alpha")
    require(scale >= totals.size,
      s"scale $scale too small for ${totals.size} domains (min-1 floors would distort)")
    val powed = totals.map { case (d, n) => d -> StrictMath.pow(n.toDouble, alpha) }
    val sum = powed.map(_._2).sum
    powed.map { case (d, p) =>
      d -> math.max(1L, math.round(p / sum * scale))
    }
  }

  /** Domain mixture WITH UPSAMPLING (epochs) — the missing half of the
    * real LLM-mixture contract that [[domainMix]]'s keep-all cap
    * leaves silent: a small high-quality domain whose corpus sits
    * BELOW its token share is REPEATED for multiple epochs until it
    * delivers the share (the standard published-mixture practice —
    * high-quality sources run several epochs while the crawl runs a
    * fraction of one), instead of under-delivering the budget.
    *
    * Output adds a 0-based `epoch` provenance column. With per-domain
    * corpus mass `T`, weight `w`, budget `B`, weight sum `Σw` — all in
    * exact decimal(38,0) arithmetic:
    *  - `F = (B·w) div (Σw·T)` FULL epochs `0 .. F-1`, each the whole
    *    domain;
    *  - remainder `R = B·w − F·Σw·T` > 0 adds a FRACTIONAL epoch `F`
    *    keeping the md5 bucket sample of `(65536·R) div (Σw·T)` of the
    *    65536 buckets (the same exact-integer rule as [[domainMix]]);
    *  - a downsampled domain (`T` ≥ target) is the `F = 0` case —
    *    byte-identical membership to [[domainMix]], at epoch 0.
    *
    * `maxEpochs` bounds replication; a domain NEEDING more epochs
    * raises in-plan (fail-loud: a silent cap is exactly the
    * under-delivery this operator exists to fix — lower the weight or
    * raise the bound deliberately).
    *
    * Plan shape: one partial-agg groupBy for domain totals, then a
    * broadcast join against the ≤|domains|·(maxEpochs+1)-row
    * (domain, epoch, threshold) table whose join fan-out IS the
    * replication — cost proportional to rows actually emitted, the
    * corpus never shuffles, membership stays a pure scan-local
    * function of (key, salt, epoch thresholds). Downstream id-keyed
    * logic must key on (id, epoch) — the pipeline `mix` step's
    * collision guard does. */
  def domainMixEpochs(
      df: DataFrame, keyCol: String, domainCol: String, tokenCol: String,
      weights: Seq[(String, Long)], budgetTokens: Long, maxEpochs: Int,
      salt: String = ""
  ): DataFrame = {
    require(weights.nonEmpty, "at least one domain weight required")
    require(weights.forall(_._2 > 0), s"weights must be positive: $weights")
    require(budgetTokens > 0, s"budget must be positive: $budgetTokens")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val sumW = weights.map(_._2).sum
    val spark = df.sparkSession
    import spark.implicits._
    val wDf = weights.toDF(domainCol, "__w")
    val totals = df.groupBy(col(domainCol))
      .agg(sum(col(tokenCol)).cast("decimal(38,0)").as("__toks"))
    // LEFT from the weights side + filter-anchored raise: a weighted
    // domain absent from df (NULL __toks) or with zero/NULL token mass
    // would otherwise VANISH silently — the inner join drops the row,
    // or the div-by-zero NULLs __F and the epoch row disappears —
    // under-delivering the budget without a trace (the exact failure
    // the operator's own maxEpochs fail-loud convention forbids).
    val epochs = wDf.join(totals, Seq(domainCol), "left")
      .withColumn("__mass_ok",
        when(col("__toks").isNull || col("__toks") <= 0,
          raise_error(concat(
            lit("domainMixEpochs: weighted domain "),
            col(domainCol).cast("string"),
            lit(" has no positive token mass in the corpus — drop it from " +
              "weights or fix the domain/token columns"))))
          .otherwise(lit(true)))
      .filter(col("__mass_ok")).drop("__mass_ok")
      .withColumn("__den", expr(s"CAST($sumW AS DECIMAL(38,0)) * __toks"))
      .withColumn("__num",
        expr(s"CAST($budgetTokens AS DECIMAL(38,0)) * CAST(__w AS DECIMAL(38,0))"))
      .withColumn("__F", expr("__num div __den"))
      .withColumn("__R", expr("__num - CAST(__F AS DECIMAL(38,0)) * __den"))
      // fail-loud BEFORE the epoch fan-out (filter-anchored so the
      // raise survives column pruning)
      .withColumn("__ok",
        when(col("__F") + when(expr("__R > 0"), lit(1L)).otherwise(lit(0L))
            > lit(maxEpochs.toLong),
          raise_error(concat(
            lit("domainMixEpochs: domain "), col(domainCol).cast("string"),
            lit(" needs "),
            (col("__F") + when(expr("__R > 0"), lit(1L)).otherwise(lit(0L))).cast("string"),
            lit(s" epochs to deliver its token share but maxEpochs=$maxEpochs — " +
              "raise maxEpochs or lower the domain's weight"))))
          .otherwise(lit(true)))
      .filter(col("__ok"))
      .withColumn("epoch", explode(expr("sequence(CAST(0 AS BIGINT), __F)")))
      // the row for epoch F exists only when a fractional remainder does
      .filter(col("epoch") < col("__F") || expr("__R > 0"))
      .withColumn("__thr",
        when(col("epoch") < col("__F"), lit("g"))
          .otherwise(format_string("%04x",
            expr("(CAST(65536 AS DECIMAL(38,0)) * __R) div __den"))))
      .select(col(domainCol), col("epoch").cast("int").as("epoch"), col("__thr"))
    df.join(broadcast(epochs), Seq(domainCol))
      .filter(bucketKey(col(keyCol), salt) < col("__thr"))
      .drop("__thr")
      .select(df.columns.toIndexedSeq.map(col) :+ col("epoch"): _*)
  }

  /** Systematic probability-proportional-to-size sampling (Madow
    * 1949): pick ~k rows with inclusion probability proportional to
    * an integral weight — the "sample documents proportional to token
    * count" primitive. Deterministic and engine-exact: rows are laid
    * on the integer number line by a prefix sum of weights in key
    * order, and a row is picked once per multiple of `step = total
    * div k` its weight interval covers (`picks = cum div step -
    * (cum-w) div step`, all floor division — a row heavier than
    * `step` is picked multiple times, zero-weight rows never).
    *
    * `keyCol` must be a UNIQUE key: it is the total order the number
    * line is built on. With duplicate keys the ROWS-frame prefix sum
    * keeps the total pick count exact, but WHICH duplicate carries a
    * pick depends on tie order — not reproducible across engines.
    *
    * The global prefix sum does NOT use a single-partition window
    * (the classic driver-melting mistake): the weights are
    * range-partitioned by key, each partition prefix-sums locally,
    * and the per-partition offsets — a |partitions|-row aggregate —
    * broadcast back (the two-phase shape of
    * [[graft.exec.SurrogateKeys]]). The cumulative value of a row
    * depends only on the data and key order, never on partitioning,
    * so the DuckDB oracle reproduces it with a plain window. */
  def weightedSystematic(
      df: DataFrame, keyCol: String, weightCol: String, k: Int, partitions: Int = 0
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val p = if (partitions > 0) partitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val w = org.apache.spark.sql.expressions.Window
    val sorted = df
      .filter(col(weightCol).isNotNull && col(weightCol) >= 0)
      .repartitionByRange(p, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .withColumn("__pid", spark_partition_id())
    // ROWS frame, not the default RANGE: RANGE gives peer rows (equal
    // keys) one shared cumulative value, which double-counts picks —
    // the oracle's ROWS UNBOUNDED PRECEDING is the semantics
    val localCum = sorted.withColumn("__local",
      sum(col(weightCol)).over(w.partitionBy(col("__pid")).orderBy(col(keyCol))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
    // |partitions|-row frames: per-partition totals and their running offsets
    val ptot = sorted.groupBy(col("__pid"))
      .agg(sum(col(weightCol)).cast("decimal(38,0)").as("__psum"))
    val offs = ptot
      .withColumn("__off",
        coalesce(sum(col("__psum")).over(
          w.orderBy(col("__pid")).rowsBetween(Long.MinValue, -1)), lit(0)))
      .select(col("__pid"), col("__off"))
    val total = ptot.agg(sum(col("__psum")).as("__total"))
    localCum
      .join(broadcast(offs), Seq("__pid"))
      .crossJoin(broadcast(total))
      .withColumn("__cum", (col("__local").cast("decimal(38,0)") + col("__off")))
      .withColumn("__step",
        expr(s"CAST(__total AS DECIMAL(38,0)) div CAST($k AS DECIMAL(38,0))"))
      .withColumn("__step",
        when(col("__step") <= 0, raise_error(
          lit(s"weightedSystematic: k=$k exceeds the total weight — every step is empty"))
          .cast("long"))
          .otherwise(col("__step")))
      .withColumn("picks", {
        // Column API, not a spliced SQL string: a weight column named
        // e.g. "n-chars" must resolve, not parse as a subtraction
        val dec  = "decimal(38,0)"
        val cumD  = col("__cum").cast(dec)
        val stepD = col("__step").cast(dec)
        val befD  = (col("__cum") - col(weightCol).cast(dec)).cast(dec)
        call_function("div", cumD, stepD) - call_function("div", befD, stepD)
      })
      .filter(col("picks") > 0)
      .drop("__pid", "__local", "__off", "__cum", "__step", "__total")
  }

  /** Exactly-k-per-stratum deterministic sample: rows are ranked within
    * each stratum by `md5(key || salt)` (ties broken by the key itself,
    * so the rank is total) and the top `k` kept. Unlike [[hashSample]],
    * membership is NOT stable under corpus growth — an exact per-group
    * quota is a ranking, and a new row can displace an old one; use
    * [[hashSample]] when stability matters more than exact counts.
    * Plans as a WindowGroupLimit: each task keeps a bounded per-stratum
    * heap BEFORE the shuffle, so the exchange moves at most k rows per
    * (task, stratum) — never the corpus. */
  def stratifiedSample(
      df: DataFrame, keyCol: String, stratumCol: String, k: Int, salt: String = ""
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(concat(col(keyCol).cast("string"), lit(salt))), col(keyCol))
    df.withColumn("stratum_rank", row_number().over(w))
      .filter(col("stratum_rank") <= k)
  }

  /** Deterministic global shuffle for training export: every row gets a
    * `shard` in [0, shards) and a dense 0-based `pos` within its shard,
    * both pure functions of (key, salt) — the corpus-order
    * decorrelation step before sequence packing / batch construction
    * (adjacent source rows scatter across shards; within a shard, rows
    * order by their hash, not their origin). Rerunning, or running on
    * another engine, produces the identical permutation; a different
    * salt produces an independent one.
    *
    * Scale shape: ONE exchange (the shard hash); each shard is one
    * window partition whose sort spills to disk, so at 100 TB you raise
    * `shards` (more parallel sorts, each smaller) rather than growing
    * any per-task state — the [[graft.operators.Packing]] contract.
    * Hash ties across distinct keys are broken by the key itself, so
    * `pos` is a total order even under md5-prefix collisions. */
  /** `extraKeyCols` join the hash AND the tie order — REQUIRED when
    * (keyCol) alone is not unique (e.g. the `epoch` column after
    * [[domainMixEpochs]]: the same id recurs once per epoch, and two
    * rows tying on (hash, id) would take nondeterministic positions —
    * exactly the reproducibility this operator exists to provide). */
  def shuffleShards(
      df: DataFrame, keyCol: String, shards: Int, salt: String = "",
      extraKeyCols: Seq[String] = Nil): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    Seq("shard", "pos", "__h").foreach { c =>
      require(!df.columns.contains(c),
        s"shuffleShards would overwrite existing column '$c' — rename it first")
    }
    val keys = keyCol +: extraKeyCols
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h") +: keys.map(col): _*)
    df.withColumn("__h", md5(concat(
        keys.map(k => col(k).cast("string")) :+ lit(salt): _*)))
      .withColumn("shard",
        (conv(substring(col("__h"), 1, 4), 16, 10).cast("int") % shards))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__h")
  }
}
