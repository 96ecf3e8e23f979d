package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN indexes: the train-once → store → reuse workflow
  * (the FAISS production shape) over [[Similarity]]'s IVF and PQ
  * machinery.
  *
  * [[Similarity.ivfKnn]]/[[Similarity.pqKnn]] retrain their
  * quantizer/codebooks on every invocation — fine for one-shot
  * analysis, wrong for a nightly 100 TB pipeline, where per-query
  * retraining burns a corpus sample + Lloyd's per run AND makes
  * shortlists drift as the corpus grows. Here the trained model
  * and the per-vector codes become ordinary tables:
  *
  *  - IVF: `centroids` `(cell INT, centroid ARRAY<DOUBLE>)` and
  *    `postings` `(id, cell INT, vector ARRAY<FLOAT>)` — the
  *    inverted-list layout; write postings partitioned by `cell` and
  *    a probe reads only its `nProbe` partitions at scale.
  *  - PQ: `codebooks` `(subspace INT, code INT, dim INT,
  *    centroid ARRAY<DOUBLE>)` and `codes` `(id, codes ARRAY<INT>)` —
  *    8 bytes per vector at the default m=8; the exact rescore still
  *    reads the raw corpus, so codes tables stay tiny.
  *
  * Determinism contract: training is seeded and sample order is an
  * id-hash ([[Similarity.trainIvfModel]] / [[Similarity.trainPqModel]]),
  * centroid doubles round-trip parquet exactly, and the indexed search
  * paths share the retrain paths' UDF arithmetic verbatim — so
  * query-against-stored-index returns IDENTICAL rows to a same-seed
  * retrain (pinned in SimilaritySpec and the `embed_knn_*_stored`
  * gates).
  */
object AnnIndex {

  /** Model tables are collected driver-side at query time — bounded by
    * construction (an IVF quantizer has ~√N cells at most; a PQ
    * codebook is m × kCodes), but a wrong table passed as a model must
    * fail loud, not OOM the driver. */
  val MaxModelRows = 1 << 20

  private def boundedModelRows(df: DataFrame, what: String): Array[org.apache.spark.sql.Row] = {
    val rows = df.limit(MaxModelRows + 1).collect()
    require(rows.length <= MaxModelRows,
      s"$what: model table has more than $MaxModelRows rows — not a trained " +
        "model table (did you pass the corpus by mistake?)")
    rows
  }

  /** The distinct probed-cell set of a query batch — bounded by the
    * cell count (never the query count), collected driver-side to
    * become an IN filter on the stored table's `cell` partition
    * column, so a `partitionBy("cell")` index reads only its probed
    * partitions (partition pruning pinned in PlanSpec). The probes
    * subplan evaluates twice (once here, once in the search join) —
    * deliberate: queries are the SMALL side by construction, and
    * persisting a frame that escapes into the returned lazy plan
    * could not be unpersisted safely. Filtering to probed cells
    * cannot change the join result, so stored == retrain equality is
    * preserved. Shared by every stored-index query path. */
  private def probedCells(
      queries: DataFrame, idCol: String, vecCol: String,
      nProbe: Int, cents: Array[Array[Double]]): Seq[Int] =
    Similarity.ivfProbes(queries, idCol, vecCol, nProbe, cents)
      .select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq // <= cents.length rows

  // ================================================================ IVF

  /** Train an IVF coarse quantizer and return it as a table:
    * `(cell INT, centroid ARRAY<DOUBLE>)`, unit-normalized centroids
    * in cell order. Persist with `.write.parquet` and reuse across
    * runs via [[ivfKnnIndexed]]. */
  def trainIvf(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, iters: Int = 10, seed: Long = 42L
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    Similarity.trainIvfModel(corpus, idCol, vecCol, nCells, iters, seed)
      .zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("cell", "centroid")
  }

  /** Load a centroids table back into the in-memory model shape:
    * cell-indexed array of unit centroids. Fails loud on gaps or
    * duplicates — a filtered or mis-joined centroids table would
    * silently mis-assign every vector. */
  def ivfModel(centroids: DataFrame): Array[Array[Double]] = {
    val rows = boundedModelRows(
      centroids.select(col("cell").cast("int"), col("centroid")), "ivfModel")
    val byCell = rows.map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    require(byCell.size == rows.length,
      s"ivfModel: duplicate cell ids in centroids table (${rows.length} rows, " +
        s"${byCell.size} distinct cells)")
    val n = rows.length
    require(n > 0, "ivfModel: empty centroids table")
    Array.tabulate(n)(i => byCell.getOrElse(i, throw new IllegalArgumentException(
      s"ivfModel: centroids table has $n rows but no cell $i — cells must be " +
        "contiguous 0-based (was the table filtered?)")))
  }

  /** Encode the corpus against a stored quantizer: the postings table
    * `(id, cell, vector)` — scan-local (the model rides the UDF
    * closure), no shuffle. Write `.partitionBy("cell")` so stored
    * probes prune to their cells. NULL vectors get a NULL cell (they
    * carry no geometry; the search join drops them). */
  def encodeIvf(
      corpus: DataFrame, idCol: String, vecCol: String, centroids: DataFrame
  ): DataFrame =
    encodeIvfWith(corpus, idCol, vecCol, ivfModel(centroids))

  /** [[encodeIvf]] over an already-LOADED centroid model (one collect,
    * shared across encode and query). */
  def encodeIvfWith(
      corpus: DataFrame, idCol: String, vecCol: String,
      model: Array[Array[Double]]
  ): DataFrame =
    corpus.select(col(idCol).as("id"),
      Similarity.ivfAssignUdf(model)(col(vecCol)).as("cell"),
      col(vecCol).as("vector"))

  /** Query a STORED IVF index: identical rows to
    * [[Similarity.ivfKnn]] at the same training params — no retrain,
    * and the postings scan is PRE-PRUNED to the probed cells
    * ([[probedCells]]) — at 1024 cells and nProbe 3 a query batch
    * touching 30 cells reads ~3% of the index instead of scanning
    * it. */
  def ivfKnnIndexed(
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      centroids: DataFrame, postings: DataFrame, nProbe: Int = 3
  ): DataFrame =
    ivfKnnIndexedWith(queries, idCol, vecCol, k, ivfModel(centroids),
      postings, nProbe)

  /** [[ivfKnnIndexed]] over an already-LOADED centroid model (one
    * collect, shared across encode and query). */
  def ivfKnnIndexedWith(
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      model: Array[Array[Double]], postings: DataFrame, nProbe: Int = 3
  ): DataFrame = {
    val assigned = postings.select(
      col("id").as("neighbor_id"), col("vector").as("cv"),
      col("cell").cast("int").as("cell"))
    val probes = Similarity.ivfProbes(queries, idCol, vecCol, nProbe, model)
    val cells = probedCells(queries, idCol, vecCol, nProbe, model)
    Similarity.ivfSearchOnProbes(
      assigned.filter(col("cell").isin(cells: _*)), probes, k)
  }

  // ================================================================ PQ

  /** Train PQ codebooks and return them as a table:
    * `(subspace INT, code INT, dim INT, centroid ARRAY<DOUBLE>)`.
    * `dim` (constant across rows) pins the trained dimension; m and
    * kCodes are the subspace/code extents. */
  def trainPq(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, kCodes: Int = 16, iters: Int = 10
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val model = Similarity.trainPqModel(corpus, idCol, vecCol, m, kCodes, iters)
    (for {
      j <- 0 until model.m
      c <- 0 until model.kCodes
    } yield (j, c, model.dim, model.codebooks(j)(c).toSeq))
      .toDF("subspace", "code", "dim", "centroid")
  }

  /** Load a codebooks table back into a [[Similarity.PqModel]]. Fails
    * loud on gaps, duplicates, or inconsistent dims. */
  def pqModel(codebooks: DataFrame): Similarity.PqModel = {
    val rows = boundedModelRows(
      codebooks.select(col("subspace").cast("int"), col("code").cast("int"),
        col("dim").cast("int"), col("centroid")), "pqModel")
    require(rows.nonEmpty, "pqModel: empty codebooks table")
    val dims = rows.map(_.getInt(2)).distinct
    require(dims.length == 1,
      s"pqModel: inconsistent dim column (${dims.sorted.mkString(", ")})")
    val dim = dims.head
    val m = rows.map(_.getInt(0)).max + 1
    val kCodes = rows.map(_.getInt(1)).max + 1
    require(rows.length == m * kCodes,
      s"pqModel: expected $m x $kCodes = ${m * kCodes} codebook rows, got " +
        s"${rows.length} — gaps or duplicates (was the table filtered?)")
    val byKey = rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](3).toArray).toMap
    require(byKey.size == rows.length, "pqModel: duplicate (subspace, code) rows")
    val cb = Array.tabulate(m)(j => Array.tabulate(kCodes)(c =>
      byKey.getOrElse((j, c), throw new IllegalArgumentException(
        s"pqModel: missing codebook entry (subspace $j, code $c)"))))
    Similarity.PqModel(dim, m, kCodes, cb)
  }

  /** Encode the corpus against stored codebooks: the codes table
    * `(id, codes ARRAY<INT>)` — 8 bytes of payload per vector at the
    * default m=8, scan-local. */
  def encodePq(
      corpus: DataFrame, idCol: String, vecCol: String, codebooks: DataFrame
  ): DataFrame =
    encodePqWith(corpus, idCol, vecCol, pqModel(codebooks))

  /** [[encodePq]] over an already-LOADED model (one collect, shared
    * across encode and query). */
  def encodePqWith(
      corpus: DataFrame, idCol: String, vecCol: String,
      model: Similarity.PqModel
  ): DataFrame =
    corpus.select(col(idCol).as("id"),
      Similarity.pqEncodeUdf(model)(col(idCol).cast("string"), col(vecCol)).as("codes"))

  /** Query a STORED PQ index: identical rows to [[Similarity.pqKnn]]
    * at the same training params. `corpus` supplies the raw vectors
    * for the exact rescore of the shortlist (the index never stores
    * them — that is the memory win). */
  def pqKnnIndexed(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, codebooks: DataFrame, codes: DataFrame, shortlist: Int = 32
  ): DataFrame =
    pqKnnIndexedWith(corpus, queries, idCol, vecCol, k, pqModel(codebooks),
      codes, shortlist)

  /** [[pqKnnIndexed]] over an already-LOADED model (one collect,
    * shared across encode and query). */
  def pqKnnIndexedWith(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, model: Similarity.PqModel, codes: DataFrame, shortlist: Int = 32
  ): DataFrame = {
    val cz = codes.select(col("id").as("neighbor_id"), col("codes"))
    Similarity.pqSearchCore(corpus, cz, queries, idCol, vecCol, k, shortlist, model)
  }

  // ============================================================== OPQ
  /** Train an OPQ index (rotation + codebooks, jointly —
    * [[Similarity.trainOpqModel]]) and return BOTH model tables:
    * the rotation `(row INT, dim INT, coeffs ARRAY<DOUBLE>)` and the
    * codebooks in the [[trainPq]] shape. Persist both and reuse via
    * [[opqKnnIndexed]]; the rotation is the "fourth model table" of
    * the FAISS `OPQ{m},PQ{m}` layout. */
  /** The rotation table of an OPQ model — ONE schema home
    * (`row INT, dim INT, coeffs ARRAY<DOUBLE>`), shared by
    * [[trainOpq]] and [[trainIvfOpq]] so the loader can never see two
    * divergent shapes. */
  private def rotationTable(
      spark: SparkSession, model: Similarity.OpqModel): DataFrame = {
    import spark.implicits._
    model.rotation.zipWithIndex
      .map { case (r, i) => (i, model.pq.dim, r.toSeq) }
      .toSeq.toDF("row", "dim", "coeffs")
  }

  def trainOpq(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, kCodes: Int = 16, iters: Int = 10, opqIters: Int = 8
  ): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val model = Similarity.trainOpqModel(corpus, idCol, vecCol, m, kCodes, iters, opqIters)
    val books = (for {
      j <- 0 until model.pq.m
      c <- 0 until model.pq.kCodes
    } yield (j, c, model.pq.dim, model.pq.codebooks(j)(c).toSeq))
      .toDF("subspace", "code", "dim", "centroid")
    (rotationTable(spark, model), books)
  }

  /** Load a (rotation, codebooks) table pair back into an
    * [[Similarity.OpqModel]]. Fails loud on gaps, duplicates, dim
    * disagreement between the two tables, or a rotation that is not
    * orthogonal (a filtered or mis-joined rotation would silently
    * mis-rank EVERY candidate — ADC scores would approximate a
    * different query). */
  def opqModel(rotation: DataFrame, codebooks: DataFrame): Similarity.OpqModel = {
    val pq = pqModel(codebooks)
    val rows = boundedModelRows(
      rotation.select(col("row").cast("int"), col("dim").cast("int"), col("coeffs")),
      "opqModel")
    require(rows.nonEmpty, "opqModel: empty rotation table")
    val dims = rows.map(_.getInt(1)).distinct
    require(dims.length == 1 && dims.head == pq.dim,
      s"opqModel: rotation dim column (${dims.sorted.mkString(", ")}) does not " +
        s"match the codebooks' dim ${pq.dim}")
    require(rows.length == pq.dim,
      s"opqModel: expected ${pq.dim} rotation rows, got ${rows.length} — " +
        "gaps or duplicates (was the table filtered?)")
    val byRow = rows.map(r => r.getInt(0) -> r.getSeq[Double](2).toArray).toMap
    require(byRow.size == rows.length, "opqModel: duplicate rotation row ids")
    val rot = Array.tabulate(pq.dim)(i => byRow.getOrElse(i,
      throw new IllegalArgumentException(
        s"opqModel: rotation table has ${rows.length} rows but no row $i")))
    rot.zipWithIndex.foreach { case (r, i) =>
      require(r.length == pq.dim,
        s"opqModel: rotation row $i has ${r.length} of ${pq.dim} coefficients")
    }
    // orthogonality sanity: R·Rᵀ ≈ I (parquet round-trips doubles
    // exactly, so only genuine corruption trips this)
    var a = 0
    while (a < pq.dim) {
      var b = 0
      while (b < pq.dim) {
        var s = 0.0; var i = 0
        while (i < pq.dim) { s += rot(a)(i) * rot(b)(i); i += 1 }
        val want = if (a == b) 1.0 else 0.0
        require(math.abs(s - want) < 1e-6,
          s"opqModel: rotation is not orthogonal (R·Rᵀ[$a][$b] = $s) — " +
            "corrupt or filtered rotation table")
        b += 1
      }
      a += 1
    }
    Similarity.OpqModel(rot, pq)
  }

  /** [[trainOpq]]'s two tables folded into ONE — the pipeline's
    * one-output-per-step shape (FAISS likewise serializes the OPQ
    * pretransform chained into one index artifact): codebook rows
    * carry `(subspace, code, dim, centroid, rot_row = NULL)`, rotation
    * rows `(NULL, NULL, dim, centroid = coefficients, rot_row = i)`.
    * The `rot_row` column is the family marker `knn_encode`/`knn`
    * dispatch on. */
  def trainOpqCombined(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, kCodes: Int = 16, iters: Int = 10, opqIters: Int = 8
  ): DataFrame = {
    val (rotation, books) = trainOpq(corpus, idCol, vecCol, m, kCodes, iters, opqIters)
    books
      .withColumn("rot_row", lit(null).cast("int"))
      .unionByName(rotation.select(
        lit(null).cast("int").as("subspace"), lit(null).cast("int").as("code"),
        col("dim"), col("coeffs").as("centroid"), col("row").as("rot_row")))
  }

  /** Split a [[trainOpqCombined]] table back into its halves and load
    * the model ([[opqModel]]'s fail-loud validation applies). */
  def opqModelCombined(combined: DataFrame): Similarity.OpqModel = {
    require(combined.columns.contains("rot_row"),
      "opqModelCombined: not a combined OPQ table (no rot_row column)")
    opqModel(
      combined.filter(col("rot_row").isNotNull)
        .select(col("rot_row").as("row"), col("dim"), col("centroid").as("coeffs")),
      combined.filter(col("rot_row").isNull)
        .select(col("subspace"), col("code"), col("dim"), col("centroid")))
  }

  /** [[encodeOpq]] over a combined model table. */
  def encodeOpqCombined(
      corpus: DataFrame, idCol: String, vecCol: String, combined: DataFrame
  ): DataFrame = {
    val model = opqModelCombined(combined)
    corpus.select(col(idCol).as("id"),
      Similarity.opqEncodeUdf(model)(col(idCol).cast("string"), col(vecCol)).as("codes"))
  }

  /** [[opqKnnIndexed]] over a combined model table. */
  def opqKnnIndexedCombined(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, combined: DataFrame, codes: DataFrame, shortlist: Int = 32
  ): DataFrame = {
    val model = opqModelCombined(combined)
    val cz = codes.select(col("id").as("neighbor_id"), col("codes"))
    Similarity.opqSearchCore(corpus, cz, queries, idCol, vecCol, k, shortlist, model)
  }

  /** Encode the corpus against a stored OPQ model: the codes table
    * `(id, codes ARRAY<INT>)` — m bytes of payload per vector,
    * scan-local (rotation + codebooks ride the UDF closure). */
  def encodeOpq(
      corpus: DataFrame, idCol: String, vecCol: String,
      rotation: DataFrame, codebooks: DataFrame
  ): DataFrame =
    encodeOpqWith(corpus, idCol, vecCol, opqModel(rotation, codebooks))

  /** [[encodeOpq]] over an already-LOADED model (one collect + one
    * orthogonality validation, shared across encode and query). */
  def encodeOpqWith(
      corpus: DataFrame, idCol: String, vecCol: String,
      model: Similarity.OpqModel
  ): DataFrame =
    corpus.select(col(idCol).as("id"),
      Similarity.opqEncodeUdf(model)(col(idCol).cast("string"), col(vecCol)).as("codes"))

  /** Query a STORED OPQ index: identical rows to
    * [[Similarity.opqKnn]] at the same training params. `corpus`
    * supplies the raw vectors for the exact rescore (in the ORIGINAL
    * space — the rotation only chooses candidates). */
  def opqKnnIndexed(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, rotation: DataFrame, codebooks: DataFrame, codes: DataFrame,
      shortlist: Int = 32
  ): DataFrame =
    opqKnnIndexedWith(corpus, queries, idCol, vecCol, k,
      opqModel(rotation, codebooks), codes, shortlist)

  /** [[opqKnnIndexed]] over an already-LOADED model (same motivation
    * as [[encodeOpqWith]]). */
  def opqKnnIndexedWith(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, model: Similarity.OpqModel, codes: DataFrame,
      shortlist: Int = 32
  ): DataFrame = {
    val cz = codes.select(col("id").as("neighbor_id"), col("codes"))
    Similarity.opqSearchCore(corpus, cz, queries, idCol, vecCol, k, shortlist, model)
  }

  // ============================================================ OPQ+IVF-PQ
  /** Train the fully composed FAISS `OPQ{m},IVF{x},PQ{m}` index: the
    * OPQ pretransform trains first (joint rotation + throwaway
    * codebooks on the raw sample), then the coarse quantizer and the
    * residual codebooks train in ROTATED space — the four-table form
    * (rotation, centroids, residual codebooks, codes) that is FAISS's
    * standard billion-vector shape. Returns (rotation, centroids,
    * books); encode with [[encodeIvfOpq]], query with
    * [[ivfOpqKnnIndexed]]. */
  def trainIvfOpq(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, m: Int = 8, kCodes: Int = 16,
      iters: Int = 10, opqIters: Int = 8
  ): (DataFrame, DataFrame, DataFrame) = {
    // every training stage is internally fixed-seed (the family
    // convention: trainOpqModel / trainIvf / trainIvfPq), so same
    // (corpus, params) -> byte-identical four-table index
    val opq = Similarity.trainOpqModel(corpus, idCol, vecCol, m, kCodes, iters, opqIters)
    val rotated = corpus.select(col(idCol),
      Similarity.rotateFloatUdf(opq.rotation)(col(vecCol)).as(vecCol))
    val centroids = trainIvf(rotated, idCol, vecCol, nCells, iters)
    val books = trainIvfPq(rotated, idCol, vecCol, centroids, m, kCodes, iters)
    (rotationTable(corpus.sparkSession, opq), centroids, books)
  }

  /** Encode the corpus against a stored OPQ+IVF-PQ index: rotate once,
    * then the [[encodeIvfPq]] arithmetic verbatim on the rotated
    * column — `(id, cell, codes)`, m bytes per vector, scan-local.
    * Write `.partitionBy("cell")` so stored probes prune. */
  def encodeIvfOpq(
      corpus: DataFrame, idCol: String, vecCol: String,
      rotation: DataFrame, centroids: DataFrame, codebooks: DataFrame
  ): DataFrame =
    encodeIvfOpqWith(corpus, idCol, vecCol,
      opqModel(rotation, codebooks), ivfModel(centroids))

  /** [[encodeIvfOpq]] over already-LOADED models — for callers that
    * load (and fail-loud validate) the model tables once and reuse
    * them across encode + query instead of re-collecting the same
    * tables and re-running the O(d³) orthogonality check per call. */
  def encodeIvfOpqWith(
      corpus: DataFrame, idCol: String, vecCol: String,
      opq: Similarity.OpqModel, cents: Array[Array[Double]]
  ): DataFrame = {
    val rotated = corpus.select(col(idCol),
      Similarity.rotateFloatUdf(opq.rotation)(col(vecCol)).as(vecCol))
    encodeIvfPqWith(rotated, idCol, vecCol, cents, opq.pq)
  }

  /** Query a STORED OPQ+IVF-PQ index: queries rotate into index space
    * for probing, ADC tables, and coarse dots; the codes scan
    * pre-prunes to the probed cells; the exact rescore runs in the
    * ORIGINAL space (rotation only chooses candidates), so every
    * returned cosine is the exact original-space value. */
  def ivfOpqKnnIndexed(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, rotation: DataFrame, centroids: DataFrame, codebooks: DataFrame,
      codes: DataFrame, nProbe: Int = 3, shortlist: Int = 32
  ): DataFrame =
    ivfOpqKnnIndexedWith(corpus, queries, idCol, vecCol, k,
      opqModel(rotation, codebooks), ivfModel(centroids), codes,
      nProbe, shortlist)

  /** [[ivfOpqKnnIndexed]] over already-LOADED models (same motivation
    * as [[encodeIvfOpqWith]]: one collect + one orthogonality
    * validation per model table, shared across encode and query). */
  def ivfOpqKnnIndexedWith(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, opq: Similarity.OpqModel, cents: Array[Array[Double]],
      codes: DataFrame, nProbe: Int = 3, shortlist: Int = 32
  ): DataFrame = {
    val rq = "__graft_rq"
    require(!queries.columns.contains(rq),
      s"queries already carry a '$rq' column — rename it first")
    val q2 = queries.withColumn(rq,
      Similarity.rotateFloatUdf(opq.rotation)(col(vecCol)))
    val cz = codes
      .filter(col("cell").isin(probedCells(q2, idCol, rq, nProbe, cents): _*))
      .select(col("id").as("neighbor_id"), col("cell"), col("codes"))
    Similarity.ivfPqSearchCore(
      corpus, cz, q2, idCol, vecCol, k, shortlist, nProbe, cents, opq.pq,
      probeVecCol = rq)
  }

  // ============================================================== IVF-SQ8
  /** Encode the corpus against a stored quantizer as SCALAR-QUANTIZED
    * postings `(id, cell, scale, q ARRAY<INT>)` — FAISS `IVF,SQ8`:
    * the [[encodeIvf]] inverted-list layout at a quarter the bytes
    * (int8 codes instead of float vectors; `scale` kept for
    * dequantize-ability, ranking never reads it). Write
    * `.partitionBy("cell")` so stored probes prune to their cells.
    * NULL vectors get NULL cell/codes (the search join drops them). */
  def encodeIvfSq(
      corpus: DataFrame, idCol: String, vecCol: String, centroids: DataFrame
  ): DataFrame =
    Similarity.sqEncode(corpus, idCol, vecCol, ivfModel(centroids))

  /** [[encodeIvfSq]] over an already-LOADED centroid model (one
    * collect, shared across encode and query). */
  def encodeIvfSqWith(
      corpus: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]]
  ): DataFrame =
    Similarity.sqEncode(corpus, idCol, vecCol, cents)

  /** Query a STORED IVF-SQ8 index: identical rows to
    * [[Similarity.ivfSqKnn]] at the same training params — no
    * retrain, the codes scan PRE-PRUNED to the probed cells (the
    * [[ivfKnnIndexed]] discipline). `corpus` supplies the raw
    * vectors for the exact rescore of the int8 shortlist. */
  def ivfSqKnnIndexed(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, centroids: DataFrame, codes: DataFrame,
      nProbe: Int = 3, shortlist: Int = 32
  ): DataFrame =
    ivfSqKnnIndexedWith(corpus, queries, idCol, vecCol, k,
      ivfModel(centroids), codes, nProbe, shortlist)

  /** [[ivfSqKnnIndexed]] over an already-LOADED centroid model (one
    * collect, shared across encode and query). */
  def ivfSqKnnIndexedWith(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, cents: Array[Array[Double]], codes: DataFrame,
      nProbe: Int = 3, shortlist: Int = 32
  ): DataFrame = {
    val cz = codes
      .filter(col("cell").isin(probedCells(queries, idCol, vecCol, nProbe, cents): _*))
      .select(col("id").as("neighbor_id"), col("cell"), col("q"))
    Similarity.ivfSqSearchCore(
      corpus, cz, queries, idCol, vecCol, k, shortlist, nProbe, cents)
  }

  // ============================================================== IVF-PQ
  /** Train the residual PQ codebooks of a composed IVF-PQ index
    * against a stored centroids table ([[trainIvf]]'s output) and
    * return them as a table — the [[trainPq]] shape
    * `(subspace INT, code INT, dim INT, centroid ARRAY<DOUBLE>)`, but
    * trained on per-cell RESIDUALS `u - c(cell)` (FAISS `IndexIVFPQ`:
    * residuals are smaller and more isotropic, so the same code
    * budget quantizes finer than plain PQ). The full stored index is
    * three tables: centroids, these codebooks, and [[encodeIvfPq]]'s
    * codes partitioned by `cell`. */
  def trainIvfPq(
      corpus: DataFrame, idCol: String, vecCol: String, centroids: DataFrame,
      m: Int = 8, kCodes: Int = 16, iters: Int = 10
  ): DataFrame =
    trainIvfPqWith(corpus, idCol, vecCol, ivfModel(centroids), m, kCodes, iters)

  /** [[trainIvfPq]] over an already-LOADED centroid model — for callers
    * (the lifecycle's staged build, the stored-index gates) that load
    * the centroids table once and reuse it across train/encode/query
    * instead of paying a fresh driver collect per stage. Same
    * arithmetic, bitwise-identical output. */
  def trainIvfPqWith(
      corpus: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]], m: Int = 8, kCodes: Int = 16, iters: Int = 10
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val model = Similarity.trainIvfPqResidualModel(
      corpus, idCol, vecCol, cents, m, kCodes, iters)
    (for {
      j <- 0 until model.m
      c <- 0 until model.kCodes
    } yield (j, c, model.dim, model.codebooks(j)(c).toSeq))
      .toDF("subspace", "code", "dim", "centroid")
  }

  /** Encode the corpus against a stored IVF-PQ index: the codes table
    * `(id, cell, codes ARRAY<INT>)` — m bytes of payload per vector,
    * scan-local (both models ride the UDF closures). Write
    * `.partitionBy("cell")` so stored probes prune to their cells:
    * the search reads `nProbe/nCells` of the index, AND each touched
    * row costs m table lookups instead of a float dot — the composed
    * win neither half delivers alone. NULL vectors get NULL
    * cell/codes (no geometry; the search join drops them). */
  def encodeIvfPq(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, codebooks: DataFrame
  ): DataFrame =
    encodeIvfPqWith(corpus, idCol, vecCol, ivfModel(centroids), pqModel(codebooks))

  /** The cell + residual-codes encode over already-LOADED models —
    * shared by [[encodeIvfPq]] and [[encodeIvfOpq]] (which validates
    * its codebooks once through [[opqModel]] and must not pay a
    * second driver collect of the same table), and public for callers
    * that load the model tables once across encode + query. */
  def encodeIvfPqWith(
      corpus: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]], model: Similarity.PqModel
  ): DataFrame = {
    val assigned = corpus.select(col(idCol).as("id"), col(vecCol).as("cv"),
      Similarity.ivfAssignUdf(cents)(col(vecCol)).as("cell"))
    assigned.select(col("id"), col("cell"),
      Similarity.ivfPqCodesUdf(cents, model)(
        col("id").cast("string"), col("cv"), col("cell")).as("codes"))
  }

  /** Query a STORED IVF-PQ index: identical rows to
    * [[Similarity.ivfPqKnn]] at the same training params — no
    * retrain, and the codes scan is PRE-PRUNED to the probed cells
    * (the [[ivfKnnIndexed]] discipline: the distinct probed-cell set
    * is bounded by the cell count, collects driver-side, and becomes
    * an IN filter on the partition column — partition pruning pinned
    * in PlanSpec). `corpus` supplies the raw vectors for the exact
    * rescore only. */
  def ivfPqKnnIndexed(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, centroids: DataFrame, codebooks: DataFrame, codes: DataFrame,
      nProbe: Int = 3, shortlist: Int = 32
  ): DataFrame =
    ivfPqKnnIndexedWith(corpus, queries, idCol, vecCol, k,
      ivfModel(centroids), pqModel(codebooks), codes, nProbe, shortlist)

  /** [[ivfPqKnnIndexed]] over already-LOADED models (one collect per
    * model table, shared across encode and query). */
  def ivfPqKnnIndexedWith(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, cents: Array[Array[Double]], model: Similarity.PqModel,
      codes: DataFrame, nProbe: Int = 3, shortlist: Int = 32
  ): DataFrame = {
    val cz = codes
      .filter(col("cell").isin(probedCells(queries, idCol, vecCol, nProbe, cents): _*))
      .select(col("id").as("neighbor_id"), col("cell"), col("codes"))
    Similarity.ivfPqSearchCore(
      corpus, cz, queries, idCol, vecCol, k, shortlist, nProbe, cents, model)
  }
}
