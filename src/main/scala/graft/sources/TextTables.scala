package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Ingestion readers for the text formats corpora actually arrive in —
  * newline-delimited JSON (web-scrape dumps, API exports) and CSV —
  * hardened the way a 100 TB load needs:
  *
  *  - the schema is always EXPLICIT: `inferSchema`/sampled inference is
  *    an extra pass over the input and a silent drift hazard (a batch
  *    whose sampled rows happen to all-null a column changes its type);
  *  - corrupt records are a first-class outcome, not an exception five
  *    hours into a job: `permissive = true` (default) captures each
  *    undecodable line intact in `_corrupt_record` for quarantine +
  *    audit (count them, route them to a dead-letter table, keep
  *    loading), `permissive = false` fails the job on the first one
  *    (FAILFAST — the validation-run mode);
  *  - multiline is OFF: one record per line keeps the input splittable
  *    (a multiline JSON file cannot be read in parallel).
  *
  * Scale: both readers are plain splittable file scans — predicate
  * pushdown does not apply to text formats, so land long-lived tables
  * as parquet ([[ParquetTables]]) after ONE pass through these.
  */
object TextTables {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already declares $CorruptCol — it is reader-managed")
    StructType(schema.fields :+ StructField(CorruptCol, StringType))
  }

  /** Read newline-delimited JSON at `path` with the declared schema.
    * With `permissive` the result carries `_corrupt_record` (null on
    * good rows; the raw line on undecodable ones — filter on it to
    * split load from quarantine); otherwise the first bad line fails
    * the read. */
  def readJsonl(
      spark: SparkSession, path: String, schema: StructType,
      permissive: Boolean = true
  ): DataFrame =
    if (permissive)
      spark.read
        .schema(withCorrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .json(path)
    else
      spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Read CSV at `path` with the declared schema. `header` skips the
    * first line of every file; quoting/escaping is RFC-4180-style
    * (embedded delimiters and quotes round-trip). Same corrupt-record
    * contract as [[readJsonl]]. */
  def readCsv(
      spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ",",
      permissive: Boolean = true
  ): DataFrame = {
    val base = spark.read
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("quote", "\"")
      .option("escape", "\"")
    if (permissive)
      base.schema(withCorrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .csv(path)
    else
      base.schema(schema).option("mode", "FAILFAST").csv(path)
  }

  /** Split a permissive read into (clean rows without the corrupt
    * column, quarantined raw lines) — the dead-letter routing step.
    *
    * The parsed frame is persisted (plan-keyed idempotent, the
    * [[graft.operators.Centrality.pageRank]] edge convention): Spark
    * refuses corrupt-column-only queries straight off a text scan
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — its own
    * guidance is to cache the parsed result), and operationally the
    * persist IS the right shape anyway: one pass through the text
    * feeds both the load and the dead-letter write. Unpersist via the
    * clean frame's lineage when the load is done. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    require(df.columns.contains(CorruptCol),
      s"quarantine expects a permissive read carrying $CorruptCol")
    val parsed =
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df
    (parsed.filter(col(CorruptCol).isNull).drop(CorruptCol),
      parsed.filter(col(CorruptCol).isNotNull).select(col(CorruptCol)))
  }
}
