package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{Env, TableConstraint}

/** Bucketed managed-table writes (the D3 `bucketBy` path, SURVEY §2.9):
  * co-locating two tables on their join key lets repeated joins run
  * shuffle-free — at 100 TB the dominant cost of a fact-to-fact or
  * fact-to-bigdim join is the exchange, and bucketing pays it once at
  * write time instead of per query.
  */
object Bucketing {

  /** Write `df` as a managed bucketed table (sorted within buckets for
    * merge-friendly reads). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int
  ): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Bucket keys for every source table participating in a parent-fact
    * join ([[FactPopulate]]'s F5 LEFT OUTER joins): each child fact
    * source keyed by its FK columns, each parent source keyed by the
    * referenced columns. A table pulled into several joins keeps the
    * first key set (one physical layout per table). */
  def parentJoinKeys(env: Env): Map[String, Seq[String]] = {
    import graft.derive.Extractor
    val keyed = for {
      fact    <- env.facts
      fTable  <- env.findTable(fact.tableName).toSeq
      parent  <- Extractor.extractAllDimensionTables(env, fact)
                   .map(_._1.tableName).distinct.filter(_ != fact.tableName)
      fkPairs <- fTable.constraints.collectFirst {
                   case TableConstraint.ForeignKey(t, ps) if t == parent => ps
                 }.toSeq
      entry   <- Seq(fact.tableName -> fkPairs.map(_._1), parent -> fkPairs.map(_._2))
    } yield entry
    keyed.groupBy(_._1).map { case (t, ks) => t -> ks.head._2 }
  }

  /** One-time ingest-side preparation: write every parent-join source
    * as an EXTERNAL bucketed table on its join keys (same bucket count
    * on both sides -> co-located). Returns source name -> bucketed
    * table name; [[Runner.readSource]] prefers these, after which the
    * large-large parent SMJ plans with NO exchange on either side —
    * the shuffle is paid once here and amortizes across refreshes:
    *
    *  - data lives under `<dataDir>/<table>` (NOT the session
    *    warehouse), so two pipelines with different output dirs never
    *    clobber each other's buckets;
    *  - catalog names carry a hash of `dataDir` for the same reason;
    *  - if the bucketed data already exists on disk (a previous run,
    *    possibly a previous SESSION), it is re-registered instead of
    *    rewritten — the ingest shuffle is genuinely paid once.
    */
  def writeBucketedSources(
      spark: SparkSession,
      env: Env,
      readSource: String => DataFrame,
      numBuckets: Int,
      dataDir: String
  ): Map[String, String] = {
    val scope = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dataDir).toLong & 0xFFFFFFFFL)
    parentJoinKeys(env).map { case (table, keys) =>
      val name = s"bkt_${table}_$scope"
      val path = new org.apache.hadoop.fs.Path(dataDir, table)
      val fs   = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (spark.catalog.tableExists(name)) {
        // same-session rerun: buckets already written and registered
      } else if (fs.exists(path)) {
        // cross-session reuse: data on disk, catalog (in-memory) forgot
        // it — re-register the external bucketed table over the path
        val schemaDdl = readSource(table).schema.toDDL
        spark.sql(
          s"""CREATE TABLE $name ($schemaDdl) USING PARQUET
             |CLUSTERED BY (${keys.mkString(", ")})
             |SORTED BY (${keys.mkString(", ")})
             |INTO $numBuckets BUCKETS
             |LOCATION '$path'""".stripMargin)
      } else {
        readSource(table).write
          .mode("overwrite")
          .bucketBy(numBuckets, keys.head, keys.tail: _*)
          .sortBy(keys.head, keys.tail: _*)
          .option("path", path.toString)
          .format("parquet")
          .saveAsTable(name)
      }
      table -> name
    }
  }

  /** Join two same-bucketed tables on the bucket column — planner emits
    * a sort-merge join with NO exchange on either side. */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String,
      joinType: String = "inner"
  ): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
