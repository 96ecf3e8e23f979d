package graft.exec

import org.apache.spark.sql.SparkSession

/** The outDir mutation conventions shared by the warehouse [[Runner]]
  * and the curation [[graft.pipeline.CurationPipeline]]: a
  * single-writer lease per output directory, and atomic whole-table
  * promotion of staged writes.
  *
  * Writers take an outDir-wide lease (`_graft_writer.lock`, atomic
  * create-if-absent); a second concurrent writer fails loudly instead
  * of corrupting the first one's run, and a crashed writer's stale
  * lease is stolen after an hour. Readers never take the lease — every
  * rewrite promotes via whole-directory rename (move-aside → move-in →
  * delete-old), so live tables stay readable throughout.
  */
private[graft] object Staging {

  def withWriterLease[T](spark: SparkSession, outDir: String)(body: => T): T = {
    import org.apache.hadoop.fs.Path
    val root = new Path(outDir)
    val fs   = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val lock    = new Path(root, "_graft_writer.lock")
    val leaseMs = 60L * 60 * 1000
    val stale = fs.exists(lock) &&
      System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime > leaseMs
    if (stale) fs.delete(lock, false)
    val out =
      try fs.create(lock, false)
      catch {
        case e: java.io.IOException =>
          throw new IllegalStateException(
            s"another pipeline is writing derived tables under $outDir (writer lease $lock " +
              s"held; stolen after ${leaseMs / 1000}s if its owner crashed) — outDirs are " +
              "single-writer; concurrent readers are always safe", e)
      }
    try {
      out.write(java.lang.Long.toString(System.currentTimeMillis())
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
      body
    } finally fs.delete(lock, false)
  }

  /** Promote `<table><suffix>` over `<table>`. Crash-safety: before the
    * first rename the live table is untouched; between the renames the
    * complete old table sits at `<table><suffix>__old` (deleted only
    * after the staged table has moved in). */
  def promoteStaged(spark: SparkSession, outDir: String, t: String, suffix: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(outDir)
    val fs   = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def renameOrFail(src: Path, dst: Path): Unit =
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"promoteStaged: rename $src -> $dst failed")
    val live    = new Path(root, t)
    val staging = new Path(root, t + suffix)
    if (fs.exists(staging)) {
      val old = new Path(root, t + suffix + "__old")
      if (fs.exists(old)) fs.delete(old, true)
      val hadLive = fs.exists(live)
      if (hadLive) renameOrFail(live, old)
      renameOrFail(staging, live)
      if (hadLive) fs.delete(old, true)
    }
  }
}
