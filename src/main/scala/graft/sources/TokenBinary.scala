package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Flat binary token shards — the artifact a trainer memory-maps
  * (the public Megatron-LM indexed-dataset shape): per shard, ONE
  * `tokens.bin` holding the shard's documents in `pos` order, each
  * document its token ids as little-endian int32, concatenated with
  * no separators. Document boundaries live in the export's manifest
  * as `(token_offset, n_tokens)` — a trainer slices the mmap, it
  * never parses.
  *
  * Executors write through the Hadoop FileSystem API, so `file://`
  * and `hdfs://` destinations behave the same; one write task per
  * shard (hash co-location of two shards in one task is fine — the
  * writer switches files on the shard boundary and the
  * sort-within-partitions keeps each shard contiguous).
  */
object TokenBinary {

  /** Write per-shard token binaries under `dir`. Input must carry
    * `shard` (int-castable), `pos` (long-castable), and `idsCol`
    * (array<int>). */
  def writeShards(df: DataFrame, idsCol: String, dir: String, nShards: Int): Unit = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val targetDir = dir
    df.select(col("shard").cast("int"), col("pos").cast("long"), col(idsCol))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .foreachPartition { (it: Iterator[Row]) =>
        val conf = new Configuration()
        val buf = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        // attempt-unique temp + rename-into-place on shard completion:
        // a speculative or zombie duplicate attempt writing the FINAL
        // path directly could interleave bytes with the winning
        // attempt's stream (create(…, true) truncates, it does not
        // lock). Each attempt streams to its own temp file, so
        // concurrent attempts never share an output stream; whichever
        // rename lands last wins with a COMPLETE file (the input is
        // deterministic, so duplicate attempts carry identical bytes).
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        var cur: Int = Int.MinValue
        var out: java.io.OutputStream = null
        var tmp: Path = null
        var dst: Path = null
        def closeCurrent(commit: Boolean): Unit = if (out != null) {
          out.close(); out = null
          val fs = dst.getFileSystem(conf)
          if (commit) {
            if (fs.exists(dst)) fs.delete(dst, false)
            require(fs.rename(tmp, dst),
              s"TokenBinary.writeShards: rename $tmp -> $dst failed")
          } else fs.delete(tmp, false)
        }
        try {
          it.foreach { row =>
            val shard = row.getInt(0)
            if (out == null || shard != cur) {
              closeCurrent(commit = true)
              cur = shard
              dst = new Path(s"$targetDir/shard=$shard/tokens.bin")
              tmp = new Path(s"$targetDir/shard=$shard/.tokens.bin.attempt-$attempt")
              out = new java.io.BufferedOutputStream(
                tmp.getFileSystem(conf).create(tmp, true), 1 << 16)
            }
            val ids = row.getSeq[Int](2)
            ids.foreach { id =>
              buf.clear(); buf.putInt(id)
              out.write(buf.array, 0, 4)
            }
          }
          closeCurrent(commit = true)
        } finally closeCurrent(commit = false)
      }
  }

  /** Read one shard's token stream back — the spec/consumer helper
    * (a trainer would mmap instead). */
  def readShard(path: String): Array[Int] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val len = fs.getFileStatus(p).getLen
    require(len % 4 == 0, s"$path: length $len is not a multiple of 4")
    require(len <= Int.MaxValue, s"$path: too large for the test reader")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill((len / 4).toInt)(bb.getInt())
  }
}
