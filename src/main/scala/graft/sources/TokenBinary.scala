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
        var cur: Int = Int.MinValue
        var out: java.io.OutputStream = null
        def closeCurrent(): Unit = if (out != null) { out.close(); out = null }
        try {
          it.foreach { row =>
            val shard = row.getInt(0)
            if (out == null || shard != cur) {
              closeCurrent()
              cur = shard
              val p = new Path(s"$targetDir/shard=$shard/tokens.bin")
              out = new java.io.BufferedOutputStream(
                p.getFileSystem(conf).create(p, true), 1 << 16)
            }
            val ids = row.getSeq[Int](2)
            ids.foreach { id =>
              buf.clear(); buf.putInt(id)
              out.write(buf.array, 0, 4)
            }
          }
        } finally closeCurrent()
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
