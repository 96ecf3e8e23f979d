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

  /** Write the Megatron-LM indexed-dataset `.idx` companion per shard
    * (the public `MMapIndexedDataset.Index` layout Megatron's data
    * loader mmaps, making `tokens.bin` + `tokens.idx` a directly
    * trainable pair with no manifest join):
    *
    *   magic `MMIDIDX\0\0` (9 bytes) · version int64 LE = 1 ·
    *   dtype code uint8 (4 = int32) · sequence count int64 ·
    *   doc-index length int64 · sizes int32[count] (tokens per
    *   sequence, shard `pos` order) · pointers int64[count] (BYTE
    *   offsets into tokens.bin) · doc_idx int64[count+1] = 0..count
    *   (each document one sequence — the loader's trivial mapping).
    *
    * Input needs `shard`/`pos`/`n_tokens`; same one-task-per-shard
    * write shape as [[writeShards]], attempt-unique temp + rename. */
  def writeIdx(manifest: DataFrame, dir: String, nShards: Int): Unit = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val targetDir = dir
    manifest.select(col("shard").cast("int"), col("pos").cast("long"),
        col("n_tokens").cast("long"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .foreachPartition { (it: Iterator[Row]) =>
        val conf = new Configuration()
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val groups = it.toSeq.groupBy(_.getInt(0)) // shards per task: few
        groups.toSeq.sortBy(_._1).foreach { case (shard, rows) =>
          val sizes = rows.map(_.getLong(2))
          sizes.foreach(s => require(s >= 0 && s <= Int.MaxValue,
            s"shard $shard: sequence size $s outside int32"))
          val count = sizes.length
          val dst = new Path(s"$targetDir/shard=$shard/tokens.idx")
          val tmp = new Path(s"$targetDir/shard=$shard/.tokens.idx.attempt-$attempt")
          val fs  = dst.getFileSystem(conf)
          val out = new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16)
          try {
            val head = ByteBuffer.allocate(9 + 8 + 1 + 8 + 8)
              .order(ByteOrder.LITTLE_ENDIAN)
            head.put("MMIDIDX".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
            head.putLong(1L).put(4.toByte) // version 1, dtype 4 = int32
            head.putLong(count.toLong).putLong(count.toLong + 1)
            out.write(head.array())
            val b4 = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
            sizes.foreach { s => b4.clear(); b4.putInt(s.toInt); out.write(b4.array, 0, 4) }
            val b8 = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
            var ptr = 0L
            sizes.foreach { s =>
              b8.clear(); b8.putLong(ptr); out.write(b8.array, 0, 8)
              ptr += s * 4L
            }
            (0L to count.toLong).foreach { i =>
              b8.clear(); b8.putLong(i); out.write(b8.array, 0, 8)
            }
          } finally out.close()
          if (fs.exists(dst)) fs.delete(dst, false)
          require(fs.rename(tmp, dst),
            s"TokenBinary.writeIdx: rename $tmp -> $dst failed")
        }
      }
  }

  /** Parse one shard's `.idx` back — the spec/consumer helper:
    * (sizes, pointers, doc_idx), with the magic/version/dtype header
    * verified fail-loud. */
  def readIdx(path: String): (Array[Int], Array[Long], Array[Long]) = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue, s"$path: too large for the test reader")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](9); bb.get(magic)
    require(new String(magic.take(7), "US-ASCII") == "MMIDIDX" &&
      magic(7) == 0 && magic(8) == 0, s"$path: bad magic")
    require(bb.getLong() == 1L, s"$path: unsupported version")
    require(bb.get() == 4.toByte, s"$path: dtype is not int32")
    val count = bb.getLong().toInt
    val docLen = bb.getLong().toInt
    val sizes = Array.fill(count)(bb.getInt())
    val pointers = Array.fill(count)(bb.getLong())
    val docIdx = Array.fill(docLen)(bb.getLong())
    (sizes, pointers, docIdx)
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
