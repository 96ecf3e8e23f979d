package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** Shared filesystem scaffolding for the persistent maintenance
  * stores: sidecar table-property markers and the crash-safe
  * compaction swap. Extracted so a protocol fix lands ONCE — seven
  * stores share the batch-owned-partition design and had started to
  * accumulate byte-identical private copies of this plumbing.
  */
private[graft] object StoreFiles {

  /** Write the sidecar `name` under `path` with exact `payload` bytes
    * (creating the directory first — the empty-bootstrap case).
    * ATOMIC: the payload lands in a sibling temp file and is renamed
    * into place, so a crash mid-write can never leave a TRUNCATED
    * marker whose prefix still parses (the failure mode for multi-line
    * payloads like pinned centroid lists — a short read there would
    * silently change store geometry). */
  def writeMarker(path: String, name: String, payload: String): Unit = {
    Files.createDirectories(Paths.get(path))
    val tmp = Paths.get(path, name + ".__tmp")
    Files.write(tmp, payload.getBytes(StandardCharsets.UTF_8))
    try
      Files.move(tmp, Paths.get(path, name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        // non-POSIX fallback: still a whole-file rename, just not
        // guaranteed atomic by the filesystem
        Files.move(tmp, Paths.get(path, name),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Read the sidecar exactly (NO trim — payloads like a newline
    * delimiter are whitespace); fail loud when missing. */
  def readMarker(path: String, name: String, initHint: String): String = {
    val p = Paths.get(path, name)
    require(Files.exists(p), s"$path has no $name marker — $initHint")
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
  }

  /** The two-rename compaction swap: `build` writes the compacted
    * store (data THEN marker) into a sibling temp dir, which replaces
    * `path` via two renames. Before the first rename the original
    * store is untouched; between them there is no directory at `path`
    * (readers fail loud on the missing marker) while the COMPLETE
    * pre-compaction store sits at `<path>.__compact_old` for manual
    * restore; stale temp/old directories from a crash are cleaned on
    * the next call. */
  def swapCompacted(path: String)(build: String => Unit): Unit = {
    val tmp = Paths.get(path + ".__compact_tmp")
    val old = Paths.get(path + ".__compact_old")
    deleteRecursively(tmp)
    deleteRecursively(old)
    build(tmp.toString)
    Files.move(Paths.get(path), old)
    Files.move(tmp, Paths.get(path))
    deleteRecursively(old)
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }
}
