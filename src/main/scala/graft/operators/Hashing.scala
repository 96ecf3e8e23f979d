package graft.operators

/** Shared compiled hash primitives for the dedup/similarity UDFs. */
private[operators] object Hashing {

  /** splitmix64 finalizer. */
  @inline def mix64(x0: Long): Long = {
    var x = x0 * 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** FNV-1a 64 over a token window joined by single spaces — hashes the
    * shingle without building the shingle string. */
  @inline def fnvShingle(w: Seq[String], start: Int, n: Int): Long = {
    var h = 0xCBF29CE484222325L
    var t = 0
    while (t < n) {
      if (t > 0) { h ^= ' '.toLong; h *= 0x100000001B3L }
      val s = w(start + t)
      var c = 0
      while (c < s.length) { h ^= s.charAt(c).toLong; h *= 0x100000001B3L; c += 1 }
      t += 1
    }
    h
  }
}
