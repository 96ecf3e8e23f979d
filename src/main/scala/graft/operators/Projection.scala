package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DotProduct

/** Random projection (Johnson–Lindenstrauss) dimensionality reduction
  * for embedding columns, with a DETERMINISTIC Rademacher (±1) matrix
  * derived from md5 — no RNG state to ship, and any engine (or the
  * DuckDB oracle) can regenerate the exact matrix from (d, r) alone.
  *
  * proj_j = (Σ_i v_i · sign(j,i)) / √r, sign(j,i) = +1 iff the md5 MSB
  * of the string "j_i" is 0 (j = 1-based output dim, i = 1-based input
  * dim). ±1 entries with the 1/√r scale satisfy the JL guarantee the
  * same as Gaussian entries [Achlioptas, JCSS 2003, "Database-friendly
  * random projections"] while keeping the hot loop multiplication-free
  * in spirit and — more importantly here — bit-reproducible.
  *
  * Scale shape: the matrix is r·d driver-side doubles (tiny; 64→8 is
  * 512 values) embedded as literals, and the projection is r codegen'd
  * [[graft.functions.DotProduct]] evaluations per row — scan-local,
  * zero shuffle, no UDF. A 100 TB embedding store shrinks by d/r
  * before any downstream shuffle (ANN, clustering, near-dup) touches
  * it; pair with [[Quantize.int8]] for another 4×.
  */
object Projection {

  /** +1.0 when the md5 MSB of "j_i" is zero (first hex digit 0–7),
    * else −1.0 — exactly reproducible in SQL as
    * `substr(md5(j || '_' || i), 1, 1)` ∈ '01234567'. */
  def rademacherSign(j: Int, i: Int): Double = {
    val md  = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${j}_$i".getBytes("UTF-8"))
    if (((hex(0) >> 4) & 0x8) == 0) 1.0 else -1.0
  }

  /** The r×d sign matrix, row j-1 = output dimension j (1-based). */
  def signRows(d: Int, r: Int): Seq[Array[Double]] =
    (1 to r).map(j => Array.tabulate(d)(i0 => rademacherSign(j, i0 + 1)))

  /** Project `vecCol` (array<float|double>, length d) down to an
    * `array<double>` of length r named `proj`. Null vectors project to
    * null. */
  def randomProject(
      emb: DataFrame, idCol: String, vecCol: String, d: Int, r: Int): DataFrame = {
    require(r > 0 && d > 0, s"need positive dims, got d=$d r=$r")
    val vec   = col(vecCol)
    val scale = math.sqrt(r.toDouble)
    // divide by √r AFTER the dot — the same association the oracle uses,
    // so the only double-vs-exact divergence is the dot accumulation
    val projs: Seq[Column] = signRows(d, r).map { row =>
      DotProduct(vec, lit(row)) / lit(scale)
    }
    emb.select(col(idCol),
      when(vec.isNotNull, array(projs: _*)).as("proj"))
  }
}
