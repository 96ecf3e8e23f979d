package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Packing

/** packSequences invariants over RANDOM corpora (shards, doc counts,
  * token counts incl. empty docs, sequence lengths): per shard the
  * sequences reassemble the exact pos-ordered token stream, ids are
  * dense from 0, every non-final sequence is exactly seqTokens long,
  * the final one is non-empty, and declared lengths match content.
  * The unit test pins hand-checked boundaries; this pins the cut
  * arithmetic across the input space. */
class PackingPropertySpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: random corpora reassemble exactly") {
    val corpusGen = for {
      nDocs <- Gen.choose(1, 14)
      docs <- Gen.listOfN(nDocs, for {
        sh <- Gen.choose(0, 2)
        n  <- Gen.frequency(1 -> Gen.const(0), 5 -> Gen.choose(1, 23))
      } yield (sh, n))
      l <- Gen.choose(1, 12)
    } yield (docs, l)
    val prop = Prop.forAll(corpusGen) { case (docs, l) =>
      val rows = docs.zipWithIndex.map { case ((sh, n), i) =>
        (sh, i.toLong, (0 until n).map(j => s"t${i}_$j"))
      }
      val got = Packing
        .packSequences(rows.toDF("shard", "pos", "toks"), "shard", "pos", "toks", l.toLong)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[String](2), r.getInt(3), r.getInt(4)))
      val byShard = got.groupBy(_._1)
      val wantStreams = rows.groupBy(_._1)
        .map { case (sh, rs) => sh -> rs.sortBy(_._2).flatMap(_._3) }
      val perShard = wantStreams.forall { case (sh, want) =>
        if (want.isEmpty) !byShard.contains(sh)
        else byShard.get(sh).exists { seqsUnsorted =>
          val seqs = seqsUnsorted.sortBy(_._2)
          val dense  = seqs.map(_._2).toSeq == (0L until seqs.length).toSeq
          val flat   = seqs.flatMap(_._3).toSeq == want
          val lens   = seqs.init.forall(_._4 == l) &&
            seqs.last._4 <= l && seqs.last._4 > 0
          val counts = seqs.forall(s => s._3.length == s._4 && s._5 >= 1)
          dense && flat && lens && counts
        }
      }
      perShard &&
        byShard.keySet.subsetOf(wantStreams.filter(_._2.nonEmpty).keySet)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.toString)
  }
}
