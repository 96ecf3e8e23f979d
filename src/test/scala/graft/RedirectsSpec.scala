package graft

import graft.operators.Redirects

/** Redirect-chain collapse: pointer-doubling exactness at the depth
  * boundary, cycles and chains-into-cycles, duplicate-source guard,
  * null-edge tolerance. */
class RedirectsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], maxDepth: Int = 32) =
    Redirects.resolve(edges.toDF("src", "dst"), "src", "dst", maxDepth)
      .collect()
      .map(r => r.getString(0) -> ((Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3))))
      .toMap

  test("chains collapse to the terminal with exact hop counts") {
    val got = run(Seq("a" -> "b", "b" -> "c", "c" -> "d", "e" -> "d"))
    assert(got("a") === ((Some("d"), Some(3L), true)))
    assert(got("b") === ((Some("d"), Some(2L), true)))
    assert(got("c") === ((Some("d"), Some(1L), true)))
    assert(got("e") === ((Some("d"), Some(1L), true)))
  }

  test("depth boundary: a maxDepth-long chain resolves; one hop more does not") {
    // chain n0 -> n1 -> ... -> n8 (8 hops from n0)
    val chain = (0 until 8).map(i => s"n$i" -> s"n${i + 1}")
    val at = run(chain, maxDepth = 8)
    assert(at("n0") === ((Some("n8"), Some(8L), true)))
    val under = run(chain, maxDepth = 7)
    assert(under("n0") === ((None, None, false))) // too deep: unresolved
    assert(under("n1") === ((Some("n8"), Some(7L), true)))
  }

  test("cycles, self-loops, and chains INTO cycles are unresolved") {
    val got = run(Seq("x" -> "y", "y" -> "x", "z" -> "z", "a" -> "x"))
    Seq("x", "y", "z", "a").foreach { s =>
      assert(got(s) === ((None, None, false)), s)
    }
  }

  test("null edges drop; a duplicate source raises in-plan") {
    val got = run(Seq("a" -> "b", (null: String) -> "q", "r" -> null))
    assert(got.keySet === Set("a"))
    val e = intercept[Exception] {
      run(Seq("a" -> "b", "a" -> "c"))
    }
    assert(e.getMessage.contains("more than one target"))
  }
}
