package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench honesty flag (`load_distorted`) against replays of the
  * real driver records: the r10 false negative must trip, the clean
  * close records must not. */
class BenchFlagSpec extends AnyFunSuite {

  private def flag(
      prelaunch: String = "", jvmStart: String = "", start: String = "",
      end: String = "", med: Double = 100.0, min: Double = 100.0): Boolean =
    Bench.distortedFlag(prelaunch, jvmStart, start, end,
      cpus = 32.0, totalMed = med, totalMin = min)

  test("the r10 driver record's exact readings now trip the flag") {
    // BENCH_r10.json: jvm-start 1.74 (under cpus/16 = 2 — the old,
    // ONLY trigger stayed false), loadavg_end 3.46, median 170.0 vs
    // min 98.2 — a 1.73x divergence from mid-run contention
    assert(flag(jvmStart = "1.74 1.64 1.50", start = "1.92 1.68 1.51",
      end = "3.46 4.05 2.78", med = 170.043, min = 98.161))
  }

  test("the r10 clean close record stays unflagged") {
    // committed clean record: prelaunch 0.09, end 2.82 (the bench's
    // own ~2.8 tail load), median 89.2 vs min 83.8 (1.06x)
    assert(!flag(prelaunch = "0.09 0.46 1.41", jvmStart = "0.17 0.47 1.41",
      start = "0.84 0.60 1.44", end = "2.82 2.14 1.93",
      med = 89.153, min = 83.838))
  }

  test("each trigger fires alone: pre-run ambient, heavy end load, med/min divergence") {
    assert(flag(prelaunch = "2.5 0.1 0.1"))              // start > cpus/16
    assert(flag(end = "9.0 3.0 2.0"))                    // end > cpus/4
    assert(flag(med = 130.0, min = 100.0))               // 1.3x divergence
    assert(!flag(prelaunch = "1.9 0.1 0.1", end = "7.9 3.0 2.0",
      med = 124.0, min = 100.0))                         // all under threshold
  }

  test("prelaunch reading outranks jvm-start outranks start; junk readings never flag") {
    // prelaunch clean beats a distorted-looking jvm-start (the bench's
    // own sbt/compile load must not self-flag)
    assert(!flag(prelaunch = "0.1 0.1 0.1", jvmStart = "5.0 4.0 3.0"))
    // no prelaunch: jvm-start governs
    assert(flag(jvmStart = "5.0 4.0 3.0"))
    // unparseable/empty readings are not evidence
    assert(!flag(prelaunch = "n/a", end = "junk"))
    assert(!flag(med = 10.0, min = 0.0)) // failed-run sentinel: no divergence claim
  }

  test("fourth trigger: GC pressure flags alone even when all loadavg triggers are quiet") {
    // the r12 driver regime: 1,530 CPU-s vs the builder's 1,087 on
    // identical code — GC/memory pressure, invisible to loadavg and to
    // med/min divergence (both inflate together). gc_frac is the signal.
    def gflag(g: Double) = Bench.distortedFlag(
      prelaunch = "0.1 0.1 0.1", jvmStart = "", start = "", end = "1.0 1.0 1.0",
      cpus = 32.0, totalMed = 100.0, totalMin = 98.0, gcFrac = g)
    assert(gflag(0.25))
    assert(gflag(Bench.GcFracThreshold + 1e-6))
    assert(!gflag(Bench.GcFracThreshold))
    assert(!gflag(0.03)) // healthy clean-run regime (~1-3% measured)
  }

  test("failuresJson: a synthetic failure marks the record partial with name + message") {
    val j = Bench.failuresJson(Seq("q_bad" -> "IllegalStateException: boom \"quoted\""))
    assert(j.contains("\"partial\":true"))
    assert(j.contains("\"queries_failed\":1"))
    assert(j.contains("\"failed_names\":[\"q_bad\"]"))
    assert(j.contains("\"first_failure\":\"q_bad: IllegalStateException: boom \\\"quoted\\\"\""))
    val clean = Bench.failuresJson(Nil)
    assert(clean.contains("\"partial\":false"))
    assert(clean.contains("\"queries_failed\":0"))
    assert(clean.contains("\"failed_names\":[]"))
  }

  test("measureSuite: a crashing query yields sentinel timings + captured message; survivors still time") {
    val suite: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "ok_query"   -> ((s, _) => s.range(10).toDF("id")),
      "boom_query" -> ((_, _) => throw new IllegalStateException("synthetic bench failure")),
      "ok_after"   -> ((s, _) => s.range(5).toDF("id"))
    )
    val (results, failures) = Bench.measureSuite(SparkSpec.session, "", suite, reps = 1)
    assert(results.map(_._1) == Seq("ok_query", "boom_query", "ok_after"))
    val byName = results.toMap
    assert(byName("ok_query").wallMed >= 0 && byName("ok_after").wallMed >= 0)
    assert(byName("boom_query") == Bench.FailedTiming)
    assert(failures == Seq("boom_query" -> "IllegalStateException: synthetic bench failure"))
    // the totals rule: sentinels are excluded, success count is 2 of 3
    assert(results.count(_._2.wallMed >= 0) == 2)
  }

  test("distortedRows: per-row med/min divergence lists the inflated entries only") {
    def t(med: Double, min: Double) = Bench.Timing(med, min, -1, -1, 0)
    val rows = Seq(
      "clean"      -> t(1.00, 0.95),  // healthy agreement
      "inflated"   -> t(4.15, 0.93),  // the r13 text_dup_spans shape
      "tiny_noise" -> t(0.10, 0.03),  // under the 0.2s floor — noise, not signal
      "failed"     -> Bench.FailedTiming) // sentinels never flag
    assert(Bench.distortedRows(rows) === Seq("inflated"))
  }

  test("waitForIdle: already-idle waits zero; a decaying load waits it out; a stuck load exhausts the budget honestly") {
    var slept = 0L
    val sleep: Long => Unit = ms => slept += ms
    // already idle: no sleep at all, reports reached
    assert(Bench.waitForIdle(2.0, 60000L, 5000L, () => Some(0.5), sleep) === ((0.0, true)))
    assert(slept === 0L)
    // AT the threshold counts as idle — distortedFlag trips on
    // strictly-greater, and the wait must mirror it exactly (a
    // loadavg pinned at cpus/16 must not burn the budget for a
    // reading the flag would never veto)
    assert(Bench.waitForIdle(2.0, 60000L, 5000L, () => Some(2.0), sleep) === ((0.0, true)))
    assert(slept === 0L)
    // decays under the threshold on the third reading: two sleeps
    val readings = Iterator(5.0, 3.0, 1.5)
    val (w1, ok1) = Bench.waitForIdle(2.0, 60000L, 5000L, () => Some(readings.next()), sleep)
    assert(ok1 && w1 === 10.0 && slept === 10000L)
    // never decays: the full budget is consumed and reached=false —
    // the record then says "still loaded after Ns", not a false clean
    slept = 0L
    val (w2, ok2) = Bench.waitForIdle(2.0, 12000L, 5000L, () => Some(9.9), sleep)
    assert(!ok2 && w2 === 12.0 && slept === 12000L)
    // unreadable loadavg (non-Linux) degrades to idle, zero budget spent
    assert(Bench.waitForIdle(2.0, 60000L, 5000L, () => None, sleep)._2)
  }

  test("the bench suite covers every SparkEntry gate except the documented exclusions (a new gate can never be silently unbenched)") {
    val names = Bench.suite.map(_._1)
    assert(names.distinct.size === names.size, "duplicate suite entries")
    val missing = SparkEntry.queries.keySet -- names.toSet
    assert(missing === Bench.benchExcluded,
      s"gates missing from the bench suite beyond the documented exclusions: " +
        s"${missing -- Bench.benchExcluded}")
    // exclusions must name real gates (a stale entry is a silent hole)
    assert((Bench.benchExcluded -- SparkEntry.queries.keySet).isEmpty)
  }
}
