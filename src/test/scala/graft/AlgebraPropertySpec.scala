package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.operators.{Sampling, Snapshot, Winsorize}

/** Properties of the round-6 maintenance/curation algebra, each checked
  * against an independent in-Scala reference on small random inputs
  * (few cases — every case runs Spark jobs):
  *
  *  - rollup merge: mergeIncremental(rollup(a), rollup(b)) ==
  *    rollup(a ∪ b) for ANY hash split, not just the time split the
  *    gate uses;
  *  - systematic PPS: picks are a pure function of (data, key order) —
  *    partition-count invariant — and total picks == total div step;
  *  - winsorize: output values live exactly in the brute-force
  *    discrete-percentile band, row count preserved;
  *  - snapshot diff: classification matches a map-based reference.
  */
class AlgebraPropertySpec extends SparkSpec {
  import Fixtures._

  private def check(name: String, prop: Prop, n: Int = 4): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  test("property: rollup merge equals full rollup for arbitrary hash splits") {
    val s   = spark
    val ev  = sources.ParquetTables.readTable(s, sf("sf0.001"), "events")
    val fact = eventsEnv.findFact("event").get
    val dim = graft.exec.DimPopulate.full(
      eventsEnv, fact, "dim_event_type", ev, graft.model.TimeWindow.unbounded)
    def rolled(rows: org.apache.spark.sql.DataFrame) =
      graft.exec.Rollup.toCoarser(eventsEnv, fact,
        graft.exec.FactPopulate.populate(
          eventsEnv, fact, graft.model.TimeWindow.unbounded, _ => rows, _ => dim),
        graft.model.TimeUnit.Hour)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      ((r.getLong(r.fieldIndex("ts_hour_id")), r.getLong(r.fieldIndex("user_id")),
        r.getInt(r.fieldIndex("event_type_id"))),
       (r.getInt(r.fieldIndex("event_count")),
        Option(r.getDecimal(r.fieldIndex("value_sum"))).map(_.toString)))
    }.toMap
    val full = keyed(rolled(ev))
    check("merge==full", Prop.forAll(Gen.choose(2, 11)) { mod =>
      // hash split: nothing about hour buckets aligns with it
      val a = ev.filter(pmod(col("event_id"), lit(mod)) === 0)
      val b = ev.filter(pmod(col("event_id"), lit(mod)) =!= 0)
      val merged = graft.exec.Rollup.mergeIncremental(
        eventsEnv, fact, rolled(a), rolled(b), graft.model.TimeUnit.Hour)
      keyed(merged) == full
    }, n = 3)
  }

  test("property: PPS picks are partition-invariant and sum to total div step") {
    val s = spark
    import s.implicits._
    val gen = for {
      n  <- Gen.choose(3, 25)
      ws <- Gen.listOfN(n, Gen.choose(0L, 50L))
      k  <- Gen.choose(1, 5)
      p  <- Gen.choose(1, 8)
    } yield (ws, k, p)
    check("pps", Prop.forAll(gen) { case (ws, k, p) =>
      val total = ws.sum
      (total >= k) ==> {
        val df = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
        def run(parts: Int) = Sampling.weightedSystematic(df, "id", "w", k, parts)
          .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("picks"))).toMap
        val one = run(1)
        val step = total / k
        Prop.all(
          Prop(one == run(p)) :| "partition invariance",
          Prop(one.values.sum == total / step) :| "total picks",
          Prop(one.keys.forall(id => ws(id.toInt) > 0)) :| "no zero-weight picks")
      }
    }, n = 5)
  }

  test("property: winsorize clamps exactly to the brute-force discrete band") {
    val s = spark
    import s.implicits._
    val gen = for {
      n  <- Gen.choose(2, 40)
      vs <- Gen.listOfN(n, Gen.choose(-100, 100).map(_.toDouble))
    } yield vs
    check("winsorize", Prop.forAll(gen) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => ("g", v, i.toLong) }.toDF("g", "v", "id")
      val out = Winsorize.winsorize(df, Seq("g"), "v", "id", 10, 90)
        .collect().map(r => r.getLong(r.fieldIndex("id")) ->
          r.getDouble(r.fieldIndex("v_wins"))).toMap
      // brute-force reference: sort, pick ranks ceil(p*n/100)
      val sorted = vs.zipWithIndex.sortBy { case (v, i) => (v, i) }.map(_._1)
      val lo = sorted((10 * vs.length + 99) / 100 - 1)
      val hi = sorted((90 * vs.length + 99) / 100 - 1)
      Prop.all(
        Prop(out.size == vs.length) :| "row count preserved",
        Prop(vs.zipWithIndex.forall { case (v, i) =>
          out(i.toLong) == math.min(math.max(v, lo), hi)
        }) :| "clamped to the discrete band")
    }, n = 5)
  }

  test("property: snapshot diff matches a map-based reference") {
    val s = spark
    import s.implicits._
    val genState = Gen.mapOf(Gen.zip(Gen.choose(0L, 15L), Gen.choose(0, 3)))
    check("diff", Prop.forAll(Gen.zip(genState, genState)) { case (before, after) =>
      (before.nonEmpty || after.nonEmpty) ==> {
        val b = before.toSeq.toDF("k", "v")
        val a = after.toSeq.toDF("k", "v")
        val got = Snapshot.diff(b, a, Seq("k"))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        val want = (before.keySet ++ after.keySet).flatMap { k =>
          (before.get(k), after.get(k)) match {
            case (None, Some(_))              => Some(k -> "added")
            case (Some(_), None)              => Some(k -> "removed")
            case (Some(x), Some(y)) if x != y => Some(k -> "changed")
            case _                            => None
          }
        }.toMap
        got == want
      }
    }, n = 5)
  }

  test("property: expectation violations are additive under union") {
    val s = spark
    import s.implicits._
    import graft.operators.Expectations
    import graft.operators.Expectations.Check
    val genRows = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 50L), Gen.choose(-5, 20)))
    def report(rows: Seq[(Long, Int)]) =
      Expectations.rowChecks(rows.toDF("id", "v"), "id",
        Seq(Check("v_nonneg", col("v") >= 0), Check("v_small", col("v") < 10)))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    check("additivity", Prop.forAll(Gen.zip(genRows, genRows)) { case (xs, ys) =>
      val a = report(xs); val b = report(ys); val ab = report(xs ++ ys)
      ab.keySet.forall { k =>
        ab(k)._1 == a(k)._1 + b(k)._1 &&
        ab(k)._2 == (a(k)._2 ++ b(k)._2).reduceOption(_ min _)
      }
    }, n = 5)
  }

  test("property: triangle counts are invariant under edge direction and duplication") {
    val s = spark
    import s.implicits._
    import graft.operators.Centrality
    val genEdges = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 7), Gen.choose(0, 7))).map(_.filter(e => e._1 != e._2))
    def tri(edges: Seq[(Int, Int)]) =
      Centrality.triangles(edges.toDF("s", "d"), "s", "d")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    check("invariance", Prop.forAll(genEdges) { edges =>
      edges.nonEmpty ==> {
        val base = tri(edges)
        // flip every edge and duplicate the list — same triangles
        val noisy = tri(edges ++ edges.map(_.swap))
        base == noisy
      }
    }, n = 5)
  }

  test("property: centroids assign to themselves at distance zero") {
    val s = spark
    import s.implicits._
    import graft.operators.Kmeans
    val genCents = Gen.nonEmptyListOf(
      Gen.listOfN(3, Gen.choose(-8, 8).map(_.toDouble))).map(_.distinct)
    check("identity", Prop.forAll(genCents) { cs =>
      val cents = cs.map(_.toArray)
      val rows  = cents.zipWithIndex.map { case (c, i) =>
        (i.toLong, c.map(_.toFloat).toSeq) }
      val got = Kmeans.assign(rows.toDF("id", "v"), "id", "v", cents)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      got.forall { case (id, cluster, d2) =>
        // a duplicate-free centroid list assigns each to itself exactly
        cluster == id.toInt && math.abs(d2) < 1e-9
      }
    }, n = 5)
  }

  test("property: attribution matches a brute-force reference") {
    // globally unique ties (the common case) over a wide minute grid
    attributionProperty("attr==ref", maxMinute = 120, tieOf = (i, _) => i.toLong)
  }

  test("property: attribution with COLLIDING (ts, tie) across event types") {
    // ties drawn from a 3-value pool over a narrow grid, so a touch
    // frequently shares a conversion's exact (ts, tie) — the join
    // form's self-pair residual excludes it from that conversion and
    // the walk's tail-scan exclusion must agree (the r8 ADVICE gap:
    // unique-tie generators could never catch a divergence here).
    // (ts, tie) stays unique WITHIN conversions and WITHIN touches per
    // entity — the event-log invariant both shapes assume: a within-
    // kind duplicate merges in the join form's window partition /
    // min-max structs but stays two events in the walk, so equivalence
    // is only promised across kinds.
    attributionProperty("attr==ref/collide", maxMinute = 10,
      tieOf = (i, _) => (i % 3).toLong, dedupeWithinKind = true)
  }

  private def attributionProperty(
      label: String, maxMinute: Int, tieOf: (Int, Long) => Long,
      dedupeWithinKind: Boolean = false): Unit = {
    val s = spark
    import s.implicits._
    import graft.operators.Funnel
    val types = Vector("purchase", "view", "click")
    val genEvents = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(1L, 3L), Gen.choose(0, maxMinute), Gen.choose(0, 2)))
    val lookbackSec = 1800L // 30 min
    check(label, Prop.forAll(genEvents) { evs =>
      val rows0 = evs.zipWithIndex.map { case ((u, m, t), i) =>
        (tieOf(i, u), u, java.sql.Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00"),
          types(t))
      }
      val rows =
        if (!dedupeWithinKind) rows0
        else rows0.distinctBy(r => (r._2, r._3, r._4 == "purchase", r._1))
      val df = rows.toDF("event_id", "user_id", "ts", "event_type")
      def toMapOf(out: org.apache.spark.sql.DataFrame) =
        out.collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      val got = toMapOf(Funnel.attribution(
        df, "user_id", "ts", "event_id", "event_type",
        "purchase", Seq("view", "click"), lookbackSec))
      // the linear FIFO walk must agree with the join form on the same
      // random stream (duplicate timestamps, boundary hits and all)
      val gotWalk = toMapOf(Funnel.attributionWalk(
        df, "user_id", "ts", "event_id", "event_type",
        "purchase", Seq("view", "click"), lookbackSec))
      // brute force: per conversion, enumerate window touches.
      // Conversions key by (user, ts, tie) — the join form's window
      // partition key — and first/last compare (ts, tie) PAIRS, so the
      // reference stays exact under a colliding tie pool.
      val byConv = for {
        (cid, cu, cts, cty) <- rows if cty == "purchase"
        touches = rows.filter { case (tid, tu, tts, tty) =>
          Seq("view", "click").contains(tty) && tu == cu &&
            !tts.after(cts) && cts.getTime - tts.getTime <= lookbackSec * 1000L &&
            !(tts == cts && tid == cid)
        }
        if touches.nonEmpty
      } yield {
        val byKey   = touches.sortBy(t => (t._3.getTime, t._1))
        val n       = touches.size.toLong
        ((cu, cts, cid), byKey.head, byKey.last, touches, n)
      }
      val want = Seq("view", "click").flatMap { ty =>
        val rowsOfType = byConv.flatMap { case (convKey, first, last, touches, n) =>
          touches.filter(_._4 == ty).map { t =>
            (convKey,
              t._3 == first._3 && t._1 == first._1,
              t._3 == last._3 && t._1 == last._1,
              1000000L / n)
          }
        }
        if (rowsOfType.isEmpty) None
        else Some(ty -> ((
          rowsOfType.size.toLong,
          rowsOfType.map(_._1).distinct.size.toLong,
          rowsOfType.map(r => if (r._2) 1000000L else 0L).sum,
          rowsOfType.map(r => if (r._3) 1000000L else 0L).sum,
          rowsOfType.map(_._4).sum)))
      }.toMap
      got == want && gotWalk == want
    }, n = 5)
  }

  test("property: incremental sessionization equals full rebuild for any time cut") {
    val s = spark
    import s.implicits._
    import graft.operators.Sessions
    // random per-user event streams on a shared minute grid, then an
    // arbitrary cut: everything before is "maintained", everything at
    // or after is "the batch" — the append-only nightly-load shape
    // that sessionizeIncremental promises to fold exactly
    val genEvents = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(1L, 4L),      // user
      Gen.choose(0, 300),      // minute offset
      Gen.choose(0.0, 9.0)))   // value
    val genCase = for {
      evs <- genEvents
      cut <- Gen.choose(0, 300)
    } yield (evs, cut)
    check("inc==full", Prop.forAll(genCase) { case (evs, cutMin) =>
      val rows = evs.zipWithIndex.map { case ((u, m, v), i) =>
        (i.toLong, u, java.sql.Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00"), v)
      }.toDF("event_id", "user_id", "ts", "value")
      val cutTs = lit(f"2024-01-01 ${cutMin / 60}%02d:${cutMin % 60}%02d:00").cast("timestamp")
      val gap   = 600L // 10 minutes
      val m = Sessions.buildSessionTable(
        rows.filter(col("ts") < cutTs), "user_id", "ts", "event_id", "value", gap)
      val inc = Sessions.sessionTableStats(Sessions.sessionizeIncremental(
        m, rows.filter(col("ts") >= cutTs), "user_id", "ts", "event_id", "value", gap),
        "user_id").collect().map(_.toString).toSet
      val full = Sessions.sessionTableStats(Sessions.buildSessionTable(
        rows, "user_id", "ts", "event_id", "value", gap),
        "user_id").collect().map(_.toString).toSet
      inc == full
    }, n = 5)
  }
}
