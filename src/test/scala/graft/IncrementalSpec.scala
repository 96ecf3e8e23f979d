package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.exec.{DimPopulate, FactPopulate}
import graft.model._

/** Property from SURVEY §5.3: a full refresh over [0, hi) is equivalent
  * to the composition of aligned incremental refreshes — dims set-equal
  * with stable surrogate keys, facts row-equal (bucket keys are
  * disjoint across aligned windows).
  */
class IncrementalSpec extends SparkSpec {
  import Fixtures._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val lo    = ts("2024-01-10 00:00:00")
  private val hi    = ts("2024-01-20 00:00:00")
  private val fact  = eventsEnv.findFact("user_activity").get
  private def ev: DataFrame = sources.ParquetTables.readTable(spark, sf("sf0.001"), "events")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("dim: full == full(w1) ++ incremental(w2) with continuing ids") {
    val full = DimPopulate.full(eventsEnv, fact, "dim_app_user", ev, TimeWindow.upTo(hi))
    val w1   = DimPopulate.full(eventsEnv, fact, "dim_app_user", ev, TimeWindow.upTo(lo))
    val w2   = DimPopulate.incremental(
      eventsEnv, fact, "dim_app_user", ev, w1, TimeWindow.between(lo, hi))
    val composed = w1.unionByName(w2)
    // same natural-key membership
    assert(sortedRows(full.select("user_id")) == sortedRows(composed.select("user_id")))
    // ids dense 1..n in both
    val n = full.count()
    assert(composed.count() == n)
    assert(composed.agg(min("id"), max("id"), countDistinct("id")).head().toSeq ==
      Seq(1, n.toInt, n))
  }

  test("fact: full == union of aligned incremental windows") {
    // dims resolved against the same full dim table in both runs
    val dim = DimPopulate.full(eventsEnv, fact, "dim_app_user", ev, TimeWindow.upTo(hi))
    def readDim(n: String): DataFrame = dim
    def readSrc(n: String): DataFrame = ev
    val full =
      FactPopulate.populate(eventsEnv, fact, TimeWindow.upTo(hi), readSrc, readDim)
    val mid = ts("2024-01-15 00:00:00")
    val parts = Seq(
      TimeWindow.between(ts("1970-01-01 00:00:00"), lo),
      TimeWindow.between(lo, mid),
      TimeWindow.between(mid, hi)
    ).map(w => FactPopulate.populate(eventsEnv, fact, w, readSrc, readDim))
    val composed = parts.reduce(_ unionByName _)
    assert(sortedRows(full) == sortedRows(composed))
  }

  test("fact group keys are disjoint across aligned windows") {
    val dim = DimPopulate.full(eventsEnv, fact, "dim_app_user", ev, TimeWindow.upTo(hi))
    val mid = ts("2024-01-15 00:00:00")
    val a = FactPopulate.populate(
      eventsEnv, fact, TimeWindow.between(lo, mid), _ => ev, _ => dim)
    val b = FactPopulate.populate(
      eventsEnv, fact, TimeWindow.between(mid, hi), _ => ev, _ => dim)
    val overlap = a.select("ts_minute_id", "app_user_id")
      .intersect(b.select("ts_minute_id", "app_user_id"))
    assert(overlap.count() == 0)
  }
}
