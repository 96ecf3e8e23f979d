package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming run-debounce: the stateful counterpart of
  * [[graft.operators.Sessions.debounce]], built on
  * `flatMapGroupsWithState` (the custom-state streaming primitive —
  * run boundaries are not expressible as a windowed aggregation, so
  * this is exactly the case for hand-managed group state).
  *
  * Per-entity state is ONE tuple — the (timestamp, type) of the last
  * RAW event seen — so state size is O(active entities), independent of
  * event volume, and idle entities are EXPIRED by an event-time timeout
  * one debounce window past the watermark (a run cannot legally
  * continue once the watermark passes its reopening horizon, so expiry
  * never changes results). That bounded, self-cleaning state is the
  * 100 TB streaming contract.
  *
  * Ordering caveat (inherent to arrival-order operators): events are
  * sorted (ts, tie) WITHIN each micro-batch and runs continue across
  * batches via the carried state, so in-order feeds reproduce the
  * batch operator exactly (StreamingSpec pins parity, including a run
  * spanning a batch boundary). An event arriving out of order ACROSS a
  * batch boundary would mis-split a run — replayable storage should use
  * the batch operator; the stream is for live suppression.
  */
// encoder case classes live at file scope and stay public: Janino
// cannot compile the generated projections for PRIVATE nested case
// classes (same constraint as TextAnalysis's flat-array UDF returns)
case class DebounceEvent(entity: String, ts: Timestamp, tie: Long, typ: String)
case class DebounceRunState(lastTsUs: Long, lastType: String)
case class DebounceKept(entity: String, ts_us: Long, tie: Long, event_type: String)

object StreamingDebounce {
  private type Ev       = DebounceEvent
  private type RunState = DebounceRunState
  private type Kept     = DebounceKept
  private val Kept     = DebounceKept
  private val RunState = DebounceRunState

  def debounce(
      events: DataFrame, entityCol: String, tsCol: String, tieCol: String,
      typeCol: String, windowMicros: Long, watermark: String = "1 day"
  ): DataFrame = {
    require(windowMicros >= 0, s"windowMicros must be >= 0, got $windowMicros")
    val spark = events.sparkSession
    import spark.implicits._
    val typed: Dataset[Ev] = events
      .withWatermark(tsCol, watermark)
      .select(
        col(entityCol).cast("string").as("entity"),
        col(tsCol).as("ts"),
        col(tieCol).cast("long").as("tie"),
        col(typeCol).cast("string").as("typ"))
      .as[Ev]
    typed
      .groupByKey(_.entity)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (entity: String, batch: Iterator[Ev], state: GroupState[RunState]) =>
          if (state.hasTimedOut) {
            // watermark passed the reopening horizon: the run can never
            // continue, and any future event necessarily opens a new run
            state.remove()
            Iterator.empty
          } else {
            // micros, not getTime millis: the batch operator compares
            // unix_micros and events carry sub-ms precision
            def micros(t: Timestamp): Long =
              math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
            val sorted = batch.toIndexedSeq.sortBy(e => (micros(e.ts), e.tie))
            var last   = state.getOption
            val kept   = Seq.newBuilder[Kept]
            sorted.foreach { e =>
              val tsUs = micros(e.ts)
              val opens = last match {
                case None    => true
                case Some(s) =>
                  !java.util.Objects.equals(s.lastType, e.typ) ||
                    tsUs - s.lastTsUs > windowMicros
              }
              if (opens) kept += Kept(entity, tsUs, e.tie, e.typ)
              last = Some(RunState(tsUs, e.typ))
            }
            last.foreach { s =>
              state.update(s)
              // expire once the watermark is a full window past the last
              // raw event — after that, every arrival opens a run anyway.
              // CEIL of the micros horizon: flooring each term separately
              // could expire up to ~1ms early and mis-keep a sub-ms-window
              // run continuation
              state.setTimeoutTimestamp(math.floorDiv(s.lastTsUs + windowMicros, 1000L) + 1L)
            }
            kept.result().iterator
          }
      }
      .toDF()
  }
}
