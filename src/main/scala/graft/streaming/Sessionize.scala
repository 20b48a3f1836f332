package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class SessEvent(user_id: Long, event_id: Long, ts_s: Long, value: Double)

/** Open-session state. `cents` accumulates value in integer cents so the
  * emitted session_value is exactly sum(decimal(value)) — bit-identical
  * to the batch sessionizer's decimal sum and to the DuckDB oracle
  * (sequential double addition would drift in the last ulp).
  */
case class SessState(lastTs: Long, sessionId: Long, nEvents: Long, cents: Long)
case class SessionOut(user_id: Long, session_id: Long, n_events: Long, session_value: Double)

/** Custom stateful sessionization via flatMapGroupsWithState — the
  * streaming twin of the batch gap-sessionizer (operators/Windows
  * .sessionize), with explicit per-key state (last-seen time, open
  * session accumulator). Gap threshold 30 min.
  *
  * Emission discipline (Append mode): a session is emitted EXACTLY ONCE —
  * either when a later event closes it (gap exceeded within/across
  * batches) or when the event-time watermark passes its close deadline
  * (EventTimeTimeout). The open trailing session is never emitted with
  * the data batch, so downstream consumers never see duplicate or
  * provisional rows. Callers must put an event-time watermark on the
  * input stream.
  *
  * `closeAtEnd = true` is the BATCH-mode variant (state dies with the
  * job, so trailing sessions are flushed at end-of-group); used by the
  * batch-parity spec, never by a real stream.
  */
object Sessionize {

  val GapSeconds = 1800L

  def sessionize(spark: SparkSession, events: Dataset[SessEvent],
                 closeAtEnd: Boolean = false): Dataset[SessionOut] = {
    import spark.implicits._
    val timeoutConf =
      if (closeAtEnd) GroupStateTimeout.NoTimeout else GroupStateTimeout.EventTimeTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](OutputMode.Append, timeoutConf) {
        (userId: Long, rows: Iterator[SessEvent], state: GroupState[SessState]) =>
          def emit(st: SessState) =
            SessionOut(userId, st.sessionId, st.nEvents, st.cents / 100.0)
          if (state.hasTimedOut) {
            // watermark passed lastTs + gap: the open session is final
            val out = emit(state.get)
            state.remove()
            Iterator.single(out)
          } else {
            // micro-batches deliver per-key rows unsorted; order by offset
            val sorted = rows.toSeq.sortBy(_.event_id)
            var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L, 0L))
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            sorted.foreach { e =>
              val cents = math.round(e.value * 100)
              if (st.nEvents > 0 && e.ts_s - st.lastTs <= GapSeconds) {
                st = SessState(e.ts_s, st.sessionId, st.nEvents + 1, st.cents + cents)
              } else {
                if (st.nEvents > 0) out += emit(st)
                st = SessState(e.ts_s, st.sessionId + 1, 1L, cents)
              }
            }
            if (closeAtEnd) {
              if (st.nEvents > 0) out += emit(st)
              state.update(st)
            } else {
              val deadlineMs = (st.lastTs + GapSeconds) * 1000
              if (deadlineMs <= state.getCurrentWatermarkMs()) {
                // already past the close deadline (stale key in a later
                // batch): final now — emitting beats setting an
                // in-the-past timeout, which Spark rejects
                out += emit(st)
                state.remove()
              } else {
                state.update(st)
                state.setTimeoutTimestamp(deadlineMs)
              }
            }
            out.iterator
          }
      }
  }
}
