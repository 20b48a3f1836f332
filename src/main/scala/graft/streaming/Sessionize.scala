package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class SessEvent(user_id: Long, event_id: Long, ts_s: Long, value: Double)
case class SessState(lastTs: Long, sessionId: Long, nEvents: Long, sessValue: Double)
case class SessionOut(user_id: Long, session_id: Long, n_events: Long, session_value: Double)

/** Custom stateful sessionization via flatMapGroupsWithState — the
  * streaming twin of the batch gap-sessionizer (operators/Windows
  * .sessionize), with explicit per-key state (last-seen time, open
  * session accumulator). Gap threshold 30 min.
  *
  * On timeout/end-of-group the open session is emitted. In a real
  * deployment the state store is RocksDB-backed and the watermark
  * bounds state size; here ProcessingTimeTimeout keeps the spec
  * synchronous.
  */
object Sessionize {

  val GapSeconds = 1800L

  def sessionize(spark: SparkSession, events: Dataset[SessEvent]): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[SessEvent], state: GroupState[SessState]) =>
          // micro-batches deliver per-key rows unsorted; order by offset
          val sorted = rows.toSeq.sortBy(_.event_id)
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L, 0.0))
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          sorted.foreach { e =>
            if (st.nEvents > 0 && e.ts_s - st.lastTs <= GapSeconds) {
              st = SessState(e.ts_s, st.sessionId, st.nEvents + 1, st.sessValue + e.value)
            } else {
              if (st.nEvents > 0)
                out += SessionOut(userId, st.sessionId, st.nEvents, st.sessValue)
              st = SessState(e.ts_s, st.sessionId + 1, 1L, e.value)
            }
          }
          // close the trailing session (single-batch/testing semantics;
          // a watermark-driven timeout would do this in production)
          if (st.nEvents > 0)
            out += SessionOut(userId, st.sessionId, st.nEvents, st.sessValue)
          state.update(st)
          out.iterator
      }
  }
}
