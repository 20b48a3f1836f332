package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class AttribEvent(user_id: Long, event_id: Long, event_type: String,
    ts_ns: Long, value: Double)

/** Carried last-touch state: the most recent non-purchase event seen
  * for this user. Tiny and bounded — one (type, ts) pair per live user,
  * the canonical mapGroupsWithState state size.
  */
case class AttribState(lastType: String, lastTs: Long)

case class AttribOut(event_id: Long, channel: String, v_micro: Long)

/** Streaming last-touch attribution via flatMapGroupsWithState — the
  * streaming twin of the batch operator
  * (operators/Behavior.funnelAttribution): each purchase is credited,
  * AT ARRIVAL, to the user's most recent prior non-purchase event
  * within the 7-day lookback, "direct" otherwise.
  *
  * Emission discipline (Append): an attribution row is final the
  * moment its purchase is processed — unlike sessionization there is
  * no "open" entity to close, so no timeout machinery is needed; state
  * is only the carried last-touch pair. Micro-batches deliver per-key
  * rows unsorted, so each batch sorts its group slice by
  * (ts_ns, event_id) — the same total order the batch operator's
  * window uses. Values are micro-unit-quantized at emission so any
  * downstream sum is exact.
  */
object Attribution {

  def attribute(spark: SparkSession, events: Dataset[AttribEvent])
      : Dataset[AttribOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttribState, AttribOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[AttribEvent], state: GroupState[AttribState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts_ns, e.event_id))
          var st = state.getOption.getOrElse(AttribState(null, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer[AttribOut]()
          sorted.foreach { e =>
            if (e.event_type != "purchase") {
              st = AttribState(e.event_type, e.ts_ns)
            } else {
              val channel =
                if (st.lastType != null &&
                  e.ts_ns - st.lastTs <= graft.operators.Behavior.AttribWindowNs)
                  st.lastType
                else "direct"
              out += AttribOut(e.event_id, channel, math.round(e.value * 1e6))
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
