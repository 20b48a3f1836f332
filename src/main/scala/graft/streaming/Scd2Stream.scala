package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class Scd2Change(user_id: Long, op: String, value: Double, offset: Long)

/** The open (not-yet-superseded) version of a key. */
case class Scd2Open(op: String, value: Double, offset: Long)

case class Scd2Closed(user_id: Long, value: Double, op: String,
                      valid_from: Long, valid_to: Long)

/** Streaming SCD2 history via flatMapGroupsWithState — the streaming
  * twin of the batch change-history builder (cdc/Cdc.cdcHistory): per
  * key, each arriving change CLOSES the previously open version
  * (valid_to = the new change's offset) and opens its own. Emission
  * discipline (Append mode): exactly the CLOSED versions — a version
  * row is final the moment its successor arrives, within or across
  * micro-batches, and is never revised; the trailing open version
  * lives only in state (the batch operator reports it with
  * valid_to = −1 — the stream, by definition, hasn't seen its close).
  * Delete tombstones close their predecessor but are never emitted as
  * versions, matching the batch operator's `op != 'd'` filter.
  *
  * Scale: state is ONE open version per key (three fields), the
  * minimum any SCD2 builder must hold; emitted rows leave state
  * immediately, so state size is key-cardinality regardless of
  * history depth. Within a batch, a key's changes are folded in
  * offset order (the bus delivers per-key ordered offsets; the sort
  * is per-group over the batch's rows for that key only).
  */
object Scd2Stream {

  def history(spark: SparkSession, changes: Dataset[Scd2Change]): Dataset[Scd2Closed] = {
    import spark.implicits._
    changes
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2Open, Scd2Closed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Scd2Change], state: GroupState[Scd2Open]) =>
          val ordered = rows.toSeq.sortBy(_.offset)
          var open = state.getOption
          val closed = Seq.newBuilder[Scd2Closed]
          ordered.foreach { c =>
            open.foreach { o =>
              if (o.op != "d")
                closed += Scd2Closed(userId, o.value, o.op, o.offset, c.offset)
            }
            open = Some(Scd2Open(c.op, c.value, c.offset))
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
