package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class BudgetDoc(source: String, doc_id: Long, n_tok: Long)

/** Carried admission state: the source's running token total. ONE long
  * per source — the smallest possible stateful-streaming footprint,
  * grid-bounded (|sources|) at any corpus size.
  */
case class BudgetState(spent: Long)

case class BudgetOut(doc_id: Long, source: String, n_tok: Long, cum_tokens: Long)

/** Streaming per-source token-budget admission via
  * flatMapGroupsWithState — the quota controller a training-data
  * ingest runs when each source contributes a fixed token allotment to
  * the mixture (the mixture_plan/waterfill budgets, enforced online):
  * documents are admitted in arrival (doc_id) order while the source's
  * RUNNING token total — counting every arrival, admitted or not —
  * stays within the budget; once a source crosses the line its gate is
  * closed for good (the prefix-cutoff semantic, which makes the
  * decision a pure function of the arrival prefix and therefore
  * exactly replayable by a batch window cumsum).
  *
  * Emission discipline (Append): an admission is final the moment the
  * document is processed. Micro-batches deliver per-key rows unsorted,
  * so each batch sorts its group slice by doc_id; determinism across
  * batch boundaries holds because the staged replay is doc_id-range
  * ordered (StreamQueries.stageDocsOrdered), mirroring an
  * offset-ordered bus partition.
  */
object TokenBudget {

  def gate(spark: SparkSession, docs: Dataset[BudgetDoc],
           budget: Long): Dataset[BudgetOut] = {
    import spark.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[BudgetState, BudgetOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[BudgetDoc], state: GroupState[BudgetState]) =>
          val sorted = rows.toSeq.sortBy(_.doc_id)
          var spent = state.getOption.map(_.spent).getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer[BudgetOut]()
          sorted.foreach { d =>
            spent += d.n_tok
            if (spent <= budget)
              out += BudgetOut(d.doc_id, d.source, d.n_tok, spent)
          }
          state.update(BudgetState(spent))
          out.iterator
      }
  }
}
