package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.GraftExpressionBridge.{toColumn, toExpression}

/** Column wrappers over Spark's internal bloom-filter expressions (the
  * machinery behind `InjectRuntimeFilter`), exposed for EXPLICIT
  * bloom pre-passes where the optimizer cannot infer one — e.g. the
  * dedup band table, where "possibly-duplicated bucket" is an aggregate
  * property of the same table, not a join against a selective side.
  *
  * Determinism: the bloom's bit array is an OR of per-item bit sets
  * with fixed hash seeds — insertion order and partitioning cannot
  * change it, and `might_contain` has NO false negatives, so a filter
  * that keeps bloom hits retains a deterministic SUPERSET of the true
  * match set. Any exact recount downstream sees complete key groups
  * (membership is per key, so a key's rows pass or fail wholesale).
  */
object BloomFunctions {

  /** Aggregate a long column into a bloom filter (binary). */
  def bloom_agg(items: Column, estimatedNumItems: Long): Column =
    toColumn(new BloomFilterAggregate(toExpression(items), estimatedNumItems)
      .toAggregateExpression())

  /** True when `value` (long) may have been inserted into `bloom`. */
  def bloom_might_contain(bloom: Column, value: Column): Column =
    toColumn(BloomFilterMightContain(toExpression(bloom), toExpression(value)))
}
