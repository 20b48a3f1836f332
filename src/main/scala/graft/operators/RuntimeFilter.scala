package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Relational.dsum

/** Explicit bloom runtime-filter join — the pattern behind Spark's own
  * `InjectRuntimeFilter`, surfaced as an operator for plans where the
  * optimizer cannot infer it (filter thresholds, pre-computed dim
  * subsets, cross-query reuse of a built filter).
  *
  * Shape: a selective dimension predicate produces a small "hot" key
  * set; a bloom filter of those keys prunes the FACT scan map-side
  * (no shuffle, no false negatives) before the exact join settles the
  * false positives. The fact rows that never had a partner are dropped
  * at the scan instead of riding the join shuffle — at 100 TB with a
  * 1%-selective dimension predicate that is a ~99% shuffle-byte cut on
  * the fact side.
  *
  * Scale honesty on the driver collect: `might_contain` needs a
  * CONSTANT bloom, so the bitmap is collected and embedded as a binary
  * literal. The bitmap is sized from the MEASURED hot-key count but
  * hard-capped (items cap ⇒ bits cap ⇒ the collect is O(1), never
  * O(dimension)); past the cap the false-positive rate degrades
  * gracefully and the exact join remains the sole correctness
  * authority. Same doctrine as the dedup band-index bloom.
  */
object RuntimeFilter {

  /** Items cap for the embedded bloom (~1 MiB of bits at the default
    * FPP) — bounds driver traffic regardless of dimension scale.
    */
  val MaxBloomItems: Long = 1L << 20

  def bloomPruneJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hot = Tables.customer(spark, dir)
      .filter($"c_acctbal" > 9000.0)
      .select($"c_custkey", $"c_mktsegment")
    val nHot = math.max(hot.count(), 1L)
    val bloomBytes = hot
      .agg(graft.functions.BloomFunctions
        .bloom_agg($"c_custkey", math.min(nHot, MaxBloomItems)).as("bf"))
      .first().getAs[Array[Byte]]("bf")
    Tables.orders(spark, dir)
      .filter(graft.functions.BloomFunctions
        .bloom_might_contain(lit(bloomBytes), $"o_custkey"))
      .join(hot, $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("revenue"))
      .orderBy($"c_mktsegment")
  }

  /** The bloom is correctness-invisible (exact join settles it), so the
    * oracle is the plain selective join.
    */
  val bloomPruneJoinSql: String =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_acctbal > 9000
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
}
