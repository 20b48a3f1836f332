package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_lines"),
        sum($"l_quantity".cast("decimal(18,4)")).cast("double").as("sum_qty"))
      .orderBy($"o_orderstatus")

  test("bucketed fact-fact join runs without a shuffle exchange") {
    val joined = Bucketing.bucketedFactJoin(spark, sf)
    val plan = joined.queryExecution.executedPlan.toString
    val joinShuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    info(s"hash exchanges feeding the bucketed join = $joinShuffles")
    assert(joinShuffles == 0, s"bucketed join still shuffles:\n$plan")
    // and it computes the same result as the plain join
    val expected = agg(sources.Tables.lineitem(spark, sf)
      .join(sources.Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")).collect()
    assert(agg(joined).collect().sameElements(expected))
  }
}
