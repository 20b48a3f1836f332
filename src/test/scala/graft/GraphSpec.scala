package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Semantic checks for the co-purchase graph family. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("part_pagerank: mass is conserved up to floor loss and ranks follow degree") {
    val pr = Graph.partPagerank(spark, sf, topK = 1000000).cache()
    val n = pr.count()
    assert(n > 0)
    // nano-unit mass: floors only LOSE mass (per iteration ≤ deg_u−1
    // units at node u plus the damping/teleport floors), so the total
    // must never exceed 1e9 and stays within 1% of it on this graph
    val mass = pr.agg(sum($"pr_nano")).head().getLong(0)
    assert(mass <= 1000000000L, s"mass grew: $mass")
    assert(mass >= 990000000L, s"too much floor loss: $mass")
    // rank correlates with degree: the top decile by rank must have a
    // higher mean degree than the bottom decile
    val byRank = pr.orderBy($"pr_nano".desc).collect()
    val k = math.max(1, byRank.length / 10)
    val topDeg = byRank.take(k).map(_.getAs[Long]("deg")).sum.toDouble / k
    val botDeg = byRank.takeRight(k).map(_.getAs[Long]("deg")).sum.toDouble / k
    assert(topDeg > botDeg, s"top-decile degree $topDeg !> bottom $botDeg")
    pr.unpersist()
  }

  test("copurchase_top counts match a direct per-pair recount") {
    val top = Graph.copurchaseTop(spark, sf, topK = 5).collect()
    assert(top.nonEmpty)
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").distinct().cache()
    top.foreach { r =>
      val (a, b) = (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))
      val expected = li.filter($"l_partkey" === a).select($"l_orderkey")
        .intersect(li.filter($"l_partkey" === b).select($"l_orderkey")).count()
      assert(r.getAs[Long]("n_orders") === expected, s"pair ($a,$b)")
    }
    li.unpersist()
  }

  test("part_pagerank plan: per-iteration rank joins broadcast (edges never re-shuffle on rank)") {
    val plan = Graph.partPagerank(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "rank/degree joins must broadcast")
    assert(plan.contains("TakeOrderedAndProject"), "top-k must not global-sort")
  }
}
