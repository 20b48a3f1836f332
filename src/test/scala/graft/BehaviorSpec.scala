package graft

import graft.operators.Behavior
import org.apache.spark.sql.functions._

/** Semantic checks for the behavior-analytics family. */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  test("retention_cohorts: week 0 is always 1.0 and retention never exceeds it") {
    val r = Behavior.retentionCohorts(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter($"week_n" === 0 && $"retention" =!= 1.0).count() === 0,
      "week-0 retention must be exactly 1.0")
    assert(r.filter($"retention" > 1.0).count() === 0)
    r.unpersist()
  }

  test("ab_ttest matches a driver-side Welch recomputation") {
    val r = Behavior.abTtest(spark, sf).head()
    val vals = graft.sources.Tables.events(spark, sf)
      .filter($"event_type".isin("purchase", "view"))
      .select($"event_type", round($"value", 4))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    def stats(xs: Array[Double]) = {
      val n = xs.length.toDouble
      val mean = xs.sum / n
      (n, mean, xs.map(x => (x - mean) * (x - mean)).sum / (n - 1))
    }
    val (n1, m1, v1) = stats(vals("purchase"))
    val (n2, m2, v2) = stats(vals("view"))
    val t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-4,
      s"t=${r.getAs[Double]("t_stat")} expected ~$t")
    assert(r.getAs[Long]("n1") === n1.toLong && r.getAs[Long]("n2") === n2.toLong)
    assert(r.getAs[Boolean]("significant_95") === (math.abs(t) > 1.96))
  }

  test("markov_transitions: rows are proper distributions and counts total events−users") {
    val m = Behavior.markovTransitions(spark, sf).cache()
    // each from-row's probabilities sum to 1 within rounding slack
    val rowSums = m.groupBy($"from_type").agg(sum($"p").as("sp")).collect()
    rowSums.foreach(r => assert(math.abs(r.getAs[Double]("sp") - 1.0) < 1e-4,
      s"row ${r.getString(0)} sums to ${r.getAs[Double]("sp")}"))
    // total transitions = total events − one per user (no next for the last)
    val total = m.agg(sum($"n")).head().getLong(0)
    val ev = graft.sources.Tables.events(spark, sf)
    val expected = ev.count() - ev.select($"user_id").distinct().count()
    assert(total === expected)
    m.unpersist()
  }
}
