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
