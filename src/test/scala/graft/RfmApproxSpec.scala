package graft

import org.apache.spark.sql.functions._
import graft.operators.Behavior

/** rfm_segments_approx (the sketch-threshold scale twin) against the
  * exact ntile scorer: same metrics, bounded score deviation, correct
  * direction conventions.
  */
class RfmApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx RFM scores deviate from exact quintiles only at tie boundaries") {
    val exact = Behavior.rfmSegments(spark, sf)
      .select($"o_custkey", $"recency", $"frequency", $"monetary",
        $"r_score".as("re"), $"f_score".as("fe"), $"m_score".as("me"))
    val approxFull = Behavior.rfmSegmentsApprox(spark, sf).cache()
    // the in-plan sketch audit: every ε-rank-window boolean holds
    assert(approxFull.filter(!$"r_ok" || !$"f_ok" || !$"m_ok").count() === 0,
      "sketch cut escaped its ε-rank window")
    val approx = approxFull
      .select($"o_custkey", $"r_score".as("ra"), $"f_score".as("fa"),
        $"m_score".as("ma"), $"segment")
    val j = exact.join(approx, "o_custkey").cache()
    val n = j.count()
    assert(n > 0)
    // scores stay on the 1..5 scale and segment is their concatenation
    assert(j.filter($"ra" < 1 || $"ra" > 5 || $"fa" < 1 || $"fa" > 5
      || $"ma" < 1 || $"ma" > 5).count() === 0)
    assert(j.filter($"segment" =!= concat($"ra".cast("string"),
      $"fa".cast("string"), $"ma".cast("string"))).count() === 0)
    // direction conventions: the most recent / most frequent / biggest
    // spender must score 5 in BOTH scorers
    val top = j.orderBy($"monetary".desc).first()
    assert(top.getAs[Int]("ma") === 5 && top.getAs[Int]("me") === 5)
    // deviation bound: ntile splits a tied metric value across adjacent
    // buckets by custkey while the sketch scores ties identically, so
    // the two agree within 1 except where one VALUE spans >2 quintile
    // buckets (coarse integer metrics like frequency). Monetary and
    // recency are near-continuous: within-1 agreement must be total;
    // frequency tolerates the tie-spread tail but must stay >=80%
    // within 1 and never drift more than the quintile span (4).
    def within1Frac(a: String, e: String): Double =
      j.filter(abs(col(a) - col(e)) <= 1).count().toDouble / n
    assert(within1Frac("ma", "me") >= 0.99, s"monetary within-1 ${within1Frac("ma", "me")}")
    assert(within1Frac("ra", "re") >= 0.95, s"recency within-1 ${within1Frac("ra", "re")}")
    assert(within1Frac("fa", "fe") >= 0.80, s"frequency within-1 ${within1Frac("fa", "fe")}")
    assert(j.filter(abs($"fa" - $"fe") > 4).count() === 0)
    j.unpersist()
    approxFull.unpersist()
  }
}
