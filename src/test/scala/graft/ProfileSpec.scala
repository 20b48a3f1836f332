package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("approx distinct within 5% of exact") {
    val rows = Profile.approxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("approx percentiles land at the right RANK (the GK guarantee)") {
    // GK bounds RANK error, and the sketch returns an actual data value
    // (no interpolation) — so the correct check is the empirical CDF at
    // the returned value, not a value window (tail order-stat gaps can
    // be arbitrarily wide)
    val rows = graft.operators.Profile.approxPercentiles(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = graft.sources.Tables.events(spark, sf)
      .select($"event_type", $"value").collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.map(_.getDouble(1)).sorted
      }
    rows.foreach { r =>
      val vals = byType(r.getString(0))
      val n = vals.length.toDouble
      def cdf(x: Double): Double = vals.count(_ <= x) / n
      // rank tolerance: sketch bound (1/1000) ⊕ one order statistic
      val tol = 0.001 + 1.5 / n
      assert(math.abs(cdf(r.getDouble(1)) - 0.5) <= tol,
        s"${r.getString(0)} p50 ${r.getDouble(1)} sits at cdf ${cdf(r.getDouble(1))}")
      assert(math.abs(cdf(r.getDouble(2)) - 0.95) <= tol,
        s"${r.getString(0)} p95 ${r.getDouble(2)} sits at cdf ${cdf(r.getDouble(2))}")
    }
  }

  test("winsorize clips ~5% each side and histogram mass equals row count") {
    val w = Profile.winsorize(spark, sf).collect()
    for (r <- w) {
      val (n, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(math.abs(lo.toDouble / n - 0.05) < 0.02, s"${r.getString(0)} lo=$lo/$n")
      assert(math.abs(hi.toDouble / n - 0.05) < 0.02, s"${r.getString(0)} hi=$hi/$n")
      assert(r.getDouble(4) < r.getDouble(5), "p05 < p95")
    }
    val h = Profile.valueHistogram(spark, sf)
    assert(h.agg(org.apache.spark.sql.functions.sum("n")).first().getLong(0) ==
      sources.Tables.events(spark, sf).count())
  }

  test("profile covers every declared column with consistent counts") {
    val p = Profile.tableProfile(spark, sf).collect()
    assert(p.map(_.getString(0)).toSet ==
      Set("o_custkey", "o_totalprice", "o_orderstatus"))
    val nRows = sources.Tables.orders(spark, sf).count()
    p.foreach { r =>
      assert(r.getLong(5) == nRows)
      assert(r.getLong(1) <= nRows && r.getLong(2) <= r.getLong(1))
    }
  }

  test("trend_fit matches a driver-side least-squares recomputation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val fits = Profile.trendFit(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val sample = sources.Tables.events(spark, sf)
      .select($"event_type", (unix_timestamp($"ts") - 1704067200L).as("x"),
        round($"value", 4).as("y"))
      .collect().groupBy(_.getString(0))
    sample.foreach { case (tpe, rows) =>
      val xs = rows.map(_.getLong(1).toDouble)
      val ys = rows.map(_.getDouble(2))
      val n = xs.length.toDouble
      val slope = (n * xs.zip(ys).map { case (a, b) => a * b }.sum
        - xs.sum * ys.sum) / (n * xs.map(a => a * a).sum - xs.sum * xs.sum)
      val got = fits(tpe).getAs[Double]("slope_per_day") / 86400.0
      assert(math.abs(got - slope) < 1e-9 * math.max(1.0, math.abs(slope)),
        s"$tpe: got $got expected $slope")
    }
    assert(fits.values.forall(r => r.getAs[Double]("r2") >= 0.0 &&
      r.getAs[Double]("r2") <= 1.0))
  }

  test("dq_report flags exactly the planted corruption and nothing else") {
    val report = operators.DataQuality.dqReport(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report.size === 11)
    val expectedFails = Set("fk_orders_custkey", "orders_orderkey_unique",
      "orders_totalprice_positive")
    expectedFails.foreach(c => assert(report(c) === 1L, s"$c should flag the planted row"))
    (report.keySet -- expectedFails).foreach(c =>
      assert(report(c) === 0L, s"$c should be clean"))
  }
}
