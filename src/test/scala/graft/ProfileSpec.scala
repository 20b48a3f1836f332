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

  test("approx percentiles: in-band booleans hold and exacts match order stats") {
    // the operator now carries its own GK audit in-plan: exact micro
    // order statistics at ⌈qn⌉ plus booleans asserting the sketch
    // answer sits inside the ε-rank window (the oracle pins them TRUE)
    val rows = graft.operators.Profile.approxPercentiles(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = graft.sources.Tables.events(spark, sf)
      .select($"event_type", $"value").collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.map(r => math.round(r.getDouble(1) * 1e6)).sorted
      }
    rows.foreach { r =>
      val vals = byType(r.getString(0))
      val n = vals.length
      def orderStat(q: Double): Long = vals(math.ceil(q * n).toInt - 1)
      assert(r.getLong(1) === orderStat(0.5),
        s"${r.getString(0)} p50 exact micro ${r.getLong(1)} != ${orderStat(0.5)}")
      assert(r.getLong(2) === orderStat(0.95),
        s"${r.getString(0)} p95 exact micro ${r.getLong(2)} != ${orderStat(0.95)}")
      assert(r.getBoolean(3), s"${r.getString(0)} p50 sketch out of ε-rank band")
      assert(r.getBoolean(4), s"${r.getString(0)} p95 sketch out of ε-rank band")
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
