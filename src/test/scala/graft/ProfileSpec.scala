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
}
