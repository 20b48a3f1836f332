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
