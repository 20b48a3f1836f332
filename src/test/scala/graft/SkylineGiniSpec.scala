package graft

import graft.operators.Relational2
import org.apache.spark.sql.functions._

/** Brute-force and bounds checks for pareto_skyline and gini_by_brand. */
class SkylineGiniSpec extends SparkSpec {
  import spark.implicits._

  test("pareto_skyline: matches the brute-force dominance definition") {
    val got = Relational2.paretoSkyline(spark, sf).collect()
      .map(r => r.getLong(0)).toSet
    val parts = graft.sources.Tables.part(spark, sf)
      .select($"p_partkey",
        ($"p_retailprice".cast("decimal(18,4)") * 100).cast("long").as("pu"),
        $"p_size".cast("long").as("sz"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = parts.filter { case (k, p, s) =>
      !parts.exists { case (k2, p2, s2) =>
        k2 != k && p2 <= p && s2 <= s && (p2 < p || s2 < s)
      }
    }.map(_._1).toSet
    assert(got === expected, "skyline must equal the O(n²) dominance filter")
    assert(got.nonEmpty && got.size < parts.length,
      "frontier must be a proper non-empty subset")
  }

  test("gini_by_brand: bounded, and concentration orders as expected") {
    val g = Relational2.giniByBrand(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(g.nonEmpty)
    g.foreach { case (b, n, gini) =>
      assert(gini >= 0.0 && gini < 1.0, s"$b: gini $gini out of [0,1)")
      assert(n > 1, s"$b: degenerate brand")
    }
    // hand fixture: equal revenues → gini 0; one-takes-all → (n-1)/n
    val two = Seq(("b", 1L, 500000L), ("b", 2L, 500000L),
      ("c", 3L, 0L), ("c", 4L, 1000000L))
      .toDF("brand", "p_partkey", "x_u")
    val W = org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val res = two
      .withColumn("i", row_number().over(
        W.partitionBy($"brand").orderBy($"x_u", $"p_partkey")).cast("long"))
      .groupBy($"brand")
      .agg(count(lit(1)).as("n"), sum($"x_u".cast(d38)).as("sx"),
        sum(($"i".cast(d38) * $"x_u".cast(d38)).cast(d38)).as("six"))
      .select($"brand",
        (lit(2d) * $"six".cast("double") / ($"n".cast("double") * $"sx".cast("double"))
          - ($"n" + 1).cast("double") / $"n".cast("double")).as("gini"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(res("b") - 0.0) < 1e-12, s"equal split: ${res("b")}")
    assert(math.abs(res("c") - 0.5) < 1e-12, s"winner-takes-all n=2: ${res("c")}")
  }
}
