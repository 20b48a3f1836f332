package graft

import graft.operators.{Graph, TimeSeries2}
import org.apache.spark.sql.functions._

/** Semantic checks for the statistical time-series family
  * (changepoint_detect, acf_lags, theil_sen) and the basket-mining
  * graph ops (adamic_adar, basket_rules) beyond the DuckDB hash gate.
  */
class StatsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("gap_histogram: brute-force gap replay and share conservation") {
    import graft.operators.TimeSeries2
    val rows = TimeSeries2.gapHistogram(spark, sf).collect()
    val evs = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"ts_ns", $"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = evs.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(e => (e._2, e._3))
      s.sliding(2).collect { case Array(a, b) =>
        Math.floorDiv(b._2 - a._2, 1000000000L)
      }
    }.toSeq
    def bucket(g: Long): Int =
      if (g < 1) 0 else if (g < 10) 1 else if (g < 60) 2 else if (g < 600) 3
      else if (g < 3600) 4 else if (g < 21600) 5 else if (g < 86400) 6 else 7
    val expect = gaps.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    assert(rows.map(_.getAs[Long]("n_gaps")).sum === gaps.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_gaps") === expect(r.getAs[Int]("bucket")),
        s"bucket ${r.getAs[Int]("bucket")}")
    }
    // cumulative share is monotone and ends at exactly 1 (floor of
    // total*1e6/total)
    val cums = rows.sortBy(_.getAs[Int]("bucket")).map(_.getAs[Long]("cum_share_micro"))
    assert(cums.toSeq === cums.sorted.toSeq)
    assert(cums.last === 1000000L)
  }

  test("changepoint_detect: argmax matches a driver-side brute force per series") {
    val cp = TimeSeries2.changepointDetect(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // recompute the integer-exact CUSUM argmax from the raw daily series
    val daily = graft.sources.Tables.events(spark, sf)
      .select($"event_type",
        floor(unix_timestamp($"ts") / 86400L).cast("long").as("day_n"),
        $"value".cast("decimal(18,4)").as("v"))
      .groupBy($"event_type", $"day_n")
      .agg((sum($"v") * 10000).cast("decimal(38,0)").cast("long").as("x"))
      .collect().groupBy(_.getString(0))
    for ((et, rows) <- daily) {
      val xs = rows.sortBy(_.getLong(1)).map(_.getLong(2))
      val n = xs.length
      val s = xs.map(BigInt(_)).sum
      val best = (1 until n).maxBy { t =>
        val st = xs.take(t).map(BigInt(_)).sum
        val p = BigInt(n) * st - BigInt(t) * s
        // compare exact rationals p²/(t(n−t)) via cross-multiplication-free
        // BigDecimal (exact: p² is an integer, the divisor is an integer)
        (BigDecimal(p * p) / BigDecimal(BigInt(t) * BigInt(n - t)), -t)
      }
      assert(cp(et) === best.toLong,
        s"$et: operator split ${cp(et)} != brute-force split $best")
    }
  }

  test("acf_lags: Cauchy-Schwarz bound and full lag grid") {
    val acf = TimeSeries2.acfLags(spark, sf).cache()
    assert(acf.filter(abs($"acf") > 1.0).count() === 0, "|r_l| must be <= 1")
    val grid = acf.groupBy($"event_type").agg(countDistinct($"lag").as("lags"))
    assert(grid.filter($"lags" =!= 7).count() === 0, "each series reports lags 1..7")
    acf.unpersist()
  }

  test("theil_sen: median lies within the slope range and pair counts are triangular") {
    val ts = TimeSeries2.theilSen(spark, sf).cache()
    // n_pairs = m(m-1)/2 for an integer month count m
    val bad = ts.filter(
      sqrt($"n_pairs" * 8 + 1) =!= floor(sqrt($"n_pairs" * 8 + 1))).count()
    assert(bad === 0, "n_pairs must be a triangular number")
    assert(ts.filter($"sen_slope".isNull).count() === 0)
    ts.unpersist()
  }

  test("adamic_adar: predictions are non-edges with score bounded by common-neighbor count") {
    val aa = Graph.adamicAdar(spark, sf).cache()
    // score per common neighbor is in [1/ln(maxdeg), 1/ln(2)]
    assert(aa.filter($"aa_score" > $"n_common" * 1.4427).count() === 0)
    assert(aa.filter($"aa_score" <= 0).count() === 0)
    // no predicted pair is an existing repeat-co-purchase edge
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    val edges = li.as("a").join(li.as("b"), $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
      .groupBy($"a.pk".as("pa"), $"b.pk".as("pb"))
      .agg(count(lit(1)).as("c")).filter($"c" >= 2)
    assert(aa.join(edges, aa("u") === edges("pa") && aa("v") === edges("pb"))
      .count() === 0, "a predicted link must not already exist")
    aa.unpersist()
  }

  test("basket_rules: lift is direction-symmetric, confidence bounded, support floor holds") {
    val br = Graph.basketRules(spark, sf).cache()
    assert(br.filter($"confidence" <= 0 || $"confidence" > 1).count() === 0)
    assert(br.filter($"support_cnt" < 2).count() === 0)
    // both directions of a pair share the lift value when both ranked
    val sym = br.as("x").join(br.as("y"),
      $"x.antecedent" === $"y.consequent" && $"x.consequent" === $"y.antecedent")
    assert(sym.filter($"x.lift" =!= $"y.lift").count() === 0,
      "lift must be symmetric across rule direction")
    br.unpersist()
  }
}
