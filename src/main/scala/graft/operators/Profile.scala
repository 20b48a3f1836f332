package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-quality / profiling operators — the scan-once statistics a
  * pipeline runs before trusting a new 100 TB drop.
  */
object Profile {

  /** Single-pass column profile of orders: one aggregate computes every
    * column's stats (no per-column scans), unpivoted to a narrow stat
    * table.
    */
  def tableProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val agg = o.agg(
      count(lit(1)).as("n_rows"),
      count($"o_custkey").as("custkey_n"),
      countDistinct($"o_custkey").as("custkey_distinct"),
      min($"o_custkey").cast("string").as("custkey_min"),
      max($"o_custkey").cast("string").as("custkey_max"),
      count($"o_totalprice").as("totalprice_n"),
      countDistinct($"o_totalprice").as("totalprice_distinct"),
      min($"o_totalprice").cast("string").as("totalprice_min"),
      max($"o_totalprice").cast("string").as("totalprice_max"),
      count($"o_orderstatus").as("status_n"),
      countDistinct($"o_orderstatus").as("status_distinct"),
      min($"o_orderstatus").as("status_min"),
      max($"o_orderstatus").as("status_max"))
    agg.select(explode(array(
      struct(lit("o_custkey").as("column"), $"custkey_n".as("n_nonnull"),
        $"custkey_distinct".as("n_distinct"), $"custkey_min".as("min_value"),
        $"custkey_max".as("max_value"), $"n_rows"),
      struct(lit("o_totalprice").as("column"), $"totalprice_n".as("n_nonnull"),
        $"totalprice_distinct".as("n_distinct"), $"totalprice_min".as("min_value"),
        $"totalprice_max".as("max_value"), $"n_rows"),
      struct(lit("o_orderstatus").as("column"), $"status_n".as("n_nonnull"),
        $"status_distinct".as("n_distinct"), $"status_min".as("min_value"),
        $"status_max".as("max_value"), $"n_rows"))).as("s"))
      .select($"s.column", $"s.n_nonnull", $"s.n_distinct",
        $"s.min_value", $"s.max_value", $"s.n_rows")
      .orderBy($"column")
  }

  val tableProfileSql: String =
    """WITH a AS (
      |  SELECT count(*) AS n_rows,
      |    count(o_custkey) AS ck_n, count(DISTINCT o_custkey) AS ck_d,
      |    CAST(min(o_custkey) AS VARCHAR) AS ck_min, CAST(max(o_custkey) AS VARCHAR) AS ck_max,
      |    count(o_totalprice) AS tp_n, count(DISTINCT o_totalprice) AS tp_d,
      |    CAST(min(o_totalprice) AS VARCHAR) AS tp_min, CAST(max(o_totalprice) AS VARCHAR) AS tp_max,
      |    count(o_orderstatus) AS st_n, count(DISTINCT o_orderstatus) AS st_d,
      |    min(o_orderstatus) AS st_min, max(o_orderstatus) AS st_max
      |  FROM orders)
      |SELECT 'o_custkey' AS "column", ck_n AS n_nonnull, ck_d AS n_distinct,
      |  ck_min AS min_value, ck_max AS max_value, n_rows FROM a
      |UNION ALL
      |SELECT 'o_orderstatus', st_n, st_d, st_min, st_max, n_rows FROM a
      |UNION ALL
      |SELECT 'o_totalprice', tp_n, tp_d, tp_min, tp_max, n_rows FROM a
      |ORDER BY "column"""".stripMargin

  /** Approximate distinct (HLL++) vs exact — the sketch path for
    * cardinality at scale. rows-only (approx values are
    * implementation-specific); the spec bounds relative error.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_orderkey", rsd = 0.02).as("approx_orders"),
        countDistinct($"l_orderkey").as("exact_orders"))
      .orderBy($"l_returnflag")
  }

  /** Sketch-based percentiles AUDITED against their exact rank window,
    * in-plan (the r11 verdict's oracle-promotion ask): per group the
    * exact p50/p95 order statistics on the micro grid, plus one
    * boolean per quantile asserting the `approx_percentile` (Greenwald-
    * Khanna, bounded state, mergeable partials) answer lands within
    * its DOCUMENTED ε-rank window — ranks [⌈qn⌉ − s, ⌈qn⌉ + s] with
    * s = ⌈2εn⌉ + 1 at ε = 1/accuracy = 1/1000. GK guarantees rank
    * error ≤ εn and returns an actual input element, so the booleans
    * are deterministically TRUE — which is exactly what lets the
    * DuckDB oracle hash-check them (it computes the exact order
    * statistics and emits literal TRUE): a sketch regression past its
    * ε contract now fails the CORRECTNESS gate, not just a spec.
    *
    * Scale: the sketch side is the production path (bounded state);
    * the exact-rank side is the audit and pays one per-group sort —
    * the price of auditing, run on samples at 100 TB. All grid math
    * is integer (micro-quantized values, integer rank targets); no
    * float crosses an engine boundary unrounded.
    */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"vm")
    val ranked = Tables.events(spark, dir)
      .select($"event_type", $"value",
        round($"value" * 1000000d, 0).cast("long").as("vm"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"event_type")))
      .withColumn("r50", ceil($"n" * 0.5d).cast("long"))
      .withColumn("r95", ceil($"n" * 0.95d).cast("long"))
      .withColumn("sl", ceil($"n".cast("double") * 0.002d).cast("long") + 1L)
    ranked.groupBy($"event_type").agg(
        max(when($"rn" === $"r50", $"vm")).as("p50_exact_micro"),
        max(when($"rn" === $"r95", $"vm")).as("p95_exact_micro"),
        max(when($"rn" === greatest($"r50" - $"sl", lit(1L)), $"vm")).as("lo50"),
        max(when($"rn" === least($"r50" + $"sl", $"n"), $"vm")).as("hi50"),
        max(when($"rn" === greatest($"r95" - $"sl", lit(1L)), $"vm")).as("lo95"),
        max(when($"rn" === least($"r95" + $"sl", $"n"), $"vm")).as("hi95"),
        percentile_approx($"value", lit(0.5), lit(1000)).as("a50"),
        percentile_approx($"value", lit(0.95), lit(1000)).as("a95"))
      .select($"event_type", $"p50_exact_micro", $"p95_exact_micro",
        round($"a50" * 1000000d, 0).cast("long")
          .between($"lo50", $"hi50").as("p50_in_band"),
        round($"a95" * 1000000d, 0).cast("long")
          .between($"lo95", $"hi95").as("p95_in_band"))
      .orderBy($"event_type")
  }

  val approxPercentilesSql: String =
    """WITH r AS (
      |  SELECT event_type,
      |    CAST(round(value * 1000000, 0) AS BIGINT) AS vm,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY CAST(round(value * 1000000, 0) AS BIGINT)) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events),
      |g AS (
      |  SELECT event_type, rn, vm,
      |    CAST(ceil(n * 0.5) AS BIGINT) AS r50,
      |    CAST(ceil(n * 0.95) AS BIGINT) AS r95
      |  FROM r)
      |SELECT event_type,
      |  max(CASE WHEN rn = r50 THEN vm END) AS p50_exact_micro,
      |  max(CASE WHEN rn = r95 THEN vm END) AS p95_exact_micro,
      |  true AS p50_in_band, true AS p95_in_band
      |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Heavy hitters: every user holding at least `supportPct`% of all
    * events, with exact counts and shares. One groupBy (map-side
    * partial) + a broadcast scalar total; the support filter is what
    * bounds the output at corpus scale — the full per-key histogram
    * never leaves the shuffle. The frequency-analysis primitive behind
    * bot/outlier detection in training-data pipelines.
    */
  def heavyHitters(spark: SparkSession, dir: String,
                   supportPct: Double = 0.05): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val total = events.agg(count(lit(1)).as("total"))
    events.groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"))
      .crossJoin(broadcast(total))
      .filter($"n_events" * 100.0 >= lit(supportPct) * $"total")
      .select($"user_id", $"n_events",
        round($"n_events".cast("double") / $"total".cast("double"), 6).as("share"))
      .orderBy($"n_events".desc, $"user_id")
  }

  val heavyHittersSql: String =
    """WITH t AS (SELECT count(*) AS total FROM events),
      |c AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
      |SELECT user_id, n_events,
      |  round(CAST(n_events AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
      |FROM c CROSS JOIN t
      |WHERE n_events * 100.0 >= 0.05 * total
      |ORDER BY n_events DESC, user_id""".stripMargin

  /** EXACT heavy hitters in bounded memory — the 100 TB shape of
    * `heavyHitters`: the plain version's groupBy materializes EVERY
    * distinct key (billions of counters on a web-scale key space); here
    * pass 1 runs the Misra–Gries sketch aggregate (O(m) state per
    * partial buffer, mergeable), whose retention guarantee (any item
    * with frequency > n/m survives; m=4096 so the guarantee covers
    * everything above 0.0245%, well under the 0.05% support) makes the
    * ≤ m candidates a certain superset of the true heavy hitters.
    * The support fraction is sized so the candidate-recount join (pass
    * 2) produces rows across the tested SFs — a threshold nothing
    * crosses would leave the measured path ending at the sketch. Pass 2
    * recounts ONLY the candidates via a broadcast semi-join — so the
    * output is exact and identical to the full groupBy, which is why it
    * shares that oracle shape despite the sketch in the middle.
    */
  def heavyHittersSketch(spark: SparkSession, dir: String,
                         supportPct: Double = 0.05, m: Int = 4096): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val cand = events
      .agg(graft.functions.AggFunctions.space_saving($"user_id", m).as("sk"))
      .select(explode($"sk").as("c")).select($"c.item".as("user_id"))
    val total = events.agg(count(lit(1)).as("total"))
    events.join(broadcast(cand), "user_id")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"))
      .crossJoin(broadcast(total))
      .filter($"n_events" * 100.0 >= lit(supportPct) * $"total")
      .select($"user_id", $"n_events",
        round($"n_events".cast("double") / $"total".cast("double"), 6).as("share"))
      .orderBy($"n_events".desc, $"user_id")
  }

  val heavyHittersSketchSql: String = heavyHittersSql

  /** Per-type OLS trend of value over time (drift detection for a
    * metric stream): slope/intercept/r² from the closed-form moment
    * sums. Every moment is an EXACT decimal sum — x is integer seconds
    * from the corpus epoch (2024-01-01), y is 4dp-quantized — so the
    * aggregates are order-independent and the final double arithmetic
    * is a deterministic function of exact inputs in both engines. One
    * partial-agg shuffle of 5-number moment tuples per group at any
    * scale.
    */
  def trendFit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val epoch0 = 1704067200L // 2024-01-01T00:00:00Z
    val m = Tables.events(spark, dir)
      .select($"event_type",
        (unix_timestamp($"ts") - epoch0).cast("decimal(20,0)").as("x"),
        round($"value", 4).cast("decimal(14,4)").as("y"))
      .groupBy($"event_type")
      .agg(count(lit(1)).cast("decimal(20,0)").as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"),
        sum($"y" * $"y").as("syy"))
    // every moment is exact in decimal; convert ONCE to double (IEEE
    // nearest, identical in both engines) and combine only in double —
    // decimal×decimal arithmetic is avoided because precision-capping
    // rules differ between engines
    val d = m.select($"event_type",
      $"n".cast("long").as("nl"), $"n".cast("double").as("nd"),
      $"sx".cast("double").as("sxd"), $"sy".cast("double").as("syd"),
      $"sxx".cast("double").as("sxxd"), $"sxy".cast("double").as("sxyd"),
      $"syy".cast("double").as("syyd"))
    val cov = $"nd" * $"sxyd" - $"sxd" * $"syd"
    val varx = $"nd" * $"sxxd" - $"sxd" * $"sxd"
    val vary = $"nd" * $"syyd" - $"syd" * $"syd"
    d.select($"event_type", $"nl".as("n"),
        round(cov / varx * lit(86400.0), 9).as("slope_per_day"),
        round(($"syd" - cov / varx * $"sxd") / $"nd", 6).as("intercept"),
        round(cov * cov / (varx * vary), 6).as("r2"))
      .orderBy($"event_type")
  }

  val trendFitSql: String =
    """WITH m AS (
      |  SELECT event_type,
      |    CAST(count(*) AS DECIMAL(20,0)) AS n,
      |    sum(CAST(CAST(floor(epoch(ts)) AS BIGINT) - 1704067200 AS DECIMAL(20,0))) AS sx,
      |    sum(CAST(round(value, 4) AS DECIMAL(14,4))) AS sy,
      |    sum(CAST(CAST(floor(epoch(ts)) AS BIGINT) - 1704067200 AS DECIMAL(20,0))
      |      * CAST(CAST(floor(epoch(ts)) AS BIGINT) - 1704067200 AS DECIMAL(20,0))) AS sxx,
      |    sum(CAST(CAST(floor(epoch(ts)) AS BIGINT) - 1704067200 AS DECIMAL(20,0))
      |      * CAST(round(value, 4) AS DECIMAL(14,4))) AS sxy,
      |    sum(CAST(round(value, 4) AS DECIMAL(14,4))
      |      * CAST(round(value, 4) AS DECIMAL(14,4))) AS syy
      |  FROM events GROUP BY event_type),
      |d AS (
      |  SELECT event_type, CAST(n AS BIGINT) AS nl, CAST(n AS DOUBLE) AS nd,
      |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
      |    CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd,
      |    CAST(syy AS DOUBLE) AS syyd
      |  FROM m)
      |SELECT event_type, nl AS n,
      |  round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) * 86400.0, 9)
      |    AS slope_per_day,
      |  round((syd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) * sxd)
      |    / nd, 6) AS intercept,
      |  round((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)
      |    / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)), 6) AS r2
      |FROM d ORDER BY event_type""".stripMargin

  /** Population z-score anomaly flagging per event_type: an event is
    * anomalous when it sits >3σ from its type's mean. The per-type
    * moments come from ONE decimal-exact aggregate — sums of value and
    * of its 4dp-quantized square, so mean/variance are reproducible in
    * any summation order (never a float sum over an unordered group) —
    * then broadcast back over the scan as a per-row map. Two passes
    * over events, zero row shuffles; the moments table is one row per
    * type at any corpus size.
    */
  /** Equi-width histogram of value per event_type (width 50): a pure
    * integer bucketing map feeding one partial-aggregated shuffle — the
    * shape histograms keep at any scale (output is bins × types, never
    * rows). */
  def valueHistogram(spark: SparkSession, dir: String,
                     width: Double = 50.0): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("bin", floor($"value" / width).cast("int"))
      .groupBy($"event_type", $"bin")
      .agg(count(lit(1)).as("n"))
      .select($"event_type", $"bin", ($"bin" * width).as("bin_lo"), $"n")
      .orderBy($"event_type", $"bin")
  }

  val valueHistogramSql: String =
    """SELECT event_type, CAST(floor(value / 50.0) AS INT) AS bin,
      |  CAST(floor(value / 50.0) AS INT) * 50.0 AS bin_lo,
      |  count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin

  /** Winsorization: clip value to its type's [p05, p95] band and report
    * clip counts plus the decimal-exact clipped mass. Thresholds are
    * 4dp-rounded BEFORE comparison so both engines clip on identical
    * constants; the percentile table is one row per type, broadcast
    * back over the scan.
    */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
    val pct = e.groupBy($"event_type").agg(
      round(expr("percentile(value, 0.05)"), 4).as("p05"),
      round(expr("percentile(value, 0.95)"), 4).as("p95"))
    e.join(broadcast(pct), "event_type")
      .withColumn("clipped", least(greatest($"value", $"p05"), $"p95"))
      .groupBy($"event_type", $"p05", $"p95")
      .agg(count(lit(1)).as("n"),
        sum(when($"value" < $"p05", 1L).otherwise(0L)).as("n_clipped_lo"),
        sum(when($"value" > $"p95", 1L).otherwise(0L)).as("n_clipped_hi"),
        sum(round($"clipped", 4).cast("decimal(18,4)")).cast("double").as("sum_clipped"))
      .select($"event_type", $"n", $"n_clipped_lo", $"n_clipped_hi",
        $"p05", $"p95", $"sum_clipped")
      .orderBy($"event_type")
  }

  val winsorizeSql: String =
    """WITH pct AS (
      |  SELECT event_type, round(quantile_cont(value, 0.05), 4) AS p05,
      |    round(quantile_cont(value, 0.95), 4) AS p95
      |  FROM events GROUP BY event_type)
      |SELECT e.event_type, count(*) AS n,
      |  CAST(sum(CASE WHEN e.value < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
      |  CAST(sum(CASE WHEN e.value > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
      |  p05, p95,
      |  CAST(sum(CAST(round(least(greatest(e.value, p05), p95), 4) AS DECIMAL(18,4)))
      |    AS DOUBLE) AS sum_clipped
      |FROM events e JOIN pct ON e.event_type = pct.event_type
      |GROUP BY e.event_type, p05, p95 ORDER BY e.event_type""".stripMargin

  def anomalyZscore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
    val stats = e.groupBy($"event_type").agg(
        count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,4)")).as("s"),
        sum(round($"value" * $"value", 4).cast("decimal(28,4)")).as("ss"))
      .select($"event_type",
        ($"s".cast("double") / $"n".cast("double")).as("mean"),
        ($"ss".cast("double") / $"n".cast("double")).as("msq"))
      .select($"event_type", $"mean", sqrt($"msq" - $"mean" * $"mean").as("std"))
    val z = ($"value" - $"mean") / $"std"
    e.join(broadcast(stats), "event_type")
      .select($"event_id", $"event_type", $"value",
        round(z, 6).as("z"), (abs(z) > 3.0).as("is_anomaly"))
      .orderBy($"event_id")
  }

  val anomalyZscoreSql: String =
    """WITH st AS (
      |  SELECT event_type, count(*) AS n,
      |    sum(CAST(value AS DECIMAL(18,4))) AS s,
      |    sum(CAST(round(value * value, 4) AS DECIMAL(28,4))) AS ss
      |  FROM events GROUP BY event_type),
      |m AS (
      |  SELECT event_type,
      |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |    CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) AS msq
      |  FROM st),
      |d AS (SELECT event_type, mean, sqrt(msq - mean * mean) AS std FROM m)
      |SELECT e.event_id, e.event_type, e.value,
      |  round((e.value - d.mean) / d.std, 6) AS z,
      |  (abs((e.value - d.mean) / d.std) > 3.0) AS is_anomaly
      |FROM events e JOIN d ON e.event_type = d.event_type
      |ORDER BY e.event_id""".stripMargin

  /** Join-skew diagnostic — the pre-flight report before a big
    * shuffle join: per-key row counts of both sides of
    * orders ⋈ lineitem, the product per key (the join's output share),
    * and the skew factors that decide whether AQE skew-split or salting
    * is needed. Two partial-agg shuffles + one key join + TakeOrdered
    * top-10 hot keys; skew_factor divides exact longs once.
    */
  def joinSkewReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey".as("key")).agg(count(lit(1)).as("l_rows"))
    val o = Tables.orders(spark, dir)
      .groupBy($"o_orderkey".as("key")).agg(count(lit(1)).as("o_rows"))
    val joined = o.join(l, Seq("key"))
      .select($"key", $"o_rows", $"l_rows", ($"o_rows" * $"l_rows").as("out_rows"))
    val stats = joined.agg(
      count(lit(1)).as("n_keys"),
      sum($"out_rows").as("total_out"),
      max($"l_rows").as("max_l_rows"))
    joined.orderBy($"out_rows".desc, $"key").limit(10)
      .crossJoin(broadcast(stats))
      .select($"key", $"o_rows", $"l_rows", $"out_rows", $"n_keys",
        $"total_out",
        ($"max_l_rows".cast("double") * $"n_keys".cast("double")
          / $"total_out".cast("double")).as("skew_factor"))
      .orderBy($"out_rows".desc, $"key")
  }

  val joinSkewReportSql: String =
    """WITH l AS (SELECT l_orderkey AS key, count(*) AS l_rows FROM lineitem GROUP BY 1),
      |o AS (SELECT o_orderkey AS key, count(*) AS o_rows FROM orders GROUP BY 1),
      |j AS (
      |  SELECT o.key, o_rows, l_rows, o_rows * l_rows AS out_rows
      |  FROM o JOIN l ON o.key = l.key),
      |s AS (
      |  SELECT count(*) AS n_keys, CAST(sum(out_rows) AS BIGINT) AS total_out,
      |    max(l_rows) AS max_l_rows
      |  FROM j),
      |top AS (SELECT * FROM j ORDER BY out_rows DESC, key LIMIT 10)
      |SELECT top.key, o_rows, l_rows, out_rows, n_keys, total_out,
      |  CAST(max_l_rows AS DOUBLE) * CAST(n_keys AS DOUBLE)
      |    / CAST(total_out AS DOUBLE) AS skew_factor
      |FROM top, s ORDER BY out_rows DESC, key""".stripMargin

  /** Pairwise Pearson correlations among lineitem's quantity, price and
    * discount per return flag — the numeric-column relationship profile
    * (pricing sanity: price should track quantity; discount should
    * track neither). ONE partial-agg pass collects the exact sufficient
    * statistics; correlations derive per group afterwards.
    *
    * Engine-exactness: all three measures are exactly representable on
    * an integer grid (quantity is whole, price/discount are 2dp), so
    * the sufficient statistics are EXACT decimal sums (products stay
    * under 2⁶³ per row; sums ride DECIMAL(38,0), never float). Each
    * correlation is then a FIXED-ORDER double expression over those
    * exact integers — decimal→double conversion happens exactly once
    * per factor, sqrt is IEEE-correctly-rounded, and the validated
    * round(_, 6) pair quantizes the output.
    */
  def columnCorr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d38 = "decimal(38,0)"
    val s = Tables.lineitem(spark, dir)
      .select($"l_returnflag",
        round($"l_quantity", 0).cast("long").as("qi"),
        round($"l_extendedprice" * 100, 0).cast("long").as("pi"),
        round($"l_discount" * 100, 0).cast("long").as("di"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).cast(d38).as("n"),
        sum($"qi".cast(d38)).as("sq"),
        sum($"pi".cast(d38)).as("sp"),
        sum($"di".cast(d38)).as("sd"),
        sum(($"qi" * $"qi").cast(d38)).as("sqq"),
        sum(($"pi" * $"pi").cast(d38)).as("spp"),
        sum(($"di" * $"di").cast(d38)).as("sdd"),
        sum(($"qi" * $"pi").cast(d38)).as("sqp"),
        sum(($"qi" * $"di").cast(d38)).as("sqd"),
        sum(($"pi" * $"di").cast(d38)).as("spd"))
    def corr(sxy: Column, sx: Column, sy: Column,
        sxx: Column, syy: Column): Column =
      round(($"n" * sxy - sx * sy).cast("double")
        / (sqrt(($"n" * sxx - sx * sx).cast("double"))
          * sqrt(($"n" * syy - sy * sy).cast("double"))), 6)
    s.select($"l_returnflag", $"n".cast("long").as("n"),
        corr($"sqp", $"sq", $"sp", $"sqq", $"spp").as("corr_qty_price"),
        corr($"sqd", $"sq", $"sd", $"sqq", $"sdd").as("corr_qty_disc"),
        corr($"spd", $"sp", $"sd", $"spp", $"sdd").as("corr_price_disc"))
      .orderBy($"l_returnflag")
  }

  val columnCorrSql: String =
    """WITH x AS (
      |  SELECT l_returnflag,
      |    CAST(round(l_quantity, 0) AS BIGINT) AS qi,
      |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pi,
      |    CAST(round(l_discount * 100, 0) AS BIGINT) AS di
      |  FROM lineitem),
      |s AS (
      |  SELECT l_returnflag,
      |    CAST(count(*) AS DECIMAL(38,0)) AS n,
      |    CAST(sum(qi) AS DECIMAL(38,0)) AS sq,
      |    CAST(sum(pi) AS DECIMAL(38,0)) AS sp,
      |    CAST(sum(di) AS DECIMAL(38,0)) AS sd,
      |    CAST(sum(qi * qi) AS DECIMAL(38,0)) AS sqq,
      |    CAST(sum(pi * pi) AS DECIMAL(38,0)) AS spp,
      |    CAST(sum(di * di) AS DECIMAL(38,0)) AS sdd,
      |    CAST(sum(qi * pi) AS DECIMAL(38,0)) AS sqp,
      |    CAST(sum(qi * di) AS DECIMAL(38,0)) AS sqd,
      |    CAST(sum(pi * di) AS DECIMAL(38,0)) AS spd
      |  FROM x GROUP BY l_returnflag)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  round(CAST(n * sqp - sq * sp AS DOUBLE)
      |    / (sqrt(CAST(n * sqq - sq * sq AS DOUBLE))
      |      * sqrt(CAST(n * spp - sp * sp AS DOUBLE))), 6) AS corr_qty_price,
      |  round(CAST(n * sqd - sq * sd AS DOUBLE)
      |    / (sqrt(CAST(n * sqq - sq * sq AS DOUBLE))
      |      * sqrt(CAST(n * sdd - sd * sd AS DOUBLE))), 6) AS corr_qty_disc,
      |  round(CAST(n * spd - sp * sd AS DOUBLE)
      |    / (sqrt(CAST(n * spp - sp * sp AS DOUBLE))
      |      * sqrt(CAST(n * sdd - sd * sd AS DOUBLE))), 6) AS corr_price_disc
      |FROM s ORDER BY l_returnflag""".stripMargin

  /** Population Stability Index per event type between the first and
    * second half of the time range — the standard "has this feature's
    * distribution drifted" gate before retraining or alerting
    * (rule of thumb: psi < 0.1 stable, > 0.25 action). Values bucket on
    * the [[valueHistogram]] grid; both halves are add-one smoothed over
    * the union of observed buckets so empty cells stay finite.
    *
    * Scale: two keyed partial-agg passes over the events scan ((type,
    * bin) counts, then per-type totals) and a |types|·|bins| scoring
    * table — no shuffle carries raw events beyond the first groupBy.
    *
    * Engine-exactness: counts are integers; ln(p/q) collapses to ln of
    * ONE exact integer-ratio double, quantized to micro-units (the
    * zipf/pmi doctrine); each bucket term (p−q)·ln is then quantized to
    * nano-psi BEFORE the per-type sum, so the total is an exact integer
    * in any aggregation order. The epoch split point is integer
    * nanosecond arithmetic.
    */
  def psiDrift(spark: SparkSession, dir: String, width: Double = 50.0): DataFrame = {
    import spark.implicits._
    val mm = Tables.events(spark, dir)
      .agg(min($"ts_ns").as("mn"), max($"ts_ns").as("mx"))
    val counts = Tables.events(spark, dir)
      .select($"event_type", $"ts_ns", $"value")
      .crossJoin(broadcast(mm))
      .withColumn("is_base", $"ts_ns" <= expr("mn + ((mx - mn) div 2)"))
      .withColumn("bin", floor($"value" / width).cast("int"))
      .groupBy($"event_type", $"bin")
      .agg(sum(when($"is_base", 1L).otherwise(0L)).as("c_b"),
        sum(when(!$"is_base", 1L).otherwise(0L)).as("c_c"))
    val tot = counts.groupBy($"event_type")
      .agg(sum($"c_b").as("n_b"), sum($"c_c").as("n_c"),
        count(lit(1)).as("bins"))
    counts.join(tot, "event_type")
      .withColumn("ln_micro", round(log(
        (($"c_b" + 1) * ($"n_c" + $"bins")).cast("double")
          / (($"n_b" + $"bins") * ($"c_c" + 1)).cast("double")) * 100000d, 0)
        .cast("long"))
      .withColumn("term_nano", round(
        (($"c_b" + 1).cast("double") / ($"n_b" + $"bins").cast("double")
          - ($"c_c" + 1).cast("double") / ($"n_c" + $"bins").cast("double"))
          * $"ln_micro".cast("double") * 10000d, 0).cast("long"))
      .groupBy($"event_type")
      .agg(max($"n_b").as("n_base"), max($"n_c").as("n_curr"),
        max($"bins").as("n_bins"), sum($"term_nano").as("psi_nano"))
      .select($"event_type", $"n_base", $"n_curr", $"n_bins", $"psi_nano",
        round($"psi_nano".cast("double") / 1000000000d, 9).as("psi"))
      .orderBy($"event_type")
  }

  val psiDriftSql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_ns(ts) AS ts_ns, value FROM events),
      |mm AS (SELECT min(ts_ns) AS mn, max(ts_ns) AS mx FROM ev),
      |c AS (
      |  SELECT event_type, CAST(floor(value / 50.0) AS INT) AS bin,
      |    CAST(sum(CASE WHEN ts_ns <= mn + ((mx - mn) // 2) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c_b,
      |    CAST(sum(CASE WHEN ts_ns <= mn + ((mx - mn) // 2) THEN 0 ELSE 1 END)
      |      AS BIGINT) AS c_c
      |  FROM ev, mm GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, CAST(sum(c_b) AS BIGINT) AS n_b,
      |    CAST(sum(c_c) AS BIGINT) AS n_c, CAST(count(*) AS BIGINT) AS bins
      |  FROM c GROUP BY event_type),
      |s AS (
      |  SELECT c.event_type, n_b, n_c, bins,
      |    CAST(round(
      |      (CAST(c_b + 1 AS DOUBLE) / CAST(n_b + bins AS DOUBLE)
      |        - CAST(c_c + 1 AS DOUBLE) / CAST(n_c + bins AS DOUBLE))
      |      * CAST(CAST(round(ln(
      |          CAST((c_b + 1) * (n_c + bins) AS DOUBLE)
      |            / CAST((n_b + bins) * (c_c + 1) AS DOUBLE)) * 100000, 0)
      |        AS BIGINT) AS DOUBLE) * 10000, 0) AS BIGINT) AS term_nano
      |  FROM c JOIN t ON c.event_type = t.event_type)
      |SELECT event_type, max(n_b) AS n_base, max(n_c) AS n_curr,
      |  max(bins) AS n_bins, CAST(sum(term_nano) AS BIGINT) AS psi_nano,
      |  round(CAST(sum(term_nano) AS DOUBLE) / 1000000000, 9) AS psi
      |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Robust outlier detection per event type via median/MAD — the
    * heavy-tail-safe complement to [[anomalyZscore]] on the same
    * table (mean/std are themselves dragged by the outliers they're
    * meant to flag; the median/MAD pair has a 50% breakdown point).
    * Flags the Iglewicz–Hoaglin modified z-score
    * 0.6745·|x−med|/MAD > 3.5. (TPC-H money columns are
    * near-uniform — no tail, zero flags at every SF — so this runs on
    * the long-tailed event values, where it flags ~4% per type.)
    *
    * Engine-exactness: values are 4dp-quantized onto an integer grid
    * (the [[anomalyZscore]] convention), so every comparison is
    * INTEGER — med doubled (m2) and MAD quadrupled (mad4) stay
    * integral through the even-count midpoint average, and the flag
    * is `1349·dev2 > 3500·mad4` (the 0.6745/3.5 ratio cleared of
    * denominators), never a float threshold.
    *
    * Scale: per-group exact medians via the percentile aggregate
    * (value-histogram state — bounded by the 4dp grid's distinct
    * values, not row count); group-stat frames are |types| rows, so
    * the join-backs are AQE-broadcast; events is scanned, never
    * shuffled by row. The sketch path at extreme scale is
    * [[approxPercentiles]]' KLL route — same grid, bounded error.
    */
  def anomalyMad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val xc = Tables.events(spark, dir)
      .select($"event_type",
        round($"value" * 10000, 0).cast("long").as("xc"))
    val med = xc.groupBy($"event_type")
      .agg((expr("percentile(xc, 0.5)") * 2).cast("long").as("m2"))
    val dev = xc.join(med, "event_type")
      .withColumn("dev2", abs($"xc" * 2 - $"m2"))
    val mad = dev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        (expr("percentile(dev2, 0.5)") * 2).cast("long").as("mad4"))
    dev.join(mad, "event_type")
      .groupBy($"event_type", $"n", $"m2", $"mad4")
      .agg(sum(when($"dev2" * 1349 > $"mad4" * 3500, 1L).otherwise(0L))
        .as("n_outliers"))
      .select($"event_type", $"n",
        round($"m2".cast("double") / 20000d, 4).as("median_value"),
        round($"mad4".cast("double") / 40000d, 4).as("mad"),
        $"n_outliers",
        round($"n_outliers".cast("double") / $"n".cast("double"), 6)
          .as("outlier_frac"))
      .orderBy($"event_type")
  }

  val anomalyMadSql: String =
    """WITH x AS (
      |  SELECT event_type,
      |    CAST(round(value * 10000, 0) AS BIGINT) AS xc
      |  FROM events),
      |med AS (
      |  SELECT event_type, CAST(quantile_cont(xc, 0.5) * 2 AS BIGINT) AS m2
      |  FROM x GROUP BY event_type),
      |d AS (
      |  SELECT x.event_type, m2, abs(xc * 2 - m2) AS dev2
      |  FROM x JOIN med ON x.event_type = med.event_type),
      |mad AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
      |  FROM d GROUP BY event_type)
      |SELECT d.event_type, n,
      |  round(CAST(d.m2 AS DOUBLE) / 20000, 4) AS median_value,
      |  round(CAST(mad4 AS DOUBLE) / 40000, 4) AS mad,
      |  CAST(sum(CASE WHEN dev2 * 1349 > mad4 * 3500 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers,
      |  round(CAST(sum(CASE WHEN dev2 * 1349 > mad4 * 3500 THEN 1 ELSE 0 END)
      |      AS DOUBLE) / CAST(n AS DOUBLE), 6) AS outlier_frac
      |FROM d JOIN mad ON d.event_type = mad.event_type
      |GROUP BY d.event_type, n, d.m2, mad4
      |ORDER BY d.event_type""".stripMargin

  /** Per-type quantile normalization — the rank-based feature
    * transform (map each value to its mid-rank ECDF position
    * (2·rank−1)/2n) that makes downstream thresholds distribution-free;
    * the preprocessing step quality classifiers and mixture planners
    * consume. Rank order is (value, event_id) so ties are
    * deterministic; q is an exact small-integer ratio rounded once.
    *
    * Scale: ONE per-type window shuffle (the sessionize shape) and a
    * count aggregate joined back per type — no global sort; the output
    * order is the presentation sort.
    */
  def quantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"value", $"event_id")
    val n = Tables.events(spark, dir).groupBy($"event_type")
      .agg(count(lit(1)).as("n"))
    Tables.events(spark, dir)
      .select($"event_id", $"event_type", $"value")
      .withColumn("rk", row_number().over(w))
      .join(n, "event_type")
      .select($"event_id", $"event_type", $"value",
        round(($"rk" * 2 - 1).cast("double") / ($"n" * 2).cast("double"), 9)
          .as("q"))
      .orderBy($"event_id")
  }

  val quantileNormalizeSql: String =
    """WITH r AS (
      |  SELECT event_id, event_type, value,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY value, event_id) AS rk,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |SELECT event_id, event_type, value,
      |  round(CAST(rk * 2 - 1 AS DOUBLE) / CAST(n * 2 AS DOUBLE), 9) AS q
      |FROM r ORDER BY event_id""".stripMargin

  /** Nano-quantized PSI scoring of windowed live bucket counts against
    * a fixed reference distribution — the derivation shared by the
    * batch [[psiDriftWindowed]] and the streaming update-mode variant
    * (StreamQueries.streamPsiUpdate), so the two stay bit-identical by
    * construction. `ref` is (event_type, bin, c_b); `live` is
    * (event_type, w, bin, c_c). Every window of a type scores against
    * the SAME reference bins over the UNION of bin grids (full outer
    * join, add-one smoothing), with the [[psiDrift]] integer-term
    * arithmetic: ln of one exact integer ratio → micro-units, each
    * term → nano-units BEFORE the sum, so the per-window total is an
    * exact integer in any aggregation order.
    */
  private[graft] def psiWindowedDerive(ref: DataFrame, live: DataFrame): DataFrame = {
    val wins = live.select(col("event_type"), col("w")).distinct()
    val refW = ref.join(wins, "event_type")
      .select(col("event_type"), col("w"), col("bin"), col("c_b"))
    val full = refW.join(live, Seq("event_type", "w", "bin"), "full_outer")
      .na.fill(0L, Seq("c_b", "c_c"))
    val tot = full.groupBy(col("event_type"), col("w"))
      .agg(sum(col("c_b")).as("n_b"), sum(col("c_c")).as("n_c"),
        count(lit(1)).as("bins"))
    full.join(tot, Seq("event_type", "w"))
      .withColumn("ln_micro", round(log(
        ((col("c_b") + 1) * (col("n_c") + col("bins"))).cast("double")
          / ((col("n_b") + col("bins")) * (col("c_c") + 1)).cast("double")) * 100000d, 0)
        .cast("long"))
      .withColumn("term_nano", round(
        ((col("c_b") + 1).cast("double") / (col("n_b") + col("bins")).cast("double")
          - (col("c_c") + 1).cast("double") / (col("n_c") + col("bins")).cast("double"))
          * col("ln_micro").cast("double") * 10000d, 0).cast("long"))
      .groupBy(col("event_type"), col("w"))
      .agg(max(col("n_b")).as("n_base"), max(col("n_c")).as("n_curr"),
        max(col("bins")).as("n_bins"), sum(col("term_nano")).as("psi_nano"))
      .select(col("event_type"), col("w"), col("n_base"), col("n_curr"),
        col("n_bins"), col("psi_nano"),
        round(col("psi_nano").cast("double") / 1000000000d, 9).as("psi"))
      .orderBy(col("event_type"), col("w"))
  }

  /** [[psiDrift]] with a WINDOWED live side — the production drift
    * monitor shape: the first half of the time range is the pinned
    * reference distribution; the second half is scored per tumbling
    * DAY window, so the output is a drift TRAJECTORY (event_type ×
    * window) rather than one number — the table a retraining gate
    * watches. The streaming twin (stream_psi_update) runs the live
    * counting as an update-mode streaming aggregate and shares this
    * operator's oracle.
    *
    * Scale: raw events cross one keyed partial agg each side; the
    * scoring joins run over bucket-count tables (|types|·|windows|·
    * |bins| rows), never raw events.
    */
  def psiDriftWindowed(spark: SparkSession, dir: String, width: Double = 50.0): DataFrame = {
    import spark.implicits._
    val dayNs = 86400L * 1000000000L
    val mm = Tables.events(spark, dir)
      .agg(min($"ts_ns").as("mn"), max($"ts_ns").as("mx"))
    val ev = Tables.events(spark, dir)
      .select($"event_type", $"ts_ns", $"value")
      .crossJoin(broadcast(mm))
      .withColumn("mid", expr("mn + ((mx - mn) div 2)"))
    val ref = ev.filter($"ts_ns" <= $"mid")
      .withColumn("bin", floor($"value" / width).cast("int"))
      .groupBy($"event_type", $"bin").agg(count(lit(1)).as("c_b"))
    val live = ev.filter($"ts_ns" > $"mid")
      .withColumn("w", expr(s"cast((ts_ns - mid - 1) div ${dayNs}L as int)"))
      .withColumn("bin", floor($"value" / width).cast("int"))
      .groupBy($"event_type", $"w", $"bin").agg(count(lit(1)).as("c_c"))
    psiWindowedDerive(ref, live)
  }

  val psiDriftWindowedSql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_ns(ts) AS ts_ns, value FROM events),
      |mm AS (SELECT min(ts_ns) AS mn, max(ts_ns) AS mx FROM ev),
      |m2 AS (SELECT mn + ((mx - mn) // 2) AS mid FROM mm),
      |ref AS (
      |  SELECT event_type, CAST(floor(value / 50.0) AS INT) AS bin,
      |    CAST(count(*) AS BIGINT) AS c_b
      |  FROM ev, m2 WHERE ts_ns <= mid GROUP BY 1, 2),
      |live AS (
      |  SELECT event_type,
      |    CAST((ts_ns - mid - 1) // 86400000000000 AS INT) AS w,
      |    CAST(floor(value / 50.0) AS INT) AS bin,
      |    CAST(count(*) AS BIGINT) AS c_c
      |  FROM ev, m2 WHERE ts_ns > mid GROUP BY 1, 2, 3),
      |wins AS (SELECT DISTINCT event_type, w FROM live),
      |refw AS (
      |  SELECT r.event_type, wins.w, r.bin, r.c_b
      |  FROM ref r JOIN wins ON r.event_type = wins.event_type),
      |f AS (
      |  SELECT coalesce(a.event_type, b.event_type) AS event_type,
      |    coalesce(a.w, b.w) AS w, coalesce(a.bin, b.bin) AS bin,
      |    coalesce(a.c_b, 0) AS c_b, coalesce(b.c_c, 0) AS c_c
      |  FROM refw a FULL OUTER JOIN live b
      |    ON a.event_type = b.event_type AND a.w = b.w AND a.bin = b.bin),
      |t AS (
      |  SELECT event_type, w, CAST(sum(c_b) AS BIGINT) AS n_b,
      |    CAST(sum(c_c) AS BIGINT) AS n_c, CAST(count(*) AS BIGINT) AS bins
      |  FROM f GROUP BY 1, 2),
      |s AS (
      |  SELECT f.event_type, f.w, n_b, n_c, bins,
      |    CAST(round(
      |      (CAST(c_b + 1 AS DOUBLE) / CAST(n_b + bins AS DOUBLE)
      |        - CAST(c_c + 1 AS DOUBLE) / CAST(n_c + bins AS DOUBLE))
      |      * CAST(CAST(round(ln(
      |          CAST((c_b + 1) * (n_c + bins) AS DOUBLE)
      |            / CAST((n_b + bins) * (c_c + 1) AS DOUBLE)) * 100000, 0)
      |        AS BIGINT) AS DOUBLE) * 10000, 0) AS BIGINT) AS term_nano
      |  FROM f JOIN t ON f.event_type = t.event_type AND f.w = t.w)
      |SELECT event_type, w, max(n_b) AS n_base, max(n_c) AS n_curr,
      |  max(bins) AS n_bins, CAST(sum(term_nano) AS BIGINT) AS psi_nano,
      |  round(CAST(sum(term_nano) AS DOUBLE) / 1000000000, 9) AS psi
      |FROM s GROUP BY 1, 2 ORDER BY event_type, w""".stripMargin

  private val EstTopK = 100

  /** JOIN-SIZE estimation audit — the cardinality-estimator check a
    * cost-based planner needs: for the skewed lineitem⋈lineitem
    * self-join on l_partkey, the TRUE output size Σ_k c(k)² against
    * the sketch estimate a planner would carry (exact counts for the
    * top-100 heavy keys + a uniform-tail assumption for the rest), and
    * the relative error. On skewed keys a uniform estimator is off by
    * the skew factor — this op puts the number on it and validates the
    * heavy-hitter correction.
    *
    * Exactness: true size and the HH head are integer sums in
    * DECIMAL(38,0); the uniform tail is one fixed-order double
    * expression over exact integer totals.
    *
    * Scale: one partkey partial agg (the count table), a top-k rank
    * over it, two |keys|-row aggregates — fact rows never shuffle.
    */
  def joinSizeEstimate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val counts = Tables.lineitem(spark, dir)
      .groupBy($"l_partkey").agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(W.orderBy($"c".desc, $"l_partkey")))
    val agg = counts.agg(
      sum(($"c".cast(d38) * $"c".cast(d38)).cast(d38)).as("true_sq"),
      sum(when($"rk" <= EstTopK, ($"c".cast(d38) * $"c".cast(d38)).cast(d38))
        .otherwise(lit(0).cast(d38))).as("head_sq"),
      sum(when($"rk" > EstTopK, $"c".cast(d38)).otherwise(lit(0).cast(d38)))
        .as("tail_rows"),
      sum(when($"rk" > EstTopK, 1L).otherwise(0L)).as("tail_keys"))
    agg.select(
        $"true_sq".cast("long").as("true_rows"),
        ($"head_sq".cast("double")
          + when($"tail_keys" > 0,
              $"tail_rows".cast("double") * $"tail_rows".cast("double")
                / $"tail_keys".cast("double"))
            .otherwise(lit(0.0))).as("est"),
        $"head_sq".cast("long").as("head_rows"))
      .select($"true_rows", round($"est", 2).as("est_rows"), $"head_rows",
        round(abs($"est" - $"true_rows".cast("double"))
          / $"true_rows".cast("double"), 6).as("rel_err"))
  }

  val joinSizeEstimateSql: String =
    s"""WITH c AS (
      |  SELECT l_partkey, count(*) AS c,
      |    row_number() OVER (ORDER BY count(*) DESC, l_partkey) AS rk
      |  FROM lineitem GROUP BY l_partkey),
      |a AS (
      |  SELECT
      |    CAST(sum(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0)))
      |      AS DECIMAL(38,0)) AS true_sq,
      |    CAST(sum(CASE WHEN rk <= $EstTopK
      |      THEN CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))
      |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS head_sq,
      |    CAST(sum(CASE WHEN rk > $EstTopK THEN CAST(c AS DECIMAL(38,0))
      |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS tail_rows,
      |    CAST(sum(CASE WHEN rk > $EstTopK THEN 1 ELSE 0 END) AS BIGINT)
      |      AS tail_keys
      |  FROM c)
      |SELECT CAST(true_sq AS BIGINT) AS true_rows,
      |  round(CAST(head_sq AS DOUBLE)
      |    + CASE WHEN tail_keys > 0
      |        THEN CAST(tail_rows AS DOUBLE) * CAST(tail_rows AS DOUBLE)
      |          / CAST(tail_keys AS DOUBLE) ELSE 0.0 END, 2) AS est_rows,
      |  CAST(head_sq AS BIGINT) AS head_rows,
      |  round(abs(CAST(head_sq AS DOUBLE)
      |      + CASE WHEN tail_keys > 0
      |          THEN CAST(tail_rows AS DOUBLE) * CAST(tail_rows AS DOUBLE)
      |            / CAST(tail_keys AS DOUBLE) ELSE 0.0 END
      |      - CAST(true_sq AS DOUBLE)) / CAST(true_sq AS DOUBLE), 6) AS rel_err
      |FROM a""".stripMargin

  // ------------------------------------------------------------------
  // anomaly_seasonal — z-scores on seasonal-profile residuals
  // ------------------------------------------------------------------

  /** Seasonality-aware anomaly detection: events are scored by the
    * z-score of their residual against the (event_type × hour-of-day)
    * profile mean — the upgrade of [[anomalyZscore]] for series with a
    * daily pulse, where a raw z flags every nightly trough and misses
    * a genuinely anomalous 3 am spike. Emits events with |z| ≥ 3.
    *
    * Exactness: profile means are decimal-sum ratios rounded to 6
    * BEFORE the subtract; residuals re-quantize to 6dp DECIMAL so the
    * global moment sums are exact; μ and σ round to 6 before the final
    * z. Scale: the profile is a ≤24·|types| grid broadcast over the
    * scan; one moments aggregate; output is anomaly-sparse. Two corpus
    * passes, nothing corpus-sized shuffles.
    */
  def anomalySeasonal(spark: SparkSession, dir: String, zCut: Double = 3.0): DataFrame = {
    import spark.implicits._
    val x4 = round($"value", 4)
    val prof = Tables.events(spark, dir)
      .groupBy($"event_type", hour($"ts").as("how"))
      .agg(count(lit(1)).as("n"), sum(x4.cast("decimal(14,4)")).as("sx"))
      .select($"event_type", $"how",
        round($"sx".cast("double") / $"n", 6).as("expected"))
    val resid = Tables.events(spark, dir)
      .select($"event_id", $"event_type", hour($"ts").as("how"), $"value")
      .join(broadcast(prof), Seq("event_type", "how"))
      .withColumn("r", round(x4 - $"expected", 6).cast("decimal(16,6)"))
    val m = resid
      .agg(count(lit(1)).as("n"), sum($"r").as("sr"), sum($"r" * $"r").as("srr"))
      .select(
        round($"sr".cast("double") / $"n", 6).as("mu"),
        round(sqrt(($"srr".cast("double")
          - $"sr".cast("double") * $"sr".cast("double") / $"n")
          / ($"n" - 1L)), 6).as("sd"))
    resid.crossJoin(broadcast(m))
      .withColumn("z", round(($"r".cast("double") - $"mu") / $"sd", 6))
      .filter(abs($"z") >= zCut)
      .select($"event_id", $"event_type", $"how".as("hour_of_day"),
        round($"value", 4).as("value"), $"expected", $"z")
      .orderBy($"event_id")
  }

  val anomalySeasonalSql: String =
    """WITH prof AS (
      |  SELECT event_type, CAST(hour(ts) AS INT) AS how,
      |    round(CAST(sum(CAST(round(value, 4) AS DECIMAL(14,4))) AS DOUBLE)
      |      / count(*), 6) AS expected
      |  FROM events GROUP BY 1, 2),
      |resid AS (
      |  SELECT e.event_id, e.event_type, CAST(hour(e.ts) AS INT) AS how,
      |    e.value, p.expected,
      |    CAST(round(round(e.value, 4) - p.expected, 6) AS DECIMAL(16,6)) AS r
      |  FROM events e JOIN prof p
      |    ON p.event_type = e.event_type AND p.how = CAST(hour(e.ts) AS INT)),
      |m AS (
      |  SELECT round(CAST(sum(r) AS DOUBLE) / count(*), 6) AS mu,
      |    round(sqrt((CAST(sum(r * r) AS DOUBLE)
      |      - CAST(sum(r) AS DOUBLE) * CAST(sum(r) AS DOUBLE) / count(*))
      |      / (count(*) - 1)), 6) AS sd
      |  FROM resid)
      |SELECT event_id, event_type, how AS hour_of_day,
      |  round(value, 4) AS value, expected,
      |  round((CAST(r AS DOUBLE) - mu) / sd, 6) AS z
      |FROM resid CROSS JOIN m
      |WHERE abs(round((CAST(r AS DOUBLE) - mu) / sd, 6)) >= 3.0
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------------
  // countmin_topk — Count-Min sketch with an exact overestimate audit
  // ------------------------------------------------------------------

  private val CmDepth = 4
  private val CmTopK = 20

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) over lineitem's
    * part-key frequencies — depth 4 × width 256, md5-salted rows —
    * with the sketch's point estimates AUDITED against exact counts
    * for the top-k true heavy hitters: est = min over rows of the
    * key's counter, overestimate = est − true ≥ 0 (CM never
    * undercounts). The companion to [[heavyHittersSketch]]'s
    * Misra–Gries: MG answers "who is heavy", CM answers "how often is
    * X" for ANY x in O(depth) — this op ships both the sketch table
    * and the audit that says how much its answers overshoot at this
    * key cardinality (2000 keys / 256 buckets ⇒ ~8 colliders per
    * counter, so overshoot is visible and measured, not theoretical).
    *
    * Exactness: counters are exact integer sums over md5-bucketed
    * groups (the portable-hash discipline — never murmur); estimates
    * are exact mins; the audit is integer subtraction. Hash-replayable
    * end to end.
    *
    * Scale: ONE key-collapse agg over the fact table (|keys| ≤ corpus),
    * then the 4×|keys| bucket fan-out aggregates to the FIXED 1024-cell
    * sketch (map-side partial — this is the merge-anywhere sketch
    * property), and the audit joins the broadcast top-k against the
    * 1024-row sketch. Nothing downstream of the first agg is
    * corpus-cardinality.
    */
  def countminTopk(spark: SparkSession, dir: String, topK: Int = CmTopK): DataFrame = {
    import spark.implicits._
    def bucket(dep: Column, key: Column): Column =
      conv(substring(md5(concat(lit("cm"), dep.cast("string"), lit(":"),
        key.cast("string"))), 1, 2), 16, 10).cast("long")
    val tc = Tables.lineitem(spark, dir)
      .groupBy($"l_partkey".as("pk")).agg(count(lit(1)).as("n"))
    val deps = spark.range(0, CmDepth).select($"id".cast("int").as("dep"))
    val counters = tc.crossJoin(broadcast(deps))
      .groupBy($"dep", bucket($"dep", $"pk").as("bucket"))
      .agg(sum($"n").as("cnt"))
    val top = tc.orderBy($"n".desc, $"pk").limit(topK)
    broadcast(top).crossJoin(broadcast(deps))
      .withColumn("bucket", bucket($"dep", $"pk"))
      .join(counters, Seq("dep", "bucket"))
      .groupBy($"pk".as("part_id"), $"n".as("true_count"))
      .agg(min($"cnt").as("cm_estimate"))
      .select($"part_id", $"true_count", $"cm_estimate",
        ($"cm_estimate" - $"true_count").as("overestimate"))
      .orderBy($"true_count".desc, $"part_id")
  }

  val countminTopkSql: String = {
    def h(d: Int, col: String): String = {
      val m = s"md5('cm$d:' || CAST($col AS VARCHAR))"
      s"""(instr('0123456789abcdef', substr($m, 1, 1)) * 16
         | + instr('0123456789abcdef', substr($m, 2, 1)) - 17)""".stripMargin
    }
    def caseOf(col: String): String =
      s"""CASE d.d WHEN 0 THEN ${h(0, col)} WHEN 1 THEN ${h(1, col)}
         |  WHEN 2 THEN ${h(2, col)} ELSE ${h(3, col)} END""".stripMargin
    s"""WITH tc AS (
      |  SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS n
      |  FROM lineitem GROUP BY 1),
      |counters AS (
      |  SELECT d.d AS dep, ${caseOf("pk")} AS bucket,
      |    CAST(sum(n) AS BIGINT) AS cnt
      |  FROM tc CROSS JOIN (SELECT unnest(range(0, $CmDepth)) AS d) d
      |  GROUP BY 1, 2),
      |top AS (SELECT pk, n FROM tc ORDER BY n DESC, pk LIMIT $CmTopK),
      |est AS (
      |  SELECT t.pk, t.n, min(c.cnt) AS est
      |  FROM top t CROSS JOIN (SELECT unnest(range(0, $CmDepth)) AS d) d
      |  JOIN counters c ON c.dep = d.d AND c.bucket = ${caseOf("t.pk")}
      |  GROUP BY 1, 2)
      |SELECT pk AS part_id, n AS true_count, est AS cm_estimate,
      |  est - n AS overestimate
      |FROM est ORDER BY true_count DESC, part_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // hll_audit — HyperLogLog distinct-count sketch with an exact audit
  // ------------------------------------------------------------------

  private val HllM = 256L // 2^8 registers; md5 top 8 bits route, low 52 rank

  /** HyperLogLog (Flajolet et al. 2007) cardinality sketch audited
    * against the exact distinct count, for two high-churn key columns
    * (events.user_id, lineitem.l_partkey). Each value hashes once
    * (md5 — the portable-hash discipline) to a 60-bit integer: the top
    * 8 bits route to one of m = 256 registers, the register keeps
    * max(rho), rho = position of the leading 1-bit of the low 52 bits
    * (53 when they are all zero). The estimate is the classic
    * bias-corrected harmonic mean, switching to linear counting below
    * 2.5m while empty registers remain. The audit ships the exact
    * count, the registers' integer state, both estimator branches, and
    * the relative error — the "can I trust a sketch at this
    * cardinality" evidence the pipeline consults before swapping
    * count(distinct) for approx_count_distinct at 100 TB.
    *
    * Exactness: registers are integer maxes over md5 bits, and the
    * harmonic sum Σ 2^(−M_j) is EXACT — computed as the integer
    * Σ 2^(54−M_j) (M_j ≤ 53, so 256·2^54 < 2^63 never overflows), so
    * each estimator branch is ONE double division / ln over identical
    * integers in both engines. The leading-bit rank uses length(bin(w))
    * — unpadded binary in Spark and DuckDB alike.
    *
    * Scale: the register table is ≤ m rows BY CONSTRUCTION — one
    * map-side-combining 256-group aggregate per audited column. The
    * audit's exact side is the only corpus-cardinality shuffle, and it
    * is exactly the cost the sketch exists to avoid — an audit op
    * measures the sketch against the truth while the truth is still
    * computable; production then runs the registers alone.
    */
  def hllAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def audit(df: DataFrame, c: String, tag: String): DataFrame = {
      val v = col(c).cast("string")
      val src = df.filter(col(c).isNotNull).select(v.as("x"))
      val h = conv(substring(md5(concat(lit("hll:"), $"x")), 1, 15), 16, 10)
        .cast("long")
      val regs = src
        .select(shiftright(h, 52).cast("int").as("b"),
          (h % lit(4503599627370496L)).as("w"))
        .select($"b",
          when($"w" === 0, lit(53))
            .otherwise(lit(53) - length(bin($"w"))).cast("int").as("rho"))
        .groupBy($"b").agg(max($"rho").as("mrho"))
      val st = regs.agg(
        count(lit(1)).cast("long").as("buckets_used"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 54 - mrho)")).as("s_used"))
      val ex = src.distinct().agg(count(lit(1)).as("n_exact"))
      broadcast(st).crossJoin(broadcast(ex))
        .select(lit(tag).as("col_name"), $"n_exact", $"buckets_used",
          (lit(HllM) - $"buckets_used").as("zero_regs"),
          ($"s_used" + (lit(HllM) - $"buckets_used") * lit(18014398509481984L))
            .as("sum_scaled"))
        .withColumn("raw",
          (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))) * lit(65536.0)
            * lit(1.8014398509481984e16) / $"sum_scaled".cast("double"))
        .withColumn("corrected",
          when($"raw" <= lit(640.0) && $"zero_regs" > 0,
            lit(256.0) * log(lit(256.0) / $"zero_regs".cast("double")))
            .otherwise($"raw"))
        .select($"col_name", $"n_exact", $"buckets_used", $"zero_regs",
          $"sum_scaled",
          round($"raw", 4).as("est_raw"), round($"corrected", 4).as("est"),
          round(lit(100.0) * ($"corrected" - $"n_exact".cast("double"))
            / $"n_exact".cast("double"), 2).as("rel_err_pct"))
    }
    audit(Tables.events(spark, dir), "user_id", "events.user_id")
      .unionByName(
        audit(Tables.lineitem(spark, dir), "l_partkey", "lineitem.l_partkey"))
      .orderBy($"col_name")
  }

  val hllAuditSql: String =
    """WITH src AS (
      |  SELECT 'events.user_id' AS col_name, CAST(user_id AS VARCHAR) AS x
      |  FROM events WHERE user_id IS NOT NULL
      |  UNION ALL
      |  SELECT 'lineitem.l_partkey', CAST(l_partkey AS VARCHAR)
      |  FROM lineitem WHERE l_partkey IS NOT NULL),
      |h AS (
      |  SELECT col_name,
      |    CAST(('0x' || substr(md5('hll:' || x), 1, 15)) AS BIGINT) AS h
      |  FROM src),
      |regs AS (
      |  SELECT col_name, h // 4503599627370496 AS b,
      |    max(CASE WHEN h % 4503599627370496 = 0 THEN 53
      |        ELSE 53 - length(bin(h % 4503599627370496)) END) AS mrho
      |  FROM h GROUP BY 1, 2),
      |st AS (
      |  SELECT col_name, CAST(count(*) AS BIGINT) AS buckets_used,
      |    CAST(sum(CAST(1 AS BIGINT) << (54 - mrho)) AS BIGINT) AS s_used
      |  FROM regs GROUP BY 1),
      |ex AS (
      |  SELECT col_name, CAST(count(DISTINCT x) AS BIGINT) AS n_exact
      |  FROM src GROUP BY 1),
      |fin AS (
      |  SELECT st.col_name, ex.n_exact, st.buckets_used,
      |    256 - st.buckets_used AS zero_regs,
      |    st.s_used + (256 - st.buckets_used) * 18014398509481984 AS sum_scaled,
      |    (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 18014398509481984.0
      |      / CAST(st.s_used + (256 - st.buckets_used) * 18014398509481984
      |             AS DOUBLE) AS raw
      |  FROM st JOIN ex ON ex.col_name = st.col_name),
      |fin2 AS (
      |  SELECT *, CASE WHEN raw <= 640.0 AND zero_regs > 0
      |    THEN 256.0 * ln(256.0 / CAST(zero_regs AS DOUBLE))
      |    ELSE raw END AS corrected
      |  FROM fin)
      |SELECT col_name, n_exact, buckets_used,
      |  CAST(zero_regs AS BIGINT) AS zero_regs,
      |  CAST(sum_scaled AS BIGINT) AS sum_scaled,
      |  round(raw, 4) AS est_raw, round(corrected, 4) AS est,
      |  round(100.0 * (corrected - CAST(n_exact AS DOUBLE))
      |    / CAST(n_exact AS DOUBLE), 2) AS rel_err_pct
      |FROM fin2 ORDER BY col_name""".stripMargin
}
