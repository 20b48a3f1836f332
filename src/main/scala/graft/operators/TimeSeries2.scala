package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Relational.{dec, sqlDec}

/** Statistical time-series operators beyond [[TimeSeries]]'s smoothing
  * family: changepoint detection, autocorrelation, and robust trend
  * estimation — the drift-monitoring toolkit a data pipeline points at
  * its own volume/quality series.
  *
  * Shared exactness doctrine: every series value is carried on the
  * DECIMAL(18,4) money grid scaled to BIGINT ten-thousandths, all
  * sufficient statistics are DECIMAL(38,0) integer sums, and doubles
  * appear only in the final fixed-order derivation — so scores, ranks,
  * and argmaxes are bit-identical in the DuckDB mirror.
  */
object TimeSeries2 {

  /** Daily event-value series per type: (event_type, day_n, x_u) with
    * x_u = Σ round(value·10⁴) as BIGINT — the exact integer grid the
    * whole file computes on. One partial agg over the scan.
    */
  private def dailySeries(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type",
        floor(unix_timestamp($"ts") / 86400L).cast("long").as("day_n"),
        dec($"value").as("v"))
      .groupBy($"event_type", $"day_n")
      .agg((sum($"v") * 10000).cast("decimal(38,0)").cast("long").as("x_u"))
  }

  private val dailySeriesSql: String =
    s"""SELECT event_type,
      |  CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day_n,
      |  CAST(CAST(sum(${sqlDec("value")}) * 10000 AS DECIMAL(38,0)) AS BIGINT) AS x_u
      |FROM events GROUP BY event_type, day_n""".stripMargin

  /** Single-changepoint detection per event-type series by binary
    * segmentation: the split t maximizing the CUSUM statistic
    * t(n−t)/n · (x̄_L − x̄_R)², i.e. the day where the daily-value mean
    * shifts most. Emitted per series: the best split day, the exact
    * left/right means, and the statistic — the monitoring primitive
    * behind "did ingest volume/quality step-change, and when?".
    *
    * Exactness: with S_t the prefix sum and S the total (all BIGINT on
    * the 10⁻⁴ grid), the score ∝ p²/(n·t·(n−t)) for p = n·S_t − t·S —
    * p² is DECIMAL(38,0)-exact and the single double division is
    * fixed-order, so the argmax (tie-break: smallest t) is
    * engine-exact. No ln, no iteration, no recursion — one window pass
    * over each series.
    *
    * Scale: series are (type, day) aggregates — cardinality ∝ time,
    * not data volume. One partial agg over the scan, one type-keyed
    * window shuffle, one |types|-row result.
    */
  def changepointDetect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"day_n")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type")
    val d38 = "decimal(38,0)"
    val scored = dailySeries(spark, dir)
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .withColumn("s_t", sum($"x_u").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("s", sum($"x_u").over(wAll))
      .filter($"t" < $"n")
      .withColumn("p",
        ($"n".cast(d38) * $"s_t".cast(d38) - $"t".cast(d38) * $"s".cast(d38))
          .cast(d38))
      .withColumn("stat",
        ($"p" * $"p").cast(d38).cast("double")
          / ($"n" * $"t" * ($"n" - $"t")).cast("double"))
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"stat".desc, $"t")
    scored.withColumn("rk", row_number().over(best))
      .filter($"rk" === 1)
      .select($"event_type", $"n".as("n_days"), $"t".as("split_after"),
        $"day_n".as("split_day"),
        round($"s_t".cast("double") / ($"t" * 10000L).cast("double"), 6)
          .as("mean_left"),
        round(($"s" - $"s_t").cast("double")
          / (($"n" - $"t") * 10000L).cast("double"), 6).as("mean_right"),
        round($"stat" / 100000000d, 6).as("cusum_stat"))
      .orderBy($"event_type")
  }

  val changepointDetectSql: String =
    s"""WITH daily AS ($dailySeriesSql),
      |c AS (
      |  SELECT event_type, day_n, x_u,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day_n)
      |      AS BIGINT) AS t,
      |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |    CAST(sum(x_u) OVER (PARTITION BY event_type ORDER BY day_n
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s_t,
      |    CAST(sum(x_u) OVER (PARTITION BY event_type) AS BIGINT) AS s
      |  FROM daily),
      |sc AS (
      |  SELECT *,
      |    CAST(CAST(CAST(n AS DECIMAL(38,0)) * s_t - CAST(t AS DECIMAL(38,0)) * s
      |        AS DECIMAL(38,0)) * CAST(CAST(n AS DECIMAL(38,0)) * s_t
      |        - CAST(t AS DECIMAL(38,0)) * s AS DECIMAL(38,0)) AS DOUBLE)
      |      / CAST(n * t * (n - t) AS DOUBLE) AS stat
      |  FROM c WHERE t < n),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY stat DESC, t) AS rk FROM sc)
      |SELECT event_type, n AS n_days, t AS split_after, day_n AS split_day,
      |  round(CAST(s_t AS DOUBLE) / CAST(t * 10000 AS DOUBLE), 6) AS mean_left,
      |  round(CAST(s - s_t AS DOUBLE) / CAST((n - t) * 10000 AS DOUBLE), 6)
      |    AS mean_right,
      |  round(stat / 100000000, 6) AS cusum_stat
      |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin

  private val AcfMaxLag = 7

  /** Autocorrelation function of each event-type's daily-value series
    * at lags 1..7 — the seasonality detector (a weekly cycle shows as
    * a lag-7 peak) and the independence check behind forecast-model
    * choice. Standard ACF estimator: r_ℓ = Σ_{t≤n−ℓ}(x_t−x̄)(x_{t+ℓ}−x̄)
    * / Σ(x_t−x̄)², computed n-scaled so every sum is integer-exact:
    * numerator terms (n·x_t−S)(n·x_{t+ℓ}−S) in DECIMAL(38,0), one
    * double division at the end.
    *
    * Scale: all 7 lag columns come from ONE type-keyed window shuffle
    * (lead at 7 offsets over the same frame); the result is
    * |types|·7 rows regardless of data volume.
    */
  def acfLags(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"day_n")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type")
    val d38 = "decimal(38,0)"
    val base = dailySeries(spark, dir)
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .withColumn("s", sum($"x_u").over(wAll))
      .withColumn("d", ($"n".cast(d38) * $"x_u".cast(d38) - $"s".cast(d38)).cast(d38))
    val withLeads = (1 to AcfMaxLag).foldLeft(base) { (df, l) =>
      df.withColumn(s"d_$l", lead($"d", l).over(w))
    }
    val perLag = (1 to AcfMaxLag).map { l =>
      withLeads.groupBy($"event_type")
        .agg(max($"n").as("n_days"),
          sum(($"d" * $"d").cast(d38)).as("den"),
          sum(when(col(s"d_$l").isNotNull, ($"d" * col(s"d_$l")).cast(d38))
            .otherwise(lit(0).cast(d38))).as("num"))
        .select($"event_type", lit(l).as("lag"), $"n_days",
          round($"num".cast("double") / $"den".cast("double"), 6).as("acf"))
    }.reduce(_.unionByName(_))
    perLag.orderBy($"event_type", $"lag")
  }

  val acfLagsSql: String = {
    val blocks = (1 to AcfMaxLag).map { l =>
      s"""SELECT event_type, $l AS lag, max(n) AS n_days,
        |  round(CAST(sum(CASE WHEN d_lead IS NOT NULL
        |      THEN CAST(d * d_lead AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0))
        |      END) AS DOUBLE)
        |    / CAST(sum(CAST(d * d AS DECIMAL(38,0))) AS DOUBLE), 6) AS acf
        |FROM (SELECT event_type, n, d,
        |        lead(d, $l) OVER (PARTITION BY event_type ORDER BY day_n) AS d_lead
        |      FROM base) x
        |GROUP BY event_type""".stripMargin
    }.mkString("\n|UNION ALL\n|")
    s"""WITH daily AS ($dailySeriesSql),
      |base AS MATERIALIZED (
      |  SELECT event_type, day_n,
      |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |    CAST(CAST(count(*) OVER (PARTITION BY event_type) AS DECIMAL(38,0))
      |        * x_u - CAST(sum(x_u) OVER (PARTITION BY event_type)
      |        AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS d
      |  FROM daily)
      |$blocks
      |ORDER BY event_type, lag""".stripMargin
  }

  /** Lagged CROSS-correlation between every ordered pair of event-type
    * daily series at lags 0..7 — the lead/lag detector [[acfLags]]
    * can't see ("do clicks lead purchases by two days?"): r_{AB}(ℓ) =
    * Σ(x_t−x̄_A)(y_{t+ℓ}−x̄_B) / √(Σ(x−x̄_A)²·Σ(y−x̄_B)²). Deviations
    * are the same n-scaled integer grid as ACF (the n_A·n_B factors
    * cancel in the ratio); numerator over the day-aligned overlap,
    * denominators over each full series (the standard full-variance
    * normalization); one double division + sqrt at the end.
    *
    * Scale: the lag alignment is an EQUI-join — the A side explodes
    * ×8 into (day+ℓ, ℓ) keys rather than a banded theta-join, so the
    * plan is a hash join on day over |types|·|days|·8 rows (calendar-
    * bounded, independent of event volume). |types|²·8 output rows.
    */
  def xcorrLags(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type")
    val d38 = "decimal(38,0)"
    val base = dailySeries(spark, dir)
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .withColumn("s", sum($"x_u").over(wAll))
      .select($"event_type", $"day_n",
        ($"n".cast(d38) * $"x_u".cast(d38) - $"s".cast(d38)).cast(d38).as("d"))
      .persist() // read three ways: A side, B side, denominators
    val den = base.groupBy($"event_type")
      .agg(sum(($"d" * $"d").cast(d38)).as("den2"))
    val aSide = base
      .select($"event_type".as("type_a"), $"day_n", $"d".as("dd_a"))
      .withColumn("lag", explode(sequence(lit(0), lit(AcfMaxLag))))
      .select($"type_a", $"lag", ($"day_n" + $"lag").as("k"), $"dd_a")
    val bSide = base.select(
      $"event_type".as("type_b"), $"day_n".as("k"), $"d".as("dd_b"))
    Release.grid(
      aSide.join(bSide, "k")
        .filter($"type_a" =!= $"type_b")
        .groupBy($"type_a", $"type_b", $"lag")
        .agg(sum(($"dd_a" * $"dd_b").cast(d38)).as("num"),
          count(lit(1)).as("n_overlap"))
        .join(broadcast(den.select($"event_type".as("type_a"), $"den2".as("den_a"))), "type_a")
        .join(broadcast(den.select($"event_type".as("type_b"), $"den2".as("den_b"))), "type_b")
        .select($"type_a", $"type_b", $"lag".cast("int").as("lag"), $"n_overlap",
          round($"num".cast("double")
            / sqrt($"den_a".cast("double") * $"den_b".cast("double")), 6).as("xcorr"))
        .orderBy($"type_a", $"type_b", $"lag"),
      base) // |types|²·lags rows
  }

  val xcorrLagsSql: String =
    s"""WITH daily AS ($dailySeriesSql),
      |base AS MATERIALIZED (
      |  SELECT event_type, day_n,
      |    CAST(CAST(count(*) OVER (PARTITION BY event_type) AS DECIMAL(38,0))
      |        * x_u - CAST(sum(x_u) OVER (PARTITION BY event_type)
      |        AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS d
      |  FROM daily),
      |den AS (
      |  SELECT event_type, sum(CAST(d * d AS DECIMAL(38,0))) AS den2
      |  FROM base GROUP BY event_type),
      |ax AS (
      |  SELECT a.event_type AS type_a, l.lag, a.day_n + l.lag AS k, a.d AS dd_a
      |  FROM base a CROSS JOIN (SELECT unnest(range(0, ${AcfMaxLag + 1})) AS lag) l),
      |num AS (
      |  SELECT ax.type_a, b.event_type AS type_b, ax.lag,
      |    sum(CAST(ax.dd_a * b.d AS DECIMAL(38,0))) AS num, count(*) AS n_overlap
      |  FROM ax JOIN base b ON b.day_n = ax.k AND b.event_type <> ax.type_a
      |  GROUP BY 1, 2, 3)
      |SELECT n.type_a, n.type_b, CAST(n.lag AS INT) AS lag, n.n_overlap,
      |  round(CAST(n.num AS DOUBLE)
      |    / sqrt(CAST(da.den2 AS DOUBLE) * CAST(db.den2 AS DOUBLE)), 6) AS xcorr
      |FROM num n
      |JOIN den da ON da.event_type = n.type_a
      |JOIN den db ON db.event_type = n.type_b
      |ORDER BY n.type_a, n.type_b, n.lag""".stripMargin

  /** Theil–Sen robust trend per part brand over MONTHLY revenue: the
    * (lower) median of all pairwise month-to-month slopes — the
    * outlier-immune answer to [[Profile.trendFit]]'s least-squares
    * slope (one promotional spike month drags OLS; the slope median
    * shrugs it off).
    *
    * Exactness: monthly revenue is an exact DECIMAL sum surfaced as
    * BIGINT ten-thousandths; each pairwise slope is quantized to that
    * same integer grid (round of one fixed-order double division);
    * the median is the rank-⌈k/2⌉ element under a total order, so both
    * engines pick the identical slope.
    *
    * Scale: months-per-brand is calendar-bounded (~84), so the
    * pairwise self-join is ≤ 84²/2 rows per brand — O(|brands|·months²)
    * total, independent of lineitem volume. The heavy step is the one
    * (brand, month) partial agg over the scan; the part join carries no
    * broadcast hint (part scales with SF — AQE decides).
    */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val monthly = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
      .select($"p_brand".as("brand"),
        ((year($"l_shipdate") - 1992) * 12 + month($"l_shipdate") - 1)
          .cast("long").as("m"),
        Relational.revTerm($"l_extendedprice", $"l_discount").as("rev"))
      .groupBy($"brand", $"m")
      .agg((sum($"rev") * 10000).cast("decimal(38,0)").cast("long").as("y_u"))
      // persisted: the pair self-join reads the monthly aggregate twice
      // — unmaterialized, the lineitem⋈part build runs per reference
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val slopes = monthly.as("a").join(monthly.as("b"),
        $"a.brand" === $"b.brand" && $"a.m" < $"b.m")
      .select($"a.brand".as("brand"),
        round(($"b.y_u" - $"a.y_u").cast("double") / ($"b.m" - $"a.m").cast("double"), 0)
          .cast("long").as("slope_u"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"brand").orderBy($"slope_u")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy($"brand")
    Release.grid(
      slopes
        .withColumn("rk", row_number().over(w))
        .withColumn("k", count(lit(1)).over(wAll))
        .filter($"rk" === ($"k" + 1) / 2)
        .select($"brand", $"k".as("n_pairs"),
          round($"slope_u".cast("double") / 10000d, 4).as("sen_slope"))
        .orderBy($"brand"),
      monthly) // |brands| rows
  }

  /** LATE-EVENT AUDIT — the watermark-tuning input for every stateful
    * streaming query here: per simulated source partition
    * (event_id % 32, the kafka-partition analog — arrival order is
    * only meaningful WITHIN a partition), an event's lateness is
    * (max event-time seen so far at its arrival) − (its event time),
    * bucketed into the operationally meaningful bands (on-time/1min/
    * 5min/15min/1h/worse). Read the histogram, pick the watermark
    * that bounds the dropped fraction.
    *
    * The testdata's ingest id is exactly event-time-ordered (zero
    * lateness — a vacuous audit), so delivery delay is PLANTED
    * deterministically (hash-jitter 0..996 s per event, the
    * urlStats/dedup_exact planting convention): arrival order =
    * event time + jitter, which genuinely reorders events within
    * every shard at every SF.
    *
    * Exactness: jitter, arrival order, and lateness are pure integer
    * ns arithmetic; bands are integer thresholds; pct is one
    * exact-int division.
    *
    * Scale: ONE shard-keyed window (32-way parallel, no global
    * order), one |bands|-row aggregate.
    */
  def lateEventAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lateness = Tables.events(spark, dir)
      .select($"event_id", pmod($"event_id", lit(32)).cast("int").as("shard"),
        $"ts_ns")
      .withColumn("arrival_ns",
        $"ts_ns" + ($"event_id" * 2654435761L % 997L) * 1000000000L)
      .withColumn("late_s",
        expr("(max(ts_ns) over (partition by shard order by arrival_ns, event_id " +
          "rows between unbounded preceding and current row) - ts_ns) div 1000000000"))
    val banded = lateness.withColumn("band",
      when($"late_s" <= 0, 0).when($"late_s" <= 60, 1)
        .when($"late_s" <= 300, 2).when($"late_s" <= 900, 3)
        .when($"late_s" <= 3600, 4).otherwise(5))
    val total = banded.count()
    banded.groupBy($"band")
      .agg(count(lit(1)).as("n_events"), max($"late_s").as("max_late_s"))
      .select($"band", $"n_events", $"max_late_s",
        round($"n_events".cast("double") / lit(total.toDouble), 6).as("pct"))
      .orderBy($"band")
  }

  val lateEventAuditSql: String =
    """WITH j AS (
      |  SELECT event_id, CAST(event_id % 32 AS INT) AS shard,
      |    epoch_ns(ts) AS ts_ns,
      |    epoch_ns(ts) + (event_id * 2654435761 % 997) * 1000000000 AS arrival_ns
      |  FROM events),
      |l AS (
      |  SELECT event_id,
      |    (max(ts_ns) OVER (PARTITION BY shard ORDER BY arrival_ns, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |     - ts_ns) // 1000000000 AS late_s
      |  FROM j),
      |b AS (
      |  SELECT CASE WHEN late_s <= 0 THEN 0 WHEN late_s <= 60 THEN 1
      |              WHEN late_s <= 300 THEN 2 WHEN late_s <= 900 THEN 3
      |              WHEN late_s <= 3600 THEN 4 ELSE 5 END AS band, late_s
      |  FROM l),
      |t AS (SELECT count(*) AS total FROM b)
      |SELECT band, count(*) AS n_events, max(late_s) AS max_late_s,
      |  round(CAST(count(*) AS DOUBLE) / CAST((SELECT total FROM t) AS DOUBLE), 6)
      |    AS pct
      |FROM b GROUP BY band ORDER BY band""".stripMargin

  /** Linear-INTERPOLATION resampling on the 15-minute grid —
    * [[TimeSeries.resampleFill]]'s carry-forward sibling for
    * continuous signals (a gauge held flat across a gap lies about
    * trends; interpolation doesn't). Grid points with no observation
    * get prev + (next − prev)·(t − t_prev)/(t_next − t_prev); leading/
    * trailing gaps carry the nearest observation.
    *
    * Exactness: observed values land on the DECIMAL money grid; the
    * interpolation is ONE fixed-order double expression over exact
    * integers (grid positions are integers), rounded at 6dp — the
    * engines evaluate the identical expression tree.
    *
    * Scale: spine ∝ time span; two window passes (backward carry,
    * forward carry) over the spine, both sharing one order.
    */
  def resampleInterp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val bucketNs = 900L * 1000000000L
    val agg = Tables.events(spark, dir)
      .withColumn("bucket", expr(s"ts_ns div ${bucketNs}L"))
      .groupBy($"bucket")
      .agg((sum(dec($"value")) * 10000).cast("decimal(38,0)").cast("long").as("v_u"))
    val span = agg.agg(min($"bucket").as("lo"), max($"bucket").as("hi"))
    val spine = span.select(explode(sequence($"lo", $"hi")).as("bucket"))
    val filled = spine.join(agg, Seq("bucket"), "left")
    val wb = W.orderBy($"bucket").rowsBetween(W.unboundedPreceding, 0)
    val wf = W.orderBy($"bucket").rowsBetween(0, W.unboundedFollowing)
    filled
      .withColumn("pv", last($"v_u", ignoreNulls = true).over(wb))
      .withColumn("pt", last(when($"v_u".isNotNull, $"bucket"), ignoreNulls = true).over(wb))
      .withColumn("nv", first($"v_u", ignoreNulls = true).over(wf))
      .withColumn("nt", first(when($"v_u".isNotNull, $"bucket"), ignoreNulls = true).over(wf))
      .select($"bucket", $"v_u".isNotNull.as("observed"),
        round(
          when($"v_u".isNotNull, $"v_u".cast("double"))
            .when($"pv".isNull, $"nv".cast("double"))
            .when($"nv".isNull, $"pv".cast("double"))
            .otherwise($"pv".cast("double")
              + ($"nv" - $"pv").cast("double")
                * ($"bucket" - $"pt").cast("double")
                / ($"nt" - $"pt").cast("double"))
          / 10000d, 6).as("value"))
      .orderBy($"bucket")
  }

  val resampleInterpSql: String =
    """WITH b AS (
      |  SELECT epoch_ns(ts) // 900000000000 AS bucket,
      |    CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS DECIMAL(38,0))
      |      AS BIGINT) AS v_u
      |  FROM events GROUP BY 1),
      |spine AS (
      |  SELECT unnest(generate_series((SELECT min(bucket) FROM b),
      |                                (SELECT max(bucket) FROM b))) AS bucket),
      |f AS (
      |  SELECT s.bucket, b.v_u FROM spine s LEFT JOIN b ON s.bucket = b.bucket),
      |w AS (
      |  SELECT bucket, v_u,
      |    last_value(v_u IGNORE NULLS) OVER (ORDER BY bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |    last_value(CASE WHEN v_u IS NOT NULL THEN bucket END IGNORE NULLS)
      |      OVER (ORDER BY bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
      |    first_value(v_u IGNORE NULLS) OVER (ORDER BY bucket
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |    first_value(CASE WHEN v_u IS NOT NULL THEN bucket END IGNORE NULLS)
      |      OVER (ORDER BY bucket
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      |  FROM f)
      |SELECT bucket, v_u IS NOT NULL AS observed,
      |  round((CASE WHEN v_u IS NOT NULL THEN CAST(v_u AS DOUBLE)
      |    WHEN pv IS NULL THEN CAST(nv AS DOUBLE)
      |    WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
      |    ELSE CAST(pv AS DOUBLE)
      |      + CAST(nv - pv AS DOUBLE) * CAST(bucket - pt AS DOUBLE)
      |        / CAST(nt - pt AS DOUBLE) END) / 10000, 6) AS value
      |FROM w ORDER BY bucket""".stripMargin

  val theilSenSql: String =
    s"""WITH monthly AS MATERIALIZED (
      |  SELECT p.p_brand AS brand,
      |    CAST((year(l.l_shipdate) - 1992) * 12 + month(l.l_shipdate) - 1
      |      AS BIGINT) AS m,
      |    CAST(CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
      |        * CAST(1 - l.l_discount AS DECIMAL(18,4)) AS DECIMAL(18,4)))
      |      * 10000 AS DECIMAL(38,0)) AS BIGINT) AS y_u
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY p.p_brand, (year(l.l_shipdate) - 1992) * 12 + month(l.l_shipdate) - 1),
      |slopes AS (
      |  SELECT a.brand,
      |    CAST(round(CAST(b.y_u - a.y_u AS DOUBLE)
      |      / CAST(b.m - a.m AS DOUBLE), 0) AS BIGINT) AS slope_u
      |  FROM monthly a JOIN monthly b ON a.brand = b.brand AND a.m < b.m),
      |r AS (
      |  SELECT brand, slope_u,
      |    row_number() OVER (PARTITION BY brand ORDER BY slope_u) AS rk,
      |    count(*) OVER (PARTITION BY brand) AS k
      |  FROM slopes)
      |SELECT brand, CAST(k AS BIGINT) AS n_pairs,
      |  round(CAST(slope_u AS DOUBLE) / 10000, 4) AS sen_slope
      |FROM r WHERE rk = (k + 1) // 2 ORDER BY brand""".stripMargin

  // ------------------------------------------------------------------
  // burst_detect — trailing-baseline burst scoring on the event grid
  // ------------------------------------------------------------------

  private val BurstTopK = 20

  /** Burst detection per event type: each hour's event count scored
    * against its OWN trailing 24-hour baseline — the rate-anomaly
    * primitive behind "which activity just spiked" (Kleinberg's burst
    * model reduced to its ratio test on a fixed window). Score =
    * cnt·24·10⁶ / Σ(baseline counts), exact integer floor; hours whose
    * full 24-hour history precedes the series start are excluded (a
    * partial baseline under-sums and fakes a burst), as are hours with
    * a silent baseline. Top-20 bursts by (score, type, hour).
    *
    * Gap handling without densification: the baseline is a RANGE frame
    * over hour-epoch seconds [−86400, −3600], so missing hours
    * contribute exactly their true count (zero) while the denominator
    * stays the fixed 24-slot mass — no spine join, no zero-fill rows.
    *
    * Scale: the grid is (type, hour) — cardinality ∝ time; one partial
    * agg over the scan, one type-keyed window shuffle, TakeOrdered 20.
    */
  def burstDetect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"he")
    val base = w.rangeBetween(-86400L, -3600L)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy($"event_type")
    Tables.events(spark, dir)
      .select($"event_type", date_trunc("hour", $"ts").as("h"))
      .withColumn("he", unix_timestamp($"h"))
      .groupBy($"event_type", $"h", $"he").agg(count(lit(1)).as("cnt"))
      .withColumn("base_cnt", coalesce(sum($"cnt").over(base), lit(0L)))
      .withColumn("start_he", min($"he").over(wAll))
      .filter($"he" >= $"start_he" + 86400L && $"base_cnt" > 0)
      .select($"event_type",
        date_format($"h", "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"cnt", $"base_cnt",
        (($"cnt" * 24000000L - ($"cnt" * 24000000L) % $"base_cnt") / $"base_cnt")
          .cast("long").as("burst_micro"))
      .orderBy($"burst_micro".desc, $"event_type", $"hour")
      .limit(BurstTopK)
  }

  val burstDetectSql: String =
    s"""WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |    CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS he,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2, 3),
      |scored AS (
      |  SELECT event_type, h, he, cnt,
      |    COALESCE(CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY he
      |      RANGE BETWEEN 86400 PRECEDING AND 3600 PRECEDING) AS BIGINT), 0)
      |      AS base_cnt,
      |    min(he) OVER (PARTITION BY event_type) AS start_he
      |  FROM hourly)
      |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, cnt, base_cnt,
      |  (cnt * 24000000 - (cnt * 24000000) % base_cnt) // base_cnt AS burst_micro
      |FROM scored
      |WHERE he >= start_he + 86400 AND base_cnt > 0
      |ORDER BY burst_micro DESC, event_type, hour
      |LIMIT $BurstTopK""".stripMargin

  // ------------------------------------------------------------------
  // gap_histogram — inter-event idle-gap distribution
  // ------------------------------------------------------------------

  /** Log-decade histogram of per-user inter-event gaps — the evidence
    * behind [[Windows.sessionize]]'s 30-minute timeout: a session cut
    * should sit in the valley between the within-session gap mode and
    * the between-visit mode, and this is the query that shows whether
    * it does (with the 30-min boundary bracketed by the 10m–1h
    * buckets). Gaps are exact nanosecond longs from a user-keyed lag
    * (same deterministic (ts_ns, event_id) order as sessionize);
    * bucketing is a fixed integer threshold chain (<1s, <10s, <1m,
    * <10m, <1h, <6h, <24h, ≥24h — no float log); per-bucket count,
    * exact micro share, and the cumulative share over the 8-row
    * bucket grid.
    *
    * Scale: one user-keyed window pass over the scan (high-cardinality
    * partitions), then an 8-bucket partial aggregate; the cumulative
    * runs on the 8-row grid (registered in PlanSpec's sweep). */
  def gapHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts_ns", $"event_id")
    val gaps = Tables.events(spark, dir)
      .select($"user_id", $"ts_ns", $"event_id")
      .withColumn("prev", lag($"ts_ns", 1).over(w))
      .filter($"prev".isNotNull)
      // exact floor to seconds: (d − d % 1e9)/1e9 — DuckDB CAST rounds,
      // so a plain divide-and-cast would disagree on e.g. a 90.7s gap
      .select(((($"ts_ns" - $"prev") - (($"ts_ns" - $"prev") % 1000000000L))
        / 1000000000L).cast("long").as("gap_s"))
    val sec = 1L; val min = 60L; val hour = 3600L
    val bucket = when($"gap_s" < sec, 0)
      .when($"gap_s" < 10 * sec, 1)
      .when($"gap_s" < min, 2)
      .when($"gap_s" < 10 * min, 3)
      .when($"gap_s" < hour, 4)
      .when($"gap_s" < 6 * hour, 5)
      .when($"gap_s" < 24 * hour, 6)
      .otherwise(7)
    val labels = typedLit(Seq("<1s", "<10s", "<1m", "<10m", "<1h", "<6h", "<24h", ">=24h"))
    val counts = gaps.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("n_gaps"))
    val tot = counts.agg(sum($"n_gaps").as("total"))
    val cw = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    counts.crossJoin(broadcast(tot))
      .withColumn("cum", sum($"n_gaps").over(cw))
      .select($"bucket",
        element_at(labels, $"bucket" + 1).as("gap_range"),
        $"n_gaps",
        (($"n_gaps" * 1000000L - (($"n_gaps" * 1000000L) % $"total")) / $"total")
          .cast("long").as("share_micro"),
        (($"cum" * 1000000L - (($"cum" * 1000000L) % $"total")) / $"total")
          .cast("long").as("cum_share_micro"))
      .orderBy($"bucket")
  }

  val gapHistogramSql: String =
    """WITH g AS (
      |  SELECT CAST(((epoch_ns(ts) - prev) - ((epoch_ns(ts) - prev) % 1000000000))
      |    / 1000000000 AS BIGINT) AS gap_s
      |  FROM (
      |    SELECT ts, lag(epoch_ns(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ns(ts), event_id) AS prev
      |    FROM events)
      |  WHERE prev IS NOT NULL),
      |b AS (
      |  SELECT CASE WHEN gap_s < 1 THEN 0 WHEN gap_s < 10 THEN 1
      |    WHEN gap_s < 60 THEN 2 WHEN gap_s < 600 THEN 3
      |    WHEN gap_s < 3600 THEN 4 WHEN gap_s < 21600 THEN 5
      |    WHEN gap_s < 86400 THEN 6 ELSE 7 END AS bucket
      |  FROM g),
      |c AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_gaps
      |      FROM b GROUP BY bucket),
      |t AS (SELECT CAST(sum(n_gaps) AS BIGINT) AS total FROM c),
      |cc AS (
      |  SELECT bucket, n_gaps, total,
      |    CAST(sum(n_gaps) OVER (ORDER BY bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM c CROSS JOIN t)
      |SELECT bucket,
      |  ['<1s','<10s','<1m','<10m','<1h','<6h','<24h','>=24h'][bucket + 1]
      |    AS gap_range,
      |  n_gaps,
      |  CAST((n_gaps * 1000000 - (n_gaps * 1000000 % total)) / total AS BIGINT)
      |    AS share_micro,
      |  CAST((cum * 1000000 - (cum * 1000000 % total)) / total AS BIGINT)
      |    AS cum_share_micro
      |FROM cc ORDER BY bucket""".stripMargin

  // ------------------------------------------------------------------
  // periodogram_topk — exact-integer DFT periodogram, top cycles
  // ------------------------------------------------------------------

  /** Periodogram of the hourly value series (Schuster 1898; the
    * classical DFT power spectrum): for every frequency f = 1..⌊n/2⌋,
    * P(f) = SC² + SS² with SC = Σ_t y_t·cos(2πft/n), SS the sine sum,
    * over the MEAN-CLEARED series — the spectral scan that surfaces
    * the dominant cycles (this corpus: the 24 h pulse) before fitting
    * seasonal models like holt_winters. Emits the top-10 frequencies
    * by power with their periods in hours.
    *
    * Exactness: the series is cleared of its mean WITHOUT division
    * (y_t = n·x_t − Σx, exact tenk-longs), the trig kernel rides the
    * micro idiom on an angle computed from the INTEGER f·t mod n (so
    * both engines evaluate cos/sin on the identical double), products
    * y·cos_micro sum in DECIMAL(38,0)/HUGEINT, and the power is one
    * fixed double tree rounded to 4. Scale: the corpus contributes one
    * (hour) partial aggregate; the DFT itself is grid×freq work
    * (≤ 720·360 terms), one f-keyed grid aggregate, top-k by
    * TakeOrdered. The rank/index windows read the hour grid only
    * (registered grid-bounded).
    */
  def periodogramTopk(spark: SparkSession, dir: String, topK: Int = 10): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.orderBy($"hb")
    val grid = Tables.events(spark, dir)
      .groupBy(expr("ts_ns div 3600000000000").as("hb"))
      .agg((sum(round($"value", 4).cast("decimal(14,4)")) * 10000)
        .cast("long").as("x"))
      .withColumn("t", row_number().over(w).cast("long") - 1L)
    val tot = grid.agg(count(lit(1)).as("n"), sum($"x").as("sx"))
    val y = grid.crossJoin(broadcast(tot))
      .select($"t", $"n", ($"n" * $"x" - $"sx").as("y"))
    val freqs = y.select($"n").limit(1)
      .select(explode(sequence(lit(1L), expr("n div 2"))).as("f"), $"n")
    val terms = y.crossJoin(broadcast(freqs.select($"f")))
      .withColumn("ang",
        lit(2.0 * math.Pi) * (($"f" * $"t") % $"n").cast("double") / $"n")
      // y is cast to DECIMAL(38,0) BEFORE the kernel multiply so the
      // product never rides a (overflowable) long at extreme scale
      .select($"f",
        ($"y".cast("decimal(38,0)")
          * round(cos($"ang") * 1e6, 0).cast("long")).as("c"),
        ($"y".cast("decimal(38,0)")
          * round(sin($"ang") * 1e6, 0).cast("long")).as("s"))
    terms.groupBy($"f")
      .agg(sum($"c").as("sc"), sum($"s").as("ss"))
      .crossJoin(broadcast(tot.select($"n")))
      .select($"f",
        round($"n".cast("double") / $"f", 4).as("period_hours"),
        round(($"sc".cast("double") * $"sc".cast("double")
          + $"ss".cast("double") * $"ss".cast("double")) / 1e30, 4).as("power"))
      .orderBy($"power".desc, $"f")
      .limit(topK)
  }

  val periodogramTopkSql: String =
    """WITH hourly AS (
      |  SELECT epoch_ns(ts) // 3600000000000 AS hb,
      |    CAST(sum(CAST(round(value, 4) AS DECIMAL(14,4))) * 10000 AS BIGINT) AS x
      |  FROM events GROUP BY 1),
      |grid AS (
      |  SELECT x, CAST(row_number() OVER (ORDER BY hb) AS BIGINT) - 1 AS t
      |  FROM hourly),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx
      |  FROM grid),
      |y AS (SELECT t, n, n * x - sx AS y FROM grid CROSS JOIN tot),
      |freqs AS (SELECT unnest(range(1, (SELECT n FROM tot) // 2 + 1)) AS f),
      |terms AS (
      |  SELECT f,
      |    CAST(y AS HUGEINT) * CAST(round(cos(6.283185307179586
      |      * CAST((f * t) % n AS DOUBLE) / n) * 1e6, 0) AS BIGINT) AS c,
      |    CAST(y AS HUGEINT) * CAST(round(sin(6.283185307179586
      |      * CAST((f * t) % n AS DOUBLE) / n) * 1e6, 0) AS BIGINT) AS s
      |  FROM y CROSS JOIN freqs),
      |p AS (
      |  SELECT f, sum(c) AS sc, sum(s) AS ss FROM terms GROUP BY f)
      |SELECT f, round(CAST((SELECT n FROM tot) AS DOUBLE) / f, 4) AS period_hours,
      |  round((CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
      |    + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)) / 1e30, 4) AS power
      |FROM p ORDER BY power DESC, f LIMIT 10""".stripMargin

  // ------------------------------------------------------------------
  // downsample_lttb — Largest-Triangle-Three-Buckets downsampling
  // ------------------------------------------------------------------

  private val LttbBuckets = 28

  /** LTTB downsampling (Steinarsson 2013) of the hourly value series
    * to ~30 visually-representative points: first and last points
    * kept, the middle split into 28 buckets, and each bucket
    * contributes the point maximizing the triangle area against the
    * PREVIOUSLY selected point and the next bucket's centroid — the
    * standard dashboard-rendering reduction that preserves spikes a
    * plain resample averages away.
    *
    * Exactness: points are (hour, Σvalue) with the y-mass in exact
    * tenk longs; the doubled triangle area is computed with the next
    * centroid CLEARED OF ITS DIVISION (multiply through by the next
    * bucket's count), so every comparison is between exact integers —
    * ties break to the smaller x identically in both engines. The
    * oracle carries the sequential selection through a recursive CTE
    * whose per-bucket argmax is a scalar list_reduce over the
    * pre-aggregated candidate list. Scale: the hourly grid is
    * time-axis cardinality (≤ hours in the corpus horizon), so the
    * selection runs on a collected model-sized grid (driver traffic
    * O(hours), the domain bound — the markov_stationary precedent);
    * the corpus contributes ONE partial aggregate.
    */
  def downsampleLttb(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grid = Tables.events(spark, dir)
      .groupBy(expr("ts_ns div 3600000000000").as("hb"))
      .agg((sum(round($"value", 4).cast("decimal(14,4)")) * 10000)
        .cast("long").as("v"))
      .orderBy($"hb")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = grid.length
    require(n >= LttbBuckets + 2, s"series too short for LTTB: $n")
    val mid = grid.slice(1, n - 1)
    val m = mid.length
    val byBucket = mid.zipWithIndex
      .groupBy { case (_, k) => k.toLong * LttbBuckets / m }
    var prev = grid.head
    val picks = (0 until LttbBuckets).map { b =>
      val cand = byBucket(b.toLong).map(_._1)
      val next: (Long, Long, Long) =
        if (b + 1 < LttbBuckets) {
          val nb = byBucket((b + 1).toLong).map(_._1)
          (nb.map(_._1).sum, nb.map(_._2).sum, nb.length.toLong)
        } else (grid.last._1, grid.last._2, 1L)
      def area2(c: (Long, Long)): Long =
        math.abs((prev._1 * next._3 - next._1) * (c._2 - prev._2)
          - (prev._1 - c._1) * (next._2 - prev._2 * next._3))
      val best = cand.maxBy(c => (area2(c), -c._1))
      prev = best
      best
    }
    def r4(x: Double): Double = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    spark.createDataFrame((grid.head +: picks) :+ grid.last)
      .toDF("bucket_hour", "v")
      .select($"bucket_hour", round($"v".cast("double") / 10000.0, 4)
        .as("total_value"))
      .orderBy($"bucket_hour")
  }

  val downsampleLttbSql: String =
    s"""WITH hourly AS (
      |  SELECT epoch_ns(ts) // 3600000000000 AS hb,
      |    CAST(sum(CAST(round(value, 4) AS DECIMAL(14,4))) * 10000 AS BIGINT) AS v
      |  FROM events GROUP BY 1),
      |idx AS (
      |  SELECT hb, v, CAST(row_number() OVER (ORDER BY hb) AS BIGINT) AS i,
      |    CAST(count(*) OVER () AS BIGINT) AS n
      |  FROM hourly),
      |mid AS (
      |  SELECT hb, v, ((i - 2) * $LttbBuckets) // (n - 2) AS b
      |  FROM idx WHERE i >= 2 AND i <= n - 1),
      |bstat AS (
      |  SELECT b, list(struct_pack(x := hb, y := v) ORDER BY hb) AS cand,
      |    CAST(sum(hb) AS BIGINT) AS xs, CAST(sum(v) AS BIGINT) AS ys,
      |    CAST(count(*) AS BIGINT) AS nc
      |  FROM mid GROUP BY b),
      |fp AS (SELECT hb, v FROM idx WHERE i = 1),
      |chk AS (
      |  SELECT CASE WHEN (SELECT coalesce(max(n), 0) FROM idx)
      |      >= ${LttbBuckets + 2}
      |    THEN TRUE ELSE error('series too short for LTTB') END AS ok),
      |lp AS (SELECT hb, v FROM idx WHERE i = n),
      |nxt AS (
      |  SELECT b.b, b.cand,
      |    coalesce(n2.xs, (SELECT hb FROM lp)) AS nxs,
      |    coalesce(n2.ys, (SELECT v FROM lp)) AS nys,
      |    coalesce(n2.nc, 1) AS nnc
      |  FROM bstat b LEFT JOIN bstat n2 ON n2.b = b.b + 1),
      |rec AS (
      |  WITH RECURSIVE s(b, sx, sy) AS (
      |    SELECT CAST(-1 AS BIGINT), hb, v FROM fp
      |    UNION ALL
      |    SELECT n.b,
      |      (list_reduce(n.cand, (acc, c) -> CASE
      |        WHEN abs((s.sx * n.nnc - n.nxs) * (c.y - s.sy)
      |              - (s.sx - c.x) * (n.nys - s.sy * n.nnc))
      |           > abs((s.sx * n.nnc - n.nxs) * (acc.y - s.sy)
      |              - (s.sx - acc.x) * (n.nys - s.sy * n.nnc))
      |        THEN c ELSE acc END)).x,
      |      (list_reduce(n.cand, (acc, c) -> CASE
      |        WHEN abs((s.sx * n.nnc - n.nxs) * (c.y - s.sy)
      |              - (s.sx - c.x) * (n.nys - s.sy * n.nnc))
      |           > abs((s.sx * n.nnc - n.nxs) * (acc.y - s.sy)
      |              - (s.sx - acc.x) * (n.nys - s.sy * n.nnc))
      |        THEN c ELSE acc END)).y
      |    FROM s JOIN nxt n ON n.b = s.b + 1)
      |  SELECT b, sx, sy FROM s WHERE b >= 0),
      |pts AS (
      |  SELECT hb, v FROM fp
      |  UNION ALL SELECT sx, sy FROM rec
      |  UNION ALL SELECT hb, v FROM lp)
      |SELECT hb AS bucket_hour,
      |  round(CAST(v AS DOUBLE) / 10000.0, 4) AS total_value
      |FROM pts CROSS JOIN chk ORDER BY bucket_hour""".stripMargin

  // ------------------------------------------------------------------
  // holt_winters — additive triple exponential smoothing (m = 7)
  // ------------------------------------------------------------------

  /** Additive Holt–Winters (Winters 1960) per event type over its
    * daily value series, weekly season m = 7 (α=0.3, β=0.2, γ=0.1):
    * level + trend + 7 seasonal states folded through the series, and
    * the 1/2/3-day-ahead forecasts ℓ + h·b + s[(n+h−1) mod 7 + 1] —
    * the seasonal upgrade of holt_forecast for series with a weekly
    * pulse.
    *
    * Exactness: daily inputs are exact 4dp-decimal sums cast to double
    * once; the coupled (ℓ, b, s[7]) recurrence runs as ONE codegen'd
    * HOF fold with a struct+array accumulator, and the oracle replays
    * the identical float-operation order through a recursive CTE whose
    * seasonal list is rebuilt per step by a list comprehension (newL
    * recomputed textually wherever referenced, exactly as the fold's
    * expression tree does) — bit-identical. Series with < 15 days
    * (two seasons + 1) are excluded (init needs two season means).
    *
    * Scale: one (type, day) partial agg collapses the corpus to a
    * |types|×days grid; the folds then run per type on ≤ days-length
    * arrays — grid work, no corpus-cardinality state anywhere.
    */
  def holtWinters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (a, ca, b, cb, g, cg) = (0.3, 0.7, 0.2, 0.8, 0.1, 0.9)
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", expr("ts_ns div 86400000000000").as("day"))
      .agg(sum(round($"value", 4).cast("decimal(14,4)")).as("v"))
      .groupBy($"event_type")
      .agg(array_sort(collect_list(struct($"day", $"v".cast("double").as("x"))))
        .as("evs"))
      .select($"event_type",
        transform($"evs", e => e.getField("x")).as("vals"))
      .filter(size($"vals") >= 15)
    def el(v: Column, i: Int): Column = element_at(v, i)
    val l0 = (el($"vals", 1) + el($"vals", 2) + el($"vals", 3) + el($"vals", 4)
      + el($"vals", 5) + el($"vals", 6) + el($"vals", 7)) / lit(7.0)
    val m2 = (el($"vals", 8) + el($"vals", 9) + el($"vals", 10) + el($"vals", 11)
      + el($"vals", 12) + el($"vals", 13) + el($"vals", 14)) / lit(7.0)
    def newL(acc: Column, x: Column, sj: Column): Column =
      lit(a) * (x - sj) + lit(ca) * (acc.getField("l") + acc.getField("b"))
    val folded = daily.select($"event_type", size($"vals").cast("long").as("n_days"),
      aggregate(
        sequence(lit(8), size($"vals")),
        struct(l0.as("l"), ((m2 - l0) / lit(7.0)).as("b"),
          transform(slice($"vals", 1, 7), v => v - l0).as("s")),
        (acc, i) => {
          val x = element_at($"vals", i)
          val j = (i - 1) % 7 + 1
          val sj = element_at(acc.getField("s"), j)
          struct(
            newL(acc, x, sj).as("l"),
            (lit(b) * (newL(acc, x, sj) - acc.getField("l"))
              + lit(cb) * acc.getField("b")).as("b"),
            transform(acc.getField("s"), (v, k0) =>
              when(k0 + 1 === j,
                lit(g) * (x - newL(acc, x, sj)) + lit(cg) * v)
                .otherwise(v)).as("s"))
        }).as("st"))
    def fc(h: Int): Column =
      $"st.l" + lit(h.toDouble) * $"st.b" +
        element_at($"st.s", (($"n_days" + h - 1) % 7 + 1).cast("int"))
    folded.select($"event_type", $"n_days",
        round($"st.l", 6).as("level"),
        round($"st.b", 6).as("trend"),
        round(fc(1), 6).as("forecast_1"),
        round(fc(2), 6).as("forecast_2"),
        round(fc(3), 6).as("forecast_3"))
      .orderBy($"event_type")
  }

  val holtWintersSql: String = {
    // newL spelled out verbatim everywhere it appears, matching the
    // fold's expression tree
    val nl = "0.3 * (s.vals[h.i + 1] - h.s[(h.i % 7) + 1]) + 0.7 * (h.l + h.b)"
    s"""WITH daily AS (
       |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
       |    CAST(sum(CAST(round(value, 4) AS DECIMAL(14,4))) AS DOUBLE) AS x
       |  FROM events GROUP BY 1, 2),
       |ser AS (
       |  SELECT event_type, list(x ORDER BY day) AS vals
       |  FROM daily GROUP BY 1),
       |s2 AS (SELECT event_type, vals, len(vals) AS n FROM ser
       |       WHERE len(vals) >= 15),
       |rec AS (
       |  WITH RECURSIVE h(event_type, i, l, b, s) AS (
       |    SELECT event_type, 7,
       |      (vals[1] + vals[2] + vals[3] + vals[4] + vals[5] + vals[6]
       |        + vals[7]) / 7.0,
       |      ((vals[8] + vals[9] + vals[10] + vals[11] + vals[12] + vals[13]
       |        + vals[14]) / 7.0
       |       - (vals[1] + vals[2] + vals[3] + vals[4] + vals[5] + vals[6]
       |        + vals[7]) / 7.0) / 7.0,
       |      [vals[k] - (vals[1] + vals[2] + vals[3] + vals[4] + vals[5]
       |        + vals[6] + vals[7]) / 7.0 FOR k IN [1,2,3,4,5,6,7]]
       |    FROM s2
       |    UNION ALL
       |    SELECT h.event_type, h.i + 1,
       |      $nl,
       |      0.2 * (($nl) - h.l) + 0.8 * h.b,
       |      [CASE WHEN k = (h.i % 7) + 1
       |         THEN 0.1 * (s.vals[h.i + 1] - ($nl)) + 0.9 * h.s[k]
       |         ELSE h.s[k] END FOR k IN [1,2,3,4,5,6,7]]
       |    FROM h JOIN s2 s ON h.event_type = s.event_type
       |    WHERE h.i < s.n)
       |  SELECT h.event_type, h.l, h.b, h.s FROM h JOIN s2 s
       |  ON h.event_type = s.event_type WHERE h.i = s.n)
       |SELECT s2.event_type, CAST(s2.n AS BIGINT) AS n_days,
       |  round(rec.l, 6) AS level, round(rec.b, 6) AS trend,
       |  round(rec.l + 1.0 * rec.b
       |    + rec.s[((s2.n + 0) % 7) + 1], 6) AS forecast_1,
       |  round(rec.l + 2.0 * rec.b
       |    + rec.s[((s2.n + 1) % 7) + 1], 6) AS forecast_2,
       |  round(rec.l + 3.0 * rec.b
       |    + rec.s[((s2.n + 2) % 7) + 1], 6) AS forecast_3
       |FROM s2 JOIN rec ON s2.event_type = rec.event_type
       |ORDER BY s2.event_type""".stripMargin
  }

  // ------------------------------------------------------------------
  // stl_decompose — trend / weekly-seasonal / residual decomposition
  // ------------------------------------------------------------------

  /** Classical seasonal-trend decomposition (the moving-average STL of
    * Cleveland et al. 1990 §2's inner loop, one pass, m = 7) of each
    * event type's daily value series: trend = centered 7-day moving
    * average, seasonal = per-day-of-week mean of the detrended series,
    * residual = value − trend − seasonal. The decomposition a pipeline
    * reads before alerting on raw volume: a Monday dip is seasonality,
    * not an incident ([[burstDetect]]/[[holtWinters]] consume the same
    * series; this op EXPLAINS it).
    *
    * Exactness: day values on the exact 10⁻⁴ integer grid (the file's
    * shared [[dailySeries]]); trend and seasonal are truncated integer
    * divisions (Spark `div` ≡ DuckDB `//`, both toward zero), so every
    * cell is an exact BIGINT and the output doubles are single
    * /10000-divisions. Edge days without a full ±3 window (or with a
    * day gap inside it) are excluded — n7 = 7 AND span = 6 guards
    * both, identically in each engine.
    *
    * Scale: ONE partial agg collapses the corpus to the |types|×|days|
    * day grid; the 7-day window and the dow aggregate run on that grid
    * (type-partitioned, never corpus-cardinality).
    */
  def stlDecompose(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"day_n").rowsBetween(-3, 3)
    val tr = dailySeries(spark, dir)
      .withColumn("s7", sum($"x_u").over(w))
      .withColumn("n7", count(lit(1)).over(w))
      .withColumn("span", max($"day_n").over(w) - min($"day_n").over(w))
      .filter($"n7" === 7 && $"span" === 6)
      .select($"event_type", $"day_n", $"x_u",
        expr("s7 div 7").as("trend_u"))
    val se = tr.groupBy($"event_type".as("et"), ($"day_n" % 7).as("dow"))
      .agg(expr("sum(x_u - trend_u) div count(1)").as("seasonal_u"))
    tr.join(se, tr("event_type") === se("et") && tr("day_n") % 7 === se("dow"))
      .select(tr("event_type"), $"day_n",
        round($"x_u".cast("double") / 10000d, 4).as("day_value"),
        round($"trend_u".cast("double") / 10000d, 4).as("trend"),
        round($"seasonal_u".cast("double") / 10000d, 4).as("seasonal"),
        round(($"x_u" - $"trend_u" - $"seasonal_u").cast("double") / 10000d, 4)
          .as("residual"))
      .orderBy($"event_type", $"day_n")
  }

  val stlDecomposeSql: String =
    s"""WITH daily AS ($dailySeriesSql),
      |w7 AS (
      |  SELECT event_type, day_n, x_u,
      |    CAST(sum(x_u) OVER w AS BIGINT) AS s7,
      |    CAST(count(*) OVER w AS BIGINT) AS n7,
      |    CAST(max(day_n) OVER w - min(day_n) OVER w AS BIGINT) AS span
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day_n
      |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |tr AS (
      |  SELECT event_type, day_n, x_u, s7 // 7 AS trend_u
      |  FROM w7 WHERE n7 = 7 AND span = 6),
      |se AS (
      |  SELECT event_type, day_n % 7 AS dow,
      |    CAST(sum(x_u - trend_u) AS BIGINT) // count(*) AS seasonal_u
      |  FROM tr GROUP BY 1, 2)
      |SELECT t.event_type AS event_type, t.day_n AS day_n,
      |  round(CAST(t.x_u AS DOUBLE) / 10000, 4) AS day_value,
      |  round(CAST(t.trend_u AS DOUBLE) / 10000, 4) AS trend,
      |  round(CAST(s.seasonal_u AS DOUBLE) / 10000, 4) AS seasonal,
      |  round(CAST(t.x_u - t.trend_u - s.seasonal_u AS DOUBLE) / 10000, 4) AS residual
      |FROM tr t JOIN se s ON s.event_type = t.event_type AND s.dow = t.day_n % 7
      |ORDER BY event_type, day_n""".stripMargin

  // ------------------------------------------------------------------
  // sax_symbolic — SAX symbolization of the daily series
  // ------------------------------------------------------------------

  private val SaxW = 5 // days per PAA segment

  /** SAX — Symbolic Aggregate approXimation (Lin, Keogh et al. 2003)
    * of each event type's daily value series: z-normalize, aggregate
    * into 5-day PAA segments, quantize against the alphabet-4
    * Gaussian breakpoints (±0.6745, 0) into symbols a..d. The
    * time-series-to-string reduction behind motif mining, series
    * indexing, and cheap shape matching — a year of daily values
    * becomes a ~73-char word the downstream can hash, n-gram, or
    * edit-distance like any token stream.
    *
    * Exactness: daily values and segment sums are exact DECIMAL
    * aggregates (the anomaly_zscore doctrine — never a double sum
    * whose order an engine could change); mean/std/PAA/z are each ONE
    * fixed double tree over those exact decimals (sqrt is
    * correctly-rounded IEEE in both engines); breakpoint comparisons
    * see bit-identical doubles, so symbols match exactly.
    *
    * Scale: one corpus aggregate to the (type, day) grid; everything
    * after — stats, segment windows (partitioned by type), symbol
    * map — runs on grid cardinality.
    */
  def saxSymbolic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(sum($"value".cast("decimal(18,4)")).as("dsum"))
    val stats = daily.groupBy($"event_type").agg(
        count(lit(1)).as("n"),
        sum($"dsum").as("s"),
        sum($"dsum" * $"dsum").as("ss"))
      .select($"event_type",
        ($"s".cast("double") / $"n".cast("double")).as("mean"),
        ($"ss".cast("double") / $"n".cast("double")).as("msq"))
      .select($"event_type", $"mean", sqrt($"msq" - $"mean" * $"mean").as("std"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"day")
    val segs = daily
      .withColumn("idx", row_number().over(w) - 1)
      .withColumn("seg", expr(s"CAST(idx DIV $SaxW AS BIGINT)"))
      .groupBy($"event_type", $"seg")
      .agg(count(lit(1)).as("n_days"), sum($"dsum").as("ssum"))
    segs.join(broadcast(stats), "event_type")
      .withColumn("paa", $"ssum".cast("double") / $"n_days".cast("double"))
      .withColumn("z", ($"paa" - $"mean") / $"std")
      .select($"event_type", $"seg", $"n_days",
        round($"paa", 4).as("paa"), round($"z", 6).as("z"),
        when($"z" < -0.6745, "a").when($"z" < 0.0, "b")
          .when($"z" < 0.6745, "c").otherwise("d").as("symbol"))
      .orderBy($"event_type", $"seg")
  }

  val saxSymbolicSql: String =
    s"""WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |    sum(CAST(value AS DECIMAL(18,4))) AS dsum
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, count(*) AS n, sum(dsum) AS s,
      |    sum(dsum * dsum) AS ss
      |  FROM daily GROUP BY 1),
      |m AS (
      |  SELECT event_type, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |    CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) AS msq
      |  FROM st),
      |d AS (SELECT event_type, mean, sqrt(msq - mean * mean) AS std FROM m),
      |sg AS (
      |  SELECT event_type,
      |    (row_number() OVER (PARTITION BY event_type ORDER BY day) - 1)
      |      // $SaxW AS seg,
      |    dsum
      |  FROM daily),
      |agg AS (
      |  SELECT event_type, seg, CAST(count(*) AS BIGINT) AS n_days,
      |    sum(dsum) AS ssum
      |  FROM sg GROUP BY 1, 2),
      |z AS (
      |  SELECT a.event_type, CAST(a.seg AS BIGINT) AS seg, a.n_days,
      |    CAST(a.ssum AS DOUBLE) / CAST(a.n_days AS DOUBLE) AS paa,
      |    (CAST(a.ssum AS DOUBLE) / CAST(a.n_days AS DOUBLE) - d.mean) / d.std
      |      AS zv
      |  FROM agg a JOIN d ON d.event_type = a.event_type)
      |SELECT event_type, seg, n_days, round(paa, 4) AS paa,
      |  round(zv, 6) AS z,
      |  CASE WHEN zv < -0.6745 THEN 'a' WHEN zv < 0.0 THEN 'b'
      |       WHEN zv < 0.6745 THEN 'c' ELSE 'd' END AS symbol
      |FROM z ORDER BY event_type, seg""".stripMargin

  /** Matrix-profile subsequence length (days) — also the exclusion-zone
    * radius (a subsequence may not name an overlapping one as its
    * nearest neighbor, the standard trivial-match guard). */
  val MpW = 4
  private val MpTopK = 3

  /** Hard cap on subsequence-table elements eligible for the forced
    * broadcast in [[mpDistTable]] (~16M longs ≈ a few hundred MB
    * deserialized — comfortably under a 4 GB executor's build-side
    * budget). Past it the pair join falls back to sort-merge: slower
    * (two sort exchanges over the grid) but memory-safe on deployments
    * whose calendar grid is far finer than the daily one benched here. */
  private val MpBroadcastCap = 16L << 20

  /** Matrix-profile discord discovery per event-type daily series: for
    * every length-[[MpW]] window of the series, the squared Euclidean
    * distance to its nearest NON-OVERLAPPING window (the matrix
    * profile); the top-3 windows whose nearest neighbor is FARTHEST are
    * the series' discords — the "no week ever looked like this one"
    * anomaly primitive (Yeh et al., ICDM 2016), complementing
    * [[Profile.anomalyZscore]]'s pointwise flags with shape-aware ones.
    *
    * Exactness: subsequence elements are the BIGINT 10⁻⁴-grid daily
    * sums; dist² = Σ(x_i − x_j)² is DECIMAL(38,0)-exact (|diff| ≤ ~10¹⁰
    * even at sf100 → dist² ≤ ~4·10²⁰, far under 38 digits), the argmin
    * and the discord ranking compare those integers directly, and the
    * one double division happens after both ranks are fixed — so rank,
    * neighbor, and score are bit-identical in the DuckDB mirror.
    *
    * Scale: the all-pairs step is O(m²) per series in SUBSEQUENCE
    * count m — and m is calendar-bounded (a daily grid over the corpus'
    * fixed time span), NOT data-volume-bounded: 10 years of daily data
    * is m ≈ 3.6k → 13M integer pairs per series, constant as the corpus
    * grows 100×. The pair join is keyed (type, off) — never a cross
    * product over rows — and everything upstream of it is the one
    * partial-agg scan that [[dailySeries]] shares with the whole file.
    */
  /** Shared matrix-profile machinery: the positioned daily grid `c`
    * (t = row index, n = series length per type) and the exact-integer
    * pair-distance table `dist` (event_type, i, j, dist2) over every
    * non-overlapping window pair — consumed by both the discord and
    * the motif readout. */
  private def mpDistTable(spark: SparkSession,
                          dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"day_n")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type")
    val d38 = "decimal(38,0)"
    // persisted: read by the sub self-join (both sides), the broadcast
    // gate's count, and the caller's position readout
    val c = dailySeries(spark, dir)
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .persist()
    // subsequence elements: (type, window start i, offset 0..MpW-1, x)
    val sub = c.as("a").join(c.as("b"),
        $"a.event_type" === $"b.event_type" &&
          $"b.t" >= $"a.t" && $"b.t" <= $"a.t" + (MpW - 1))
      .filter($"a.t" <= $"a.n" - (MpW - 1))
      .select($"a.event_type".as("event_type"), $"a.t".as("i"),
        ($"b.t" - $"a.t").as("off"), $"b.x_u".as("x"))
    // exact integer dist² for every non-overlapping window pair; the
    // build side is the WHOLE subsequence table — calendar-bounded
    // (m·MpW·|types| rows, ~1.4M for 10 years of daily grid). The
    // broadcast saves the sort exchanges a grid-sized sort-merge join
    // would pay, but "calendar-bounded" is a deployment assumption, not
    // a law: a minute-grained grid over many types blows past executor
    // memory. So the hint is GATED on a measured bound — c is already
    // persisted (also read by the sub self-join and the caller's
    // readout), its count is one scalar, and past MpBroadcastCap
    // subsequence elements the join falls back to Spark's default
    // sort-merge strategy instead of force-shipping the table.
    val subElems = c.count() * MpW // upper bound on sub's row count
    val rSide = if (subElems <= MpBroadcastCap) broadcast(sub.as("r"))
                else sub.as("r")
    val dist = sub.as("s").join(rSide,
        $"s.event_type" === $"r.event_type" && $"s.off" === $"r.off")
      .filter(abs($"s.i" - $"r.i") >= MpW)
      .select($"s.event_type".as("event_type"), $"s.i".as("i"), $"r.i".as("j"),
        (($"s.x" - $"r.x").cast(d38) * ($"s.x" - $"r.x").cast(d38))
          .cast(d38).as("sq"))
      .groupBy($"event_type", $"i", $"j")
      .agg(sum($"sq").cast(d38).as("dist2"))
    (c, dist)
  }

  def matrixProfileDiscords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (c, dist) = mpDistTable(spark, dir)
    val wNN = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type", $"i").orderBy($"dist2", $"j")
    val wDiscord = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"dist2".desc, $"i")
    val out = dist
      .withColumn("rk_nn", row_number().over(wNN)).filter($"rk_nn" === 1)
      .withColumn("rk", row_number().over(wDiscord)).filter($"rk" <= MpTopK)
      .join(c.select($"event_type", $"t".as("i"), $"day_n"), Seq("event_type", "i"))
      .select($"event_type", $"rk", $"i".as("pos"), $"day_n".as("start_day"),
        $"j".as("nn_pos"),
        round($"dist2".cast("double") / 1e8, 4).as("mp_dist"))
      .orderBy($"event_type", $"rk")
    Release.grid(out, c) // MpTopK rows per series
  }

  /** Shared oracle CTEs for the matrix-profile pair: daily grid,
    * positioned series, subsequences, exact pair distances. */
  private val mpBaseSql: String =
    s"""WITH daily AS ($dailySeriesSql),
      |c AS (
      |  SELECT event_type, day_n, x_u,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day_n)
      |      AS BIGINT) AS t,
      |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM daily),
      |sub AS (
      |  SELECT a.event_type, a.t AS i, b.t - a.t AS off, b.x_u AS x
      |  FROM c a JOIN c b ON b.event_type = a.event_type
      |    AND b.t BETWEEN a.t AND a.t + ${MpW - 1}
      |  WHERE a.t <= a.n - ${MpW - 1}),
      |dist AS (
      |  SELECT s.event_type, s.i, r.i AS j,
      |    CAST(sum(CAST(s.x - r.x AS DECIMAL(38,0))
      |      * CAST(s.x - r.x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS dist2
      |  FROM sub s JOIN sub r ON r.event_type = s.event_type
      |    AND r.off = s.off AND abs(s.i - r.i) >= $MpW
      |  GROUP BY 1, 2, 3)""".stripMargin

  val matrixProfileDiscordsSql: String =
    s"""$mpBaseSql,
      |nn AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type, i
      |    ORDER BY dist2, j) AS rk_nn FROM dist),
      |disc AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY dist2 DESC, i) AS rk
      |  FROM nn WHERE rk_nn = 1)
      |SELECT d.event_type, d.rk, d.i AS pos, c.day_n AS start_day,
      |  d.j AS nn_pos,
      |  round(CAST(d.dist2 AS DOUBLE) / 100000000, 4) AS mp_dist
      |FROM disc d JOIN c ON c.event_type = d.event_type AND c.t = d.i
      |WHERE d.rk <= $MpTopK ORDER BY d.event_type, d.rk""".stripMargin

  /** Matrix-profile MOTIF discovery — the discord readout's twin: the
    * top-3 CLOSEST non-overlapping window pairs per series (smallest
    * exact dist², i < j dedups the symmetric pair) — "which week shape
    * repeats most exactly", the recurring-pattern primitive the same
    * Yeh et al. profile serves. Same shared [[mpDistTable]] machinery,
    * same calendar-bounded cost, same integer-exact ranking.
    */
  def matrixProfileMotifs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (c, dist) = mpDistTable(spark, dir)
    val wMotif = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"dist2", $"i", $"j")
    val out = dist.filter($"i" < $"j")
      .withColumn("rk", row_number().over(wMotif)).filter($"rk" <= MpTopK)
      .join(c.select($"event_type", $"t".as("i"), $"day_n".as("day_a")),
        Seq("event_type", "i"))
      .join(c.select($"event_type", $"t".as("j"), $"day_n".as("day_b")),
        Seq("event_type", "j"))
      .select($"event_type", $"rk", $"i".as("pos_a"), $"j".as("pos_b"),
        $"day_a", $"day_b",
        round($"dist2".cast("double") / 1e8, 4).as("mp_dist"))
      .orderBy($"event_type", $"rk")
    Release.grid(out, c) // MpTopK rows per series
  }

  val matrixProfileMotifsSql: String =
    s"""$mpBaseSql,
      |mot AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY dist2, i, j) AS rk
      |  FROM dist WHERE i < j)
      |SELECT m.event_type, m.rk, m.i AS pos_a, m.j AS pos_b,
      |  ca.day_n AS day_a, cb.day_n AS day_b,
      |  round(CAST(m.dist2 AS DOUBLE) / 100000000, 4) AS mp_dist
      |FROM mot m
      |JOIN c ca ON ca.event_type = m.event_type AND ca.t = m.i
      |JOIN c cb ON cb.event_type = m.event_type AND cb.t = m.j
      |WHERE m.rk <= $MpTopK ORDER BY m.event_type, m.rk""".stripMargin
}
