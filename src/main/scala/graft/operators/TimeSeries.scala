package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Relational.{dec, sqlDec}

/** Time-series operators: as-of join, range join, time-bucketed aggs.
  *
  * The as-of join uses the union-and-carry-forward pattern instead of a
  * per-key O(events × orders) range join: both sides are tagged, unioned,
  * and a single `last(_, ignoreNulls)` window carries the most recent
  * order forward onto each event. One shuffle on the key, one sort —
  * this is the plan that survives 100 TB, where a naive
  * join-then-max-per-event would shuffle the cross product.
  */
object TimeSeries {

  /** As-of join: each event picks the most recent order (same key,
    * o_orderdate <= ts). Orders deduped to one row per (key, date) with
    * max orderkey so the result is deterministic.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .groupBy($"o_custkey".as("k"), $"o_orderdate".as("t"))
      .agg(max($"o_orderkey").as("o_key"))
      .select($"k", $"t", $"o_key", lit(null).cast("long").as("event_id"), lit(0).as("src"))
    val events = Tables.events(spark, dir)
      .select($"user_id".as("k"), $"ts".as("t"), lit(null).cast("long").as("o_key"),
        $"event_id", lit(1).as("src"))
    // orders sort before events at equal t (src asc) → "<=" semantics
    val w = Window.partitionBy($"k").orderBy($"t", $"src", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.unionByName(events)
      .withColumn("asof_order", last($"o_key", ignoreNulls = true).over(w))
      .filter($"src" === 1 && $"asof_order".isNotNull)
      .select($"event_id", $"k".as("user_id"), $"asof_order")
      .orderBy($"event_id")
  }

  val asofJoinSql: String =
    """SELECT e.event_id, e.user_id, o.o_key AS asof_order
      |FROM events e ASOF JOIN
      |  (SELECT o_custkey AS k, o_orderdate AS t, max(o_orderkey) AS o_key
      |   FROM orders GROUP BY o_custkey, o_orderdate) o
      |  ON e.user_id = o.k AND e.ts >= o.t
      |ORDER BY e.event_id""".stripMargin

  /** FORWARD as-of: each order joined to the customer's FIRST event
    * at-or-after the order date (the dual of [[asofJoin]]'s
    * last-at-or-before — time-to-first-activity). Same union +
    * carry-forward shape, scanned on the reversed time axis — still one
    * shuffle, no range-join blowup. Integer-second timestamps keep the
    * comparison exact in both engines.
    *
    * Direction note (the r10 de-vacuization): this corpus's synthetic
    * event epoch sits decades AFTER every TPC-H order date, so the
    * events→next-order direction matched zero rows at every SF — a
    * hash-green-on-emptiness oracle that never exercised the carry.
    * orders→next-event is forward-reachable on the same data (every
    * order whose customer has any event matches), so the reversed-axis
    * carry, the ignore-nulls fill, and the src ordering all execute
    * under the driver's oracle; the equal-timestamp inclusive branch is
    * additionally pinned by a planted-fixture spec through
    * [[forwardCarry]].
    */
  def asofJoinForward(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val seek = Tables.orders(spark, dir)
      .groupBy($"o_custkey".as("k"),
        unix_timestamp($"o_orderdate".cast("timestamp")).as("t_s"))
      .agg(max($"o_orderkey").as("id"))
      .select($"k", $"t_s", $"id")
    val mat = Tables.events(spark, dir)
      .groupBy($"user_id".as("k"), expr("ts_ns div 1000000000").as("t_s"))
      .agg(min($"event_id").as("m_key"))
      .select($"k", $"t_s", $"m_key")
    forwardCarry(seek, mat)
      .select($"id".as("o_key"), $"k".as("custkey"), $"next_key".as("next_event"))
      .orderBy($"o_key")
  }

  /** The reversed-axis forward-carry kernel: for every seeker row
    * (k, t_s, id), the match row (k, t_s, m_key) with the SMALLEST
    * t_s ≥ the seeker's (inclusive — at equal t_s the match sorts
    * before the seeker on the reversed axis). One hash shuffle on k,
    * one window sort, ignore-nulls fill; callers dedupe matches to one
    * per (k, t_s). Factored so specs can plant equal-timestamp ties.
    */
  private[graft] def forwardCarry(seek: DataFrame, mat: DataFrame): DataFrame = {
    val spark = seek.sparkSession
    import spark.implicits._
    val s = seek.select($"k", $"t_s", $"id",
      lit(null).cast("long").as("m_key"), lit(1).as("src"))
    val m = mat.select($"k", $"t_s", lit(null).cast("long").as("id"),
      $"m_key", lit(0).as("src"))
    val w = Window.partitionBy($"k")
      .orderBy($"t_s".desc, $"src", coalesce($"m_key", $"id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s.unionByName(m)
      .withColumn("next_key", last($"m_key", ignoreNulls = true).over(w))
      .filter($"src" === 1 && $"next_key".isNotNull)
      .select($"id", $"k", $"t_s", $"next_key")
  }

  val asofJoinForwardSql: String =
    """SELECT o.o_key, o.k AS custkey, e.ev AS next_event
      |FROM (SELECT o_custkey AS k, epoch_ns(CAST(o_orderdate AS TIMESTAMP)) // 1000000000 AS t,
      |        max(o_orderkey) AS o_key
      |      FROM orders GROUP BY 1, 2) o
      |ASOF JOIN
      |  (SELECT user_id AS k, epoch_ns(ts) // 1000000000 AS t, min(event_id) AS ev
      |   FROM events GROUP BY 1, 2) e
      |  ON o.k = e.k AND o.t <= e.t
      |ORDER BY o.o_key""".stripMargin

  /** As-of join with a TOLERANCE bound (pandas merge_asof's
    * `tolerance`): the backward match is kept only while the matched
    * order is at most `toleranceS` seconds stale — bounding how old a
    * carried-forward quote/dimension row may be, the guard production
    * as-of pipelines run to avoid joining against dead state. Same
    * union + carry-forward single-shuffle shape as [[asofJoin]]; the
    * bound is a residual filter on the carried timestamp, so the plan
    * is unchanged. (Default sized to this corpus: the synthetic event
    * epoch sits decades after the TPC-H order dates, so a calendar-week
    * tolerance would be vacuous here.)
    */
  def asofJoinTolerance(spark: SparkSession, dir: String,
                        toleranceS: Long = 723000000L): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .groupBy($"o_custkey".as("k"),
        unix_timestamp($"o_orderdate".cast("timestamp")).as("t_s"))
      .agg(max($"o_orderkey").as("o_key"))
      .select($"k", $"t_s", $"o_key", lit(null).cast("long").as("event_id"),
        lit(0).as("src"))
    val events = Tables.events(spark, dir)
      .select($"user_id".as("k"), expr("ts_ns div 1000000000").as("t_s"),
        lit(null).cast("long").as("o_key"), $"event_id", lit(1).as("src"))
    val ord = when($"src" === 0, struct($"t_s".as("t"), $"o_key".as("key")))
    val w = Window.partitionBy($"k").orderBy($"t_s", $"src", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.unionByName(events)
      .withColumn("bwd", last(ord, ignoreNulls = true).over(w))
      .filter($"src" === 1 && $"bwd".isNotNull &&
        ($"t_s" - $"bwd.t") <= toleranceS)
      .select($"event_id", $"k".as("user_id"), $"bwd.key".as("asof_order"),
        ($"t_s" - $"bwd.t").as("staleness_s"))
      .orderBy($"event_id")
  }

  val asofJoinToleranceSql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS t FROM events),
      |o AS (SELECT o_custkey AS k, epoch_ns(CAST(o_orderdate AS TIMESTAMP)) // 1000000000 AS t,
      |        max(o_orderkey) AS o_key
      |      FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, o.o_key AS asof_order, e.t - o.t AS staleness_s
      |FROM e ASOF JOIN o ON e.user_id = o.k AND e.t >= o.t
      |WHERE e.t - o.t <= 723000000
      |ORDER BY e.event_id""".stripMargin

  /** NEAREST as-of: each event joined to whichever order is closest in
    * time, before or after (ties → the earlier/backward order). Both
    * directional carries share ONE hash shuffle on the key — two window
    * sorts over the same partitioning, no second exchange — then a
    * per-row delta comparison picks the side.
    */
  def asofJoinNearest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .groupBy($"o_custkey".as("k"),
        unix_timestamp($"o_orderdate".cast("timestamp")).as("t_s"))
      .agg(max($"o_orderkey").as("o_key"))
      .select($"k", $"t_s", $"o_key", lit(null).cast("long").as("event_id"),
        lit(0).as("src"))
    val events = Tables.events(spark, dir)
      .select($"user_id".as("k"), expr("ts_ns div 1000000000").as("t_s"),
        lit(null).cast("long").as("o_key"), $"event_id", lit(1).as("src"))
    val ord = when($"src" === 0, struct($"t_s".as("t"), $"o_key".as("key")))
    val wB = Window.partitionBy($"k").orderBy($"t_s", $"src", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy($"k").orderBy($"t_s".desc, $"src", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val useFwd = $"bwd".isNull ||
      ($"fwd".isNotNull && ($"fwd.t" - $"t_s") < ($"t_s" - $"bwd.t"))
    orders.unionByName(events)
      .withColumn("bwd", last(ord, ignoreNulls = true).over(wB))
      .withColumn("fwd", last(ord, ignoreNulls = true).over(wF))
      .filter($"src" === 1 && ($"bwd".isNotNull || $"fwd".isNotNull))
      .select($"event_id", $"k".as("user_id"),
        when(useFwd, $"fwd.key").otherwise($"bwd.key").as("near_order"),
        when(useFwd, $"fwd.t" - $"t_s").otherwise($"t_s" - $"bwd.t").as("delta_s"))
      .orderBy($"event_id")
  }

  val asofJoinNearestSql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS t FROM events),
      |o AS (SELECT o_custkey AS k, epoch_ns(CAST(o_orderdate AS TIMESTAMP)) // 1000000000 AS t,
      |        max(o_orderkey) AS o_key
      |      FROM orders GROUP BY 1, 2),
      |b AS (SELECT e.event_id, o.o_key, o.t FROM e ASOF LEFT JOIN o
      |        ON e.user_id = o.k AND e.t >= o.t),
      |f AS (SELECT e.event_id, o.o_key, o.t FROM e ASOF LEFT JOIN o
      |        ON e.user_id = o.k AND e.t <= o.t)
      |SELECT e.event_id, e.user_id,
      |  CASE WHEN b.o_key IS NULL OR (f.o_key IS NOT NULL AND (f.t - e.t) < (e.t - b.t))
      |       THEN f.o_key ELSE b.o_key END AS near_order,
      |  CASE WHEN b.o_key IS NULL OR (f.o_key IS NOT NULL AND (f.t - e.t) < (e.t - b.t))
      |       THEN f.t - e.t ELSE e.t - b.t END AS delta_s
      |FROM e
      |JOIN b ON e.event_id = b.event_id
      |JOIN f ON e.event_id = f.event_id
      |WHERE b.o_key IS NOT NULL OR f.o_key IS NOT NULL
      |ORDER BY e.event_id""".stripMargin

  /** Range join: for each purchase, the click/view activity of the same
    * user in the preceding hour. Key equality makes this a plain shuffled
    * hash join with a residual range predicate — no interval-join blowup.
    * Times compared at whole-second granularity (exact in both engines
    * regardless of the source's nanosecond precision).
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("p_event"),
        expr("ts_ns div 1000000000").as("p_s"))
    val a = e.filter($"event_type" === "click" || $"event_type" === "view")
      .select($"user_id".as("a_user"), expr("ts_ns div 1000000000").as("a_s"),
        $"value".as("a_value"))
    p.join(a, $"p_user" === $"a_user" && $"a_s" >= $"p_s" - 3600 && $"a_s" <= $"p_s")
      .groupBy($"p_event")
      .agg(count(lit(1)).as("n_activity"),
        sum(dec($"a_value")).cast("double").as("activity_value"))
      .orderBy($"p_event")
  }

  val rangeJoinSql: String =
    s"""SELECT p.event_id AS p_event, count(*) AS n_activity,
      |  CAST(sum(${sqlDec("a.value")}) AS DOUBLE) AS activity_value
      |FROM (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS s
      |      FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT user_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS s
      |      FROM events WHERE event_type IN ('click','view')) a
      |  ON p.user_id = a.user_id AND a.s >= p.s - 3600 AND a.s <= p.s
      |GROUP BY p.event_id ORDER BY p_event""".stripMargin

  /** Tumbling-window aggregation on batch data (hourly buckets). */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"event_type")
      .agg(count(lit(1)).as("n"), sum(dec($"value")).cast("double").as("total_value"))
      .orderBy($"hour", $"event_type")
  }

  val eventsHourlySql: String =
    s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
      |  count(*) AS n, CAST(sum(${sqlDec("value")}) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Hourly OHLC resample of the event value series — the
    * `resample('1h').ohlc()` every time-series store ships: per hour
    * the FIRST and LAST observed value in exact event order (open /
    * close), the extremes (high / low), the row count, and the exact
    * decimal mean. Open/close need a total order within the bucket:
    * the (ts_ns, event_id) pair is unique and identical in both
    * engines, so the row_number picks are deterministic; high/low/mean
    * are order-free (max/min, decimal sum).
    *
    * Scale: two row_number windows PARTITIONED by the hour bucket
    * (key-partitioned, never a global sort) feeding one hour-keyed
    * partial aggregate; output is time-axis cardinality. At 100 TB
    * the windows and the aggregate share the hour exchange. */
  def resampleOhlc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"value", $"ts_ns", $"event_id")
    val wa = Window.partitionBy($"hour").orderBy($"ts_ns", $"event_id")
    val wd = Window.partitionBy($"hour").orderBy($"ts_ns".desc, $"event_id".desc)
    ev.withColumn("ra", row_number().over(wa))
      .withColumn("rd", row_number().over(wd))
      .groupBy($"hour")
      .agg(count(lit(1)).as("n"),
        max(when($"ra" === 1, $"value")).as("open0"),
        max($"value").as("high0"),
        min($"value").as("low0"),
        max(when($"rd" === 1, $"value")).as("close0"),
        sum(dec($"value")).as("sv"))
      .select($"hour", $"n",
        round($"open0", 6).as("open"), round($"high0", 6).as("high"),
        round($"low0", 6).as("low"), round($"close0", 6).as("close"),
        round($"sv".cast("double") / $"n".cast("double"), 6).as("mean_value"))
      .orderBy($"hour")
  }

  val resampleOhlcSql: String =
    s"""WITH e AS (
      |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |    value,
      |    row_number() OVER (PARTITION BY date_trunc('hour', ts)
      |      ORDER BY epoch_ns(ts), event_id) AS ra,
      |    row_number() OVER (PARTITION BY date_trunc('hour', ts)
      |      ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rd
      |  FROM events)
      |SELECT hour, CAST(count(*) AS BIGINT) AS n,
      |  round(max(CASE WHEN ra = 1 THEN value END), 6) AS open,
      |  round(max(value), 6) AS high,
      |  round(min(value), 6) AS low,
      |  round(max(CASE WHEN rd = 1 THEN value END), 6) AS close,
      |  round(CAST(sum(${sqlDec("value")}) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
      |    AS mean_value
      |FROM e GROUP BY hour ORDER BY hour""".stripMargin

  /** Classical seasonal decomposition of the hourly event-count series
    * per type: value = trend + seasonal + residual. The series is
    * DENSIFIED first (hour spine per type, zero-filled — a moving
    * average over a gappy series would silently mix non-adjacent
    * hours); trend is a centered 25-hour moving average (null at the
    * edges where the window is short), seasonality is the hour-of-day
    * mean of the detrended series (6dp-quantized decimal mean, so the
    * unordered group sum is exact), residual is what remains. One
    * event_type-keyed window shuffle + one (type, hour-of-day)
    * aggregate; the spine is |types| × span-hours, ∝ time not data.
    */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"event_type", expr("ts_ns div 3600000000000").as("h"))
    val cnts = e.groupBy($"event_type", $"h").agg(count(lit(1)).as("cnt"))
    val span = e.agg(min($"h").as("h0"), max($"h").as("h1"))
    val spine = e.select($"event_type").distinct()
      .crossJoin(broadcast(span))
      .select($"event_type", explode(sequence($"h0", $"h1")).as("h"))
    val dense = spine.join(cnts, Seq("event_type", "h"), "left")
      .select($"event_type", $"h", coalesce($"cnt", lit(0L)).as("cnt"))
    val wRows = Window.partitionBy($"event_type").orderBy($"h")
      .rowsBetween(-12, 12)
    val t1 = dense
      .withColumn("trend",
        when(count(lit(1)).over(wRows) === 25,
          sum($"cnt").over(wRows).cast("double") / 25.0))
      .withColumn("detrended", $"cnt".cast("double") - $"trend")
      .withColumn("hod", expr("h % 24"))
    val seas = t1.filter($"detrended".isNotNull)
      .groupBy($"event_type", $"hod")
      .agg((sum(round($"detrended", 6).cast("decimal(20,6)")).cast("double")
        / count(lit(1)).cast("double")).as("seasonal"))
    t1.join(seas, Seq("event_type", "hod"), "left")
      .select($"event_type", $"h", $"cnt",
        round($"trend", 6).as("trend"),
        round($"seasonal", 6).as("seasonal"),
        round($"detrended" - $"seasonal", 6).as("residual"))
      .orderBy($"event_type", $"h")
  }

  val seasonalDecomposeSql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS h FROM events),
      |cnts AS (SELECT event_type, h, count(*) AS cnt FROM e GROUP BY 1, 2),
      |span AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
      |spine AS (
      |  SELECT event_type, unnest(range(h0, h1 + 1)) AS h
      |  FROM (SELECT DISTINCT event_type FROM e), span),
      |dense AS (
      |  SELECT s.event_type, s.h, coalesce(c.cnt, 0) AS cnt
      |  FROM spine s LEFT JOIN cnts c ON s.event_type = c.event_type AND s.h = c.h),
      |t1 AS (
      |  SELECT event_type, h, cnt,
      |    CASE WHEN count(*) OVER w = 25
      |      THEN CAST(sum(cnt) OVER w AS DOUBLE) / 25.0 END AS trend
      |  FROM dense
      |  WINDOW w AS (PARTITION BY event_type ORDER BY h
      |               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
      |t2 AS (
      |  SELECT *, CAST(cnt AS DOUBLE) - trend AS detrended, h % 24 AS hod FROM t1),
      |seas AS (
      |  SELECT event_type, hod,
      |    CAST(sum(CAST(round(detrended, 6) AS DECIMAL(20,6))) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE) AS seasonal
      |  FROM t2 WHERE detrended IS NOT NULL GROUP BY event_type, hod)
      |SELECT t2.event_type, t2.h, t2.cnt,
      |  round(t2.trend, 6) AS trend,
      |  round(s.seasonal, 6) AS seasonal,
      |  round(t2.detrended - s.seasonal, 6) AS residual
      |FROM t2 LEFT JOIN seas s ON t2.event_type = s.event_type AND t2.hod = s.hod
      |ORDER BY t2.event_type, t2.h""".stripMargin

  /** Gap-filled resampling: 15-minute buckets over the full event span,
    * with empty buckets materialized (n=0, total 0) and a carry-forward
    * of the last observed bucket total — the densification step every
    * time-series consumer needs before charting/forecasting, done
    * without a driver loop: the bucket spine is one `sequence` +
    * explode from a broadcast (min,max) scalar pair, the carry is one
    * ordered window. Bucket ids are exact integer ns-divisions, so the
    * spine and the oracle's generate_series agree bucket-for-bucket.
    */
  def resampleFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucketNs = 900L * 1000000000L // 15 min
    // integer division semantics: div truncates toward zero == floor for
    // the positive epoch range
    val agg = Tables.events(spark, dir)
      .withColumn("bucket", expr(s"ts_ns div ${bucketNs}L"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,4)")).cast("double").as("total_value"))
    val span = agg.agg(min($"bucket").as("lo"), max($"bucket").as("hi"))
    val spine = span.select(explode(sequence($"lo", $"hi")).as("bucket"))
    val filled = spine.join(agg, Seq("bucket"), "left")
      .select($"bucket",
        coalesce($"n", lit(0L)).as("n"),
        coalesce($"total_value", lit(0.0)).as("total_value"),
        when($"n".isNotNull, $"total_value").as("observed"))
    val w = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled
      .withColumn("carry_value", last($"observed", ignoreNulls = true).over(w))
      .select($"bucket", $"n", $"total_value", $"carry_value")
      .orderBy($"bucket")
  }

  val resampleFillSql: String =
    """WITH b AS (
      |  SELECT epoch_ns(ts) // 900000000000 AS bucket,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |  FROM events GROUP BY 1),
      |spine AS (
      |  SELECT unnest(generate_series((SELECT min(bucket) FROM b),
      |                                (SELECT max(bucket) FROM b))) AS bucket),
      |filled AS (
      |  SELECT s.bucket, coalesce(b.n, 0) AS n,
      |    coalesce(b.total_value, 0.0) AS total_value,
      |    b.total_value AS observed
      |  FROM spine s LEFT JOIN b ON s.bucket = b.bucket)
      |SELECT bucket, n, total_value,
      |  last_value(observed IGNORE NULLS) OVER (ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry_value
      |FROM filled ORDER BY bucket""".stripMargin

  /** Sliding-window aggregation on batch data: 1-hour windows advancing
    * every 15 minutes, so each event lands in exactly 4 overlapping
    * windows. Uses Spark's native `window()` generator — the same
    * operator Structured Streaming plans for sliding event-time aggs —
    * which expands rows map-side (no self-join against a window spine)
    * and feeds one partial-aggregated shuffle on (window, event_type).
    * Epoch-aligned starts make the bucketing reproducible from the raw
    * nanosecond timestamps in any engine.
    */
  def slidingWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), sum(dec($"value")).cast("double").as("total_value"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("w_start"),
        $"event_type", $"n", $"total_value")
      .orderBy($"w_start", $"event_type")
  }

  val slidingWindowAggSql: String =
    s"""WITH x AS (
      |  SELECT event_type, value, epoch_ns(ts) // 900000000000 AS slot
      |  FROM events),
      |w AS (
      |  SELECT event_type, value, (slot - k.k) * 900000000 AS w_us
      |  FROM x CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k)
      |SELECT strftime(make_timestamp(w_us), '%Y-%m-%d %H:%M:%S') AS w_start,
      |  event_type, count(*) AS n,
      |  CAST(sum(${sqlDec("value")}) AS DOUBLE) AS total_value
      |FROM w GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin

  /** Per-key exponential smoothing (EWMA, α=0.3): s₀ = x₀,
    * sᵢ = α·xᵢ + (1-α)·sᵢ₋₁ over each user's events in strict
    * (ts, event_id) order. The fold is inherently sequential PER KEY, so
    * the distributed shape is: one shuffle groups each key's events,
    * `collect_list` + `array_sort` orders them, and a single `aggregate`
    * HOF folds left-to-right — keys fan out across executors, and the
    * fixed fold order makes the float result bit-identical in any
    * engine. (State is bounded by max events per key; a web-scale key
    * would chunk by day and carry the tail forward.)
    */
  def ewmaSmooth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val alpha = 0.3
    val sorted = Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(array_sort(collect_list(struct($"ts_ns", $"event_id", $"value"))).as("evs"))
      // vals referenced 3× below (element_at/slice/size) — one projection
      // so CollapseProject cannot inline the transform into each use
      .select($"user_id", transform($"evs", e => e.getField("value")).as("vals"))
    sorted.select($"user_id",
        size($"vals").cast("long").as("n_events"),
        round(aggregate(slice($"vals", lit(2), size($"vals") - 1),
          element_at($"vals", 1),
          (acc, x) => lit(alpha) * x + lit(1 - alpha) * acc), 6).as("ewma"))
      .orderBy($"user_id")
  }

  val ewmaSmoothSql: String =
    """SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events,
      |  round(list_reduce(vals, (a, b) -> 0.3 * b + 0.7 * a), 6) AS ewma
      |FROM (SELECT user_id, list(value ORDER BY epoch_ns(ts), event_id) AS vals
      |      FROM events GROUP BY user_id)
      |ORDER BY user_id""".stripMargin

  /** Holt double-exponential smoothing per user (level + trend,
    * α=0.3, β=0.2; init ℓ=x₁, b=x₂−x₁, fold from x₂): the coupled
    * recurrence runs as a HOF fold with a STRUCT accumulator — still
    * one codegen'd pass per row, no UDF, same shuffle profile as ewma.
    * The one-step-ahead forecast ℓ+b is the per-entity trend signal.
    * The oracle replays the identical float-operation order through a
    * recursive CTE (newL recomputed rather than bound, exactly as the
    * fold's expression tree does), so results are bit-identical.
    */
  def holtForecast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // literals mirrored verbatim in the oracle: 1−0.3 in driver-side
    // double arithmetic need not equal the literal 0.7
    val (a, ca, b, cb) = (0.3, 0.7, 0.2, 0.8)
    val sorted = Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(array_sort(collect_list(struct($"ts_ns", $"event_id", $"value"))).as("evs"))
      .select($"user_id", transform($"evs", e => e.getField("value")).as("vals"))
      .filter(size($"vals") >= 2)
    def newL(acc: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      lit(a) * x + lit(ca) * (acc.getField("l") + acc.getField("b"))
    val folded = sorted.select($"user_id",
      size($"vals").cast("long").as("n_events"),
      aggregate(
        slice($"vals", lit(2), size($"vals") - 1),
        struct(element_at($"vals", 1).as("l"),
          (element_at($"vals", 2) - element_at($"vals", 1)).as("b")),
        (acc, x) => struct(newL(acc, x).as("l"),
          (lit(b) * (newL(acc, x) - acc.getField("l"))
            + lit(cb) * acc.getField("b")).as("b"))).as("st"))
    folded.select($"user_id", $"n_events",
        round($"st.l", 6).as("level"),
        round($"st.b", 6).as("trend"),
        round($"st.l" + $"st.b", 6).as("forecast_next"))
      .orderBy($"user_id")
  }

  val holtForecastSql: String =
    """WITH seq AS (
      |  SELECT user_id, list(value ORDER BY epoch_ns(ts), event_id) AS vals
      |  FROM events GROUP BY user_id),
      |s2 AS (SELECT user_id, vals, len(vals) AS n FROM seq WHERE len(vals) >= 2),
      |rec AS (
      |  WITH RECURSIVE h(user_id, i, l, b) AS (
      |    SELECT user_id, 1, vals[1], vals[2] - vals[1] FROM s2
      |    UNION ALL
      |    SELECT h.user_id, h.i + 1,
      |      0.3 * s.vals[h.i + 1] + 0.7 * (h.l + h.b),
      |      0.2 * ((0.3 * s.vals[h.i + 1] + 0.7 * (h.l + h.b)) - h.l) + 0.8 * h.b
      |    FROM h JOIN s2 s ON h.user_id = s.user_id
      |    WHERE h.i < s.n)
      |  SELECT h.user_id, h.l, h.b FROM h JOIN s2 s ON h.user_id = s.user_id
      |  WHERE h.i = s.n)
      |SELECT s2.user_id, CAST(s2.n AS BIGINT) AS n_events,
      |  round(rec.l, 6) AS level, round(rec.b, 6) AS trend,
      |  round(rec.l + rec.b, 6) AS forecast_next
      |FROM s2 JOIN rec ON s2.user_id = rec.user_id
      |ORDER BY s2.user_id""".stripMargin

  /** Ordered 3-stage funnel: signup → first subsequent click → first
    * subsequent purchase, per user, in STRICT event-time order (a
    * purchase before the click doesn't count — the distinction naive
    * per-type-count funnels miss). Three narrowing aggregates, each
    * keyed on user_id so the per-user joins co-partition; exact
    * nanosecond ordering via ts_ns. Output: one row of stage counts
    * and conversion rates.
    */
  def funnelConversion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
    val signup = e.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts_ns").as("t_signup"))
    val click = e.filter($"event_type" === "click")
      .join(signup, "user_id")
      .filter($"ts_ns" > $"t_signup")
      .groupBy($"user_id").agg(min($"ts_ns").as("t_click"))
    val purchase = e.filter($"event_type" === "purchase")
      .join(click, "user_id")
      .filter($"ts_ns" > $"t_click")
      .groupBy($"user_id").agg(min($"ts_ns").as("t_purchase"))
    // single-row stage counts composed lazily — no driver-side counts
    e.agg(countDistinct($"user_id").as("n_users"))
      .crossJoin(signup.agg(count(lit(1)).as("n_signup")))
      .crossJoin(click.agg(count(lit(1)).as("n_click_after")))
      .crossJoin(purchase.agg(count(lit(1)).as("n_purchase_after")))
      .select($"n_users", $"n_signup", $"n_click_after", $"n_purchase_after",
        round($"n_signup".cast("double") / $"n_users".cast("double"), 6)
          .as("signup_rate"),
        round($"n_click_after".cast("double")
          / greatest($"n_signup", lit(1L)).cast("double"), 6).as("click_rate"),
        round($"n_purchase_after".cast("double")
          / greatest($"n_click_after", lit(1L)).cast("double"), 6).as("purchase_rate"))
  }

  val funnelConversionSql: String =
    """WITH s AS (
      |  SELECT user_id, min(epoch_ns(ts)) AS t_signup FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(epoch_ns(e.ts)) AS t_click
      |  FROM events e JOIN s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'click' AND epoch_ns(e.ts) > s.t_signup
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.t_click
      |  GROUP BY e.user_id)
      |SELECT
      |  CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT) AS n_users,
      |  CAST((SELECT count(*) FROM s) AS BIGINT) AS n_signup,
      |  CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_after,
      |  CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_after,
      |  round(CAST((SELECT count(*) FROM s) AS DOUBLE)
      |    / CAST((SELECT count(DISTINCT user_id) FROM events) AS DOUBLE), 6) AS signup_rate,
      |  round(CAST((SELECT count(*) FROM c) AS DOUBLE)
      |    / CAST(greatest((SELECT count(*) FROM s), 1) AS DOUBLE), 6) AS click_rate,
      |  round(CAST((SELECT count(*) FROM p) AS DOUBLE)
      |    / CAST(greatest((SELECT count(*) FROM c), 1) AS DOUBLE), 6) AS purchase_rate""".stripMargin

  // ------------------------------------------------------------------
  // funnel_latency — step-to-step conversion latency distribution
  // ------------------------------------------------------------------

  /** Conversion-latency profile of the [[funnelConversion]] funnel:
    * for each step pair (signup→click, click→purchase), the count of
    * converting users and the latency distribution (p50/p90/max,
    * mean) in whole seconds — funnelConversion answers "how many
    * convert", this answers "how long conversion takes", which is
    * what the [[windowFunnel]] 7-day bound should be calibrated FROM
    * rather than guessed.
    *
    * Exactness: latencies are exact integer second diffs (ns DIV
    * 10⁹ — the values are < 2⁵³ so the percentile interpolation sees
    * exactly-representable doubles, the [[graft.operators.Grouping]]
    * percentiles discipline); mean is one double division of an
    * exact long sum.
    *
    * Scale: the same per-user min-timestamp joins as the funnel
    * (user-keyed partial aggs), then ONE 2-row aggregate — the
    * percentile runs inside the agg (sort within group), never as a
    * global window.
    */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
    val signup = e.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts_ns").as("t_signup"))
    val click = e.filter($"event_type" === "click")
      .join(signup, "user_id")
      .filter($"ts_ns" > $"t_signup")
      .groupBy($"user_id").agg(min($"ts_ns").as("t_click"),
        min($"t_signup").as("t_signup"))
    val purchase = e.filter($"event_type" === "purchase")
      .join(click.select($"user_id", $"t_click"), "user_id")
      .filter($"ts_ns" > $"t_click")
      .groupBy($"user_id").agg(min($"ts_ns").as("t_purchase"),
        min($"t_click").as("t_click"))
    def profile(df: DataFrame, from: String, to: String,
                a: org.apache.spark.sql.Column,
                b: org.apache.spark.sql.Column): DataFrame =
      df.select(((b - a) - pmod(b - a, lit(1000000000L)))
          ./(lit(1000000000L)).cast("long").as("lat_s"))
        .agg(count(lit(1)).as("n_users"),
          round(expr("percentile(lat_s, 0.5)"), 4).as("p50_s"),
          round(expr("percentile(lat_s, 0.9)"), 4).as("p90_s"),
          max($"lat_s").as("max_s"),
          round(sum($"lat_s").cast("double") / count(lit(1)).cast("double"), 6)
            .as("mean_s"))
        .select(lit(s"$from->$to").as("step"), $"n_users", $"p50_s",
          $"p90_s", $"max_s", $"mean_s")
    profile(click, "signup", "click", $"t_signup", $"t_click")
      .unionByName(
        profile(purchase, "click", "purchase", $"t_click", $"t_purchase"))
      .orderBy($"step")
  }

  val funnelLatencySql: String =
    """WITH s AS (
      |  SELECT user_id, min(epoch_ns(ts)) AS t_signup FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(epoch_ns(e.ts)) AS t_click,
      |    min(s.t_signup) AS t_signup
      |  FROM events e JOIN s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'click' AND epoch_ns(e.ts) > s.t_signup
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(epoch_ns(e.ts)) AS t_purchase,
      |    min(c.t_click) AS t_click
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.t_click
      |  GROUP BY e.user_id),
      |lc AS (SELECT (t_click - t_signup) // 1000000000 AS lat_s FROM c),
      |lp AS (SELECT (t_purchase - t_click) // 1000000000 AS lat_s FROM p)
      |SELECT 'signup->click' AS step, CAST(count(*) AS BIGINT) AS n_users,
      |  round(quantile_cont(lat_s, 0.5), 4) AS p50_s,
      |  round(quantile_cont(lat_s, 0.9), 4) AS p90_s,
      |  CAST(max(lat_s) AS BIGINT) AS max_s,
      |  round(CAST(sum(lat_s) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
      |    AS mean_s
      |FROM lc
      |UNION ALL
      |SELECT 'click->purchase', CAST(count(*) AS BIGINT),
      |  round(quantile_cont(lat_s, 0.5), 4),
      |  round(quantile_cont(lat_s, 0.9), 4),
      |  CAST(max(lat_s) AS BIGINT),
      |  round(CAST(sum(lat_s) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
      |FROM lp
      |ORDER BY step""".stripMargin

  private val FunnelWindowNs = 7L * 86400L * 1000000000L

  /** Time-bounded funnel (the windowFunnel primitive): signup → first
    * click WITHIN 7 DAYS → first purchase within 7 days of that click.
    * [[funnelConversion]] counts eventual progression; this counts
    * timely progression — the difference IS the activation metric
    * ("how many convert while the intent is hot"). Same stage-join
    * shape, each stage's min-timestamp bounded to the predecessor's
    * window; single-row output composed lazily, exact ns integer
    * comparisons.
    */
  def windowFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
    val signup = e.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts_ns").as("t_signup"))
    val click = e.filter($"event_type" === "click")
      .join(signup, "user_id")
      .filter($"ts_ns" > $"t_signup" && $"ts_ns" <= $"t_signup" + FunnelWindowNs)
      .groupBy($"user_id").agg(min($"ts_ns").as("t_click"))
    val purchase = e.filter($"event_type" === "purchase")
      .join(click, "user_id")
      .filter($"ts_ns" > $"t_click" && $"ts_ns" <= $"t_click" + FunnelWindowNs)
      .groupBy($"user_id").agg(min($"ts_ns").as("t_purchase"))
    e.agg(countDistinct($"user_id").as("n_users"))
      .crossJoin(signup.agg(count(lit(1)).as("n_signup")))
      .crossJoin(click.agg(count(lit(1)).as("n_click_7d")))
      .crossJoin(purchase.agg(count(lit(1)).as("n_purchase_7d")))
      .select($"n_users", $"n_signup", $"n_click_7d", $"n_purchase_7d",
        round($"n_click_7d".cast("double")
          / greatest($"n_signup", lit(1L)).cast("double"), 6)
          .as("click_rate_7d"),
        round($"n_purchase_7d".cast("double")
          / greatest($"n_click_7d", lit(1L)).cast("double"), 6)
          .as("purchase_rate_7d"))
  }

  val windowFunnelSql: String =
    s"""WITH s AS (
      |  SELECT user_id, min(epoch_ns(ts)) AS t_signup FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(epoch_ns(e.ts)) AS t_click
      |  FROM events e JOIN s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'click' AND epoch_ns(e.ts) > s.t_signup
      |    AND epoch_ns(e.ts) <= s.t_signup + ${FunnelWindowNs}
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.t_click
      |    AND epoch_ns(e.ts) <= c.t_click + ${FunnelWindowNs}
      |  GROUP BY e.user_id)
      |SELECT
      |  CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT) AS n_users,
      |  CAST((SELECT count(*) FROM s) AS BIGINT) AS n_signup,
      |  CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_7d,
      |  CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_7d,
      |  round(CAST((SELECT count(*) FROM c) AS DOUBLE)
      |    / CAST(greatest((SELECT count(*) FROM s), 1) AS DOUBLE), 6)
      |    AS click_rate_7d,
      |  round(CAST((SELECT count(*) FROM p) AS DOUBLE)
      |    / CAST(greatest((SELECT count(*) FROM c), 1) AS DOUBLE), 6)
      |    AS purchase_rate_7d""".stripMargin

  /** Order-fulfillment latency distribution: days from placement to the
    * last lineitem shipping, as a histogram with cumulative share — the
    * SLA curve behind "what fraction of orders ship within N days".
    *
    * Scale: the per-order latency reduces to a DAYS-cardinality
    * histogram before any window (the latency axis is bounded by
    * policy, not data volume), so the cumulative sum runs over a
    * constant-size table; the data-scaled work is two keyed partial
    * aggs. Integer day arithmetic; one broadcast scalar total; the
    * share is a single fixed-order double division.
    */
  def fulfillmentLatency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val done = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey").agg(max(to_date($"l_shipdate")).as("ship_done"))
    val hist = Tables.orders(spark, dir)
      .select($"o_orderkey", to_date($"o_orderdate").as("placed"))
      .join(done, $"o_orderkey" === $"l_orderkey")
      .select(datediff($"ship_done", $"placed").as("days"))
      .groupBy($"days").agg(count(lit(1)).as("n"))
    val tot = hist.agg(sum($"n").as("total"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"days")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    hist.withColumn("cum", sum($"n").over(w))
      .crossJoin(broadcast(tot))
      .select($"days", $"n", $"cum",
        round($"cum".cast("double") / $"total".cast("double"), 6).as("cum_share"))
      .orderBy($"days")
  }

  val fulfillmentLatencySql: String =
    """WITH done AS (
      |  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS ship_done
      |  FROM lineitem GROUP BY l_orderkey),
      |lat AS (
      |  SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE), ship_done)
      |    AS INT) AS days
      |  FROM orders JOIN done ON o_orderkey = l_orderkey),
      |h AS (SELECT days, CAST(count(*) AS BIGINT) AS n FROM lat GROUP BY days),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM h)
      |SELECT days, n,
      |  CAST(sum(n) OVER (ORDER BY days
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |  round(CAST(sum(n) OVER (ORDER BY days
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / CAST(total AS DOUBLE), 6) AS cum_share
      |FROM h, t ORDER BY days""".stripMargin

  /** Open-order backlog over time — classic interval sweep: an order is
    * open from its placement date until its last lineitem ships, and the
    * daily backlog is the running sum of +1 (placed) / −1 (completed)
    * deltas. The operations-dashboard query behind "is fulfillment
    * keeping up with intake".
    *
    * Scale: the sweep reduces the fact table to DATE-cardinality rows
    * (+1/−1 deltas per day) BEFORE the cumulative window — the calendar
    * axis is bounded by elapsed time, not data volume (TPC-H spans
    * ~2.5k days at any SF), so the single-partition running-sum window
    * is over a constant-size table; the data-scaled work is just the
    * per-order max-shipdate aggregate and the delta groupBy, both
    * keyed partial-agg passes. Pure integer arithmetic.
    */
  def openOrderBacklog(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val done = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey").agg(max(to_date($"l_shipdate")).as("ship_done"))
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey", to_date($"o_orderdate").as("placed"))
      .join(done, $"o_orderkey" === $"l_orderkey")
    val deltas = o.select($"placed".as("day"), lit(1L).as("delta"))
      .unionByName(o.select(date_add($"ship_done", 1).as("day"), lit(-1L).as("delta")))
      .groupBy($"day").agg(sum($"delta").as("net_change"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    deltas.withColumn("open_orders", sum($"net_change").over(w))
      // epoch-day integer, not DATE: the two engines' date dtypes do
      // not compare equal through the oracle harness (active_users
      // convention)
      .select(unix_date($"day").cast("long").as("day_n"),
        $"net_change", $"open_orders")
      .orderBy($"day_n")
  }

  val openOrderBacklogSql: String =
    """WITH done AS (
      |  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS ship_done
      |  FROM lineitem GROUP BY l_orderkey),
      |o AS (
      |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS placed, ship_done
      |  FROM orders JOIN done ON o_orderkey = l_orderkey),
      |d AS (
      |  SELECT day, CAST(sum(delta) AS BIGINT) AS net_change FROM (
      |    SELECT placed AS day, 1 AS delta FROM o
      |    UNION ALL SELECT ship_done + 1, -1 FROM o) u
      |  GROUP BY day)
      |SELECT CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) AS day_n,
      |  net_change,
      |  CAST(sum(net_change) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS open_orders
      |FROM d ORDER BY day_n""".stripMargin
}
