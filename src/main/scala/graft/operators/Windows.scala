package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Relational.{dec, sqlDec}

/** Window-function operators. Ordering keys always include a unique
  * tie-break column so results are deterministic under any partitioning
  * (required both for the oracle hash-compare and for reproducible runs
  * on a real cluster).
  */
object Windows {

  /** Top-3 orders per customer by price (rank per group). */
  def windowTopn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"rk", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rk")
  }

  val windowTopnSql: String =
    """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  /** Running (cumulative) spend per customer — exact decimal cumsum. */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey",
        sum(dec($"o_totalprice")).over(w).cast("double").as("running_spend"),
        count(lit(1)).over(w).as("running_orders"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val windowRunningSql: String =
    s"""SELECT o_custkey, o_orderkey,
      |  CAST(sum(${sqlDec("o_totalprice")}) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_orders
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Lag/lead deltas — per-user event value changes. The window orders by
    * event_id (monotone with ts in the generator) so nanosecond timestamp
    * precision differences between engines cannot reorder rows.
    */
  def windowLagLead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"value",
        (dec($"value") - dec(lag($"value", 1).over(w))).cast("double").as("delta_prev"),
        (dec(lead($"value", 1).over(w)) - dec($"value")).cast("double").as("delta_next"))
      .orderBy($"user_id", $"event_id")
  }

  val windowLagLeadSql: String =
    s"""SELECT user_id, event_id, value,
      |  CAST(${sqlDec("value")} - ${sqlDec("lag(value, 1) OVER w")} AS DOUBLE) AS delta_prev,
      |  CAST(${sqlDec("lead(value, 1) OVER w")} - ${sqlDec("value")} AS DOUBLE) AS delta_next
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      |ORDER BY user_id, event_id""".stripMargin

  /** Gap-based sessionization: a new session starts after >30 min idle.
    * Classic lag + conditional cumulative-sum — one shuffle on user_id,
    * both window functions reuse the same sort.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("ts_s", unix_timestamp($"ts"))
      .withColumn("gap", $"ts_s" - lag($"ts_s", 1).over(w))
      .withColumn("new_sess", when($"gap".isNull || $"gap" > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum($"new_sess").over(wCum))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        sum(dec($"value")).cast("double").as("session_value"),
        min($"event_id").as("first_event"),
        max($"event_id").as("last_event"))
      .orderBy($"user_id", $"session_id")
  }

  val sessionizeSql: String =
    s"""WITH g AS (
      |  SELECT user_id, event_id, value,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
      |    CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
      |      OVER (PARTITION BY user_id ORDER BY event_id) AS gap
      |  FROM events),
      |s AS (
      |  SELECT user_id, event_id, value,
    |    CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM g)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  CAST(sum(${sqlDec("value")}) AS DOUBLE) AS session_value,
      |  min(event_id) AS first_event, max(event_id) AS last_event
      |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  /** Trailing-1-hour RANGE-frame aggregate per user: for every event,
    * the count and exact decimal sum of that user's values in the
    * preceding hour INCLUDING the event — a value-based frame (RANGE on
    * raw nanoseconds), not a row- or bucket-based one, so it completes
    * the frame-type coverage next to [[windowRunning]] (ROWS) and
    * [[graft.operators.TimeSeries.slidingWindowAgg]] (tumbling/sliding
    * buckets). One shuffle on user_id, one sort; peers with equal
    * timestamps enter the frame together in both engines, and the
    * decimal sum is order-exact, so ties can't perturb the hash.
    */
  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_ns")
      .rangeBetween(-3600L * 1000000000L, Window.currentRow)
    Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"ts_ns", $"value")
      .withColumn("trail_cnt", count(lit(1)).over(w))
      .withColumn("trail_sum", sum(dec($"value")).over(w).cast("double"))
      .select($"event_id", $"user_id", $"trail_cnt", $"trail_sum")
      .orderBy($"event_id")
  }

  val windowRangeFrameSql: String =
    s"""SELECT event_id, user_id,
      |  count(*) OVER w AS trail_cnt,
      |  CAST(sum(${sqlDec("value")}) OVER w AS DOUBLE) AS trail_sum
      |FROM (SELECT event_id, user_id, epoch_ns(ts) AS tns, value FROM events) e
      |WINDOW w AS (PARTITION BY user_id ORDER BY tns
      |             RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin
}
