package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Relational.{dec, sqlDec, dsum, sqlDsum}

/** Multi-dimensional aggregation: ROLLUP / CUBE / GROUPING SETS / PIVOT /
  * percentiles. Null grouping keys from super-aggregate rows are
  * coalesced to 'ALL' so the oracle compare needs no null-ordering rules.
  */
object Grouping {

  /** Hierarchical ROLLUP: (status, priority) → (status) → (). */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_price"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n_orders", $"total_price")
      .orderBy($"status", $"priority")
  }

  val rollupAggSql: String =
    s"""SELECT coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS n_orders, ${sqlDsum("o_totalprice")} AS total_price
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** CUBE over two lineitem dims. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n_rows"), dsum($"l_quantity").as("sum_qty"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("rflag"),
        coalesce($"l_linestatus", lit("ALL")).as("lstatus"),
        $"n_rows", $"sum_qty")
      .orderBy($"rflag", $"lstatus")
  }

  val cubeAggSql: String =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS rflag, coalesce(l_linestatus, 'ALL') AS lstatus,
      |  count(*) AS n_rows, ${sqlDsum("l_quantity")} AS sum_qty
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY rflag, lstatus""".stripMargin

  /** Explicit GROUPING SETS — (segment), (nation), and grand total. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
    c.createOrReplaceTempView("gs_cust")
    spark.sql(
      s"""SELECT coalesce(c_mktsegment, 'ALL') AS segment, coalesce(n_name, 'ALL') AS nation,
         |  count(*) AS n_cust, ${sqlDsum("c_acctbal")} AS total_bal
         |FROM gs_cust
         |GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
         |ORDER BY segment, nation""".stripMargin)
  }

  val groupingSetsSql: String =
    s"""SELECT coalesce(c_mktsegment, 'ALL') AS segment, coalesce(n_name, 'ALL') AS nation,
      |  count(*) AS n_cust, ${sqlDsum("c_acctbal")} AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
      |ORDER BY segment, nation""".stripMargin

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** PIVOT event_type → columns, one row per day. */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"))
      .pivot("event_type", eventTypes)
      .agg(coalesce(sum(dec($"value")).cast("double"), lit(0.0)))
      .orderBy($"day")
  }

  val pivotEventsSql: String = {
    val cols = eventTypes.map(t =>
      s"coalesce(CAST(sum(${sqlDec("value")}) FILTER (WHERE event_type = '$t') AS DOUBLE), 0.0) AS $t")
      .mkString(",\n  ")
    s"""SELECT strftime(ts, '%Y-%m-%d') AS day,
      |  $cols
      |FROM events GROUP BY strftime(ts, '%Y-%m-%d') ORDER BY day""".stripMargin
  }

  /** Exact interpolated percentiles per group (rounded to absorb the two
    * engines' interpolation-arithmetic ulp differences).
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"),
        min($"o_totalprice").as("p_min"),
        max($"o_totalprice").as("p_max"))
      .orderBy($"o_orderstatus")
  }

  val percentilesSql: String =
    """SELECT o_orderstatus,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      |  round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
      |  min(o_totalprice) AS p_min, max(o_totalprice) AS p_max
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Top-5 events per type via the native bounded-state aggregate
    * (functions/AggExpressions.TopKBy): unlike the window-rank
    * formulation — which shuffles EVERY event to its group partition
    * and sorts — the aggregate keeps k pairs per group per map task,
    * partial-merges map-side (ObjectHashAggregate), and ships only
    * those k through the shuffle. Ordering (value DESC, event_id ASC)
    * is deterministic, so the result hash-matches the window oracle.
    */
  def groupTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(graft.functions.AggFunctions.top_k_by($"value", $"event_id", 5).as("top"))
      .select($"event_type", posexplode($"top"))
      .select($"event_type", ($"pos" + 1).cast("int").as("rk"),
        $"col.score".as("value"), $"col.payload".as("event_id"))
      .orderBy($"event_type", $"rk")
  }

  val groupTopkSql: String =
    """SELECT event_type, CAST(rk AS INT) AS rk, value, event_id FROM (
      |  SELECT event_type, value, event_id,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY value DESC, event_id) AS rk
      |  FROM events) t
      |WHERE rk <= 5 ORDER BY event_type, rk""".stripMargin
}
