package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Relational.{dec, sqlDec, revTerm, sqlRev, D}

/** Second tranche of TPC-H-flavoured queries (q9/q15/q20 adaptations —
  * the testdata schema has no partsupp, so supply cost is proxied by
  * 0.8 × p_retailprice).
  */
object Relational2 {

  /** q9: profit by nation and year. amount = revenue − cost·quantity.
    * nation broadcast (25 rows); part/supplier joins AQE-sized (both
    * scale with SF); one guaranteed fact shuffle (lineitem⋈orders).
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, dir).filter($"p_name".contains("e"))
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val cost = (lit(0.8) * $"p_retailprice").cast("decimal(18,6)")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(p, $"l_partkey" === $"p_partkey")
      .join(s, $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"), year($"o_orderdate").cast("int").as("o_year"))
      .agg(round(sum(revTerm($"l_extendedprice", $"l_discount") - (cost * dec($"l_quantity")))
        .cast("double"), 4).as("profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  val q9Sql: String =
    s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |  round(CAST(sum($sqlRev - (CAST(0.8 * p_retailprice AS DECIMAL(18,6)) * ${sqlDec("l_quantity")})) AS DOUBLE), 4) AS profit
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%e%'
      |GROUP BY n_name, year(o_orderdate)
      |ORDER BY nation, o_year DESC""".stripMargin

  /** q15: top supplier(s) by revenue in a quarter — two-level agg with a
    * scalar-max reuse (the CTE is computed once, the max is broadcast
    * back as a 1-row cross join).
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01") && $"l_shipdate" < lit("1996-04-01"))
    val rev = l.groupBy($"l_suppkey")
      .agg(sum(revTerm($"l_extendedprice", $"l_discount")).cast("double").as("total_revenue"))
    val maxRev = rev.agg(max($"total_revenue").as("max_revenue"))
    rev.crossJoin(broadcast(maxRev))
      .filter($"total_revenue" === $"max_revenue")
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  val q15Sql: String =
    s"""WITH rev AS (
      |  SELECT l_suppkey, CAST(sum($sqlRev) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** q11-style: nations holding an outsized share of total supplier
    * balance — aggregate, compare to a scalar of the same aggregate
    * (computed once, broadcast back).
    */
  def q11ImportantBalance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val perNation = s.join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(sum(dec($"s_acctbal")).cast("double").as("nation_bal"))
    val total = perNation.agg(sum($"nation_bal".cast(D)).cast("double").as("total_bal"))
    perNation.crossJoin(broadcast(total))
      .filter($"nation_bal" > lit(0.05) * $"total_bal")
      .select($"n_name", $"nation_bal")
      .orderBy($"nation_bal".desc, $"n_name")
  }

  val q11Sql: String =
    s"""WITH pn AS (
      |  SELECT n_name, CAST(sum(${sqlDec("s_acctbal")}) AS DOUBLE) AS nation_bal
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY n_name)
      |SELECT n_name, nation_bal FROM pn
      |WHERE nation_bal > 0.05 * (SELECT CAST(sum(${sqlDec("nation_bal")}) AS DOUBLE) FROM pn)
      |ORDER BY nation_bal DESC, n_name""".stripMargin

  /** ntile / percent_rank / cume_dist battery — the ranking-window family
    * not covered by window_topn.
    */
  def windowRanks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_orderstatus").orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(spark, dir)
      .select($"o_orderstatus", $"o_orderkey",
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy($"o_orderstatus", $"o_orderkey")
  }

  val windowRanksSql: String =
    """SELECT o_orderstatus, o_orderkey,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin

  /** q20: suppliers who shipped a large quantity of the filtered parts —
    * nested aggregation feeding a semi-join chain.
    */
  def q20ExcessSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, dir).filter($"p_name".startsWith("b"))
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val shipped = l.join(p.select($"p_partkey"), $"l_partkey" === $"p_partkey")
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(sum(dec($"l_quantity")).cast("double").as("qty"))
      .filter($"qty" > 50)
      .select($"l_suppkey").distinct()
    s.join(shipped, $"s_suppkey" === $"l_suppkey", "left_semi")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"n_name")
      .orderBy($"s_suppkey")
  }

  val q20Sql: String =
    s"""SELECT s_suppkey, s_name, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'b%'
      |  GROUP BY l_suppkey, l_partkey
      |  HAVING CAST(sum(${sqlDec("l_quantity")}) AS DOUBLE) > 50)
      |ORDER BY s_suppkey""".stripMargin

  /** Month-over-month revenue growth: monthly decimal-exact revenue,
    * lag window over the tiny month table, growth as one double
    * division of exact decimal-to-double conversions. The heavy work
    * is a single partial-agg shuffle to |months| rows; the window
    * sorts only that table.
    */
  def monthlyGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.orderBy($"month")
    Tables.orders(spark, dir)
      .groupBy(date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"), sum(dec($"o_totalprice")).as("rev"))
      .withColumn("prev", lag($"rev", 1).over(w))
      .select($"month", $"n_orders", $"rev".cast("double").as("revenue"),
        round(($"rev".cast("double") - $"prev".cast("double"))
          / $"prev".cast("double"), 6).as("mom_growth"))
      .orderBy($"month")
  }

  val monthlyGrowthSql: String =
    s"""WITH m AS (
      |  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
      |    count(*) AS n_orders, sum(${sqlDec("o_totalprice")}) AS rev
      |  FROM orders GROUP BY 1)
      |SELECT month, n_orders, CAST(rev AS DOUBLE) AS revenue,
      |  round((CAST(rev AS DOUBLE) - CAST(lag(rev, 1) OVER (ORDER BY month) AS DOUBLE))
      |    / CAST(lag(rev, 1) OVER (ORDER BY month) AS DOUBLE), 6) AS mom_growth
      |FROM m ORDER BY month""".stripMargin
}
