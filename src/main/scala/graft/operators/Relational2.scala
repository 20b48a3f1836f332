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

  /** 2-D Pareto SKYLINE over parts (minimize price AND size — the
    * "cheapest small part" frontier): a part survives iff no strictly
    * cheaper part is as small or smaller, and no equal-priced part is
    * strictly smaller. Computed WITHOUT the naive O(n²) dominance
    * self-join: on the integer price grid, "any strictly cheaper
    * part's min size" is ONE running-min window with a RANGE frame
    * ending 1 price-unit before the current row, and the equal-price
    * check is a min over the price partition — two window passes,
    * O(n log n), the 2-D skyline's textbook sort-scan made
    * declarative.
    *
    * Scale: a single global-order window is the exactness-gate shape;
    * at 100 TB the same algebra range-partitions by price (skylines
    * are distributive: local skyline, then prefix-min of per-partition
    * minima broadcast — survivors only). All comparisons are integer
    * (price on the cent grid); output is the frontier, ordered.
    */
  def paretoSkyline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val base = Tables.part(spark, dir)
      .select($"p_partkey",
        (dec($"p_retailprice") * 100).cast("long").as("price_u"),
        $"p_size".cast("long").as("size"))
    val wCheaper = W.orderBy($"price_u")
      .rangeBetween(W.unboundedPreceding, -1)
    val wEq = W.partitionBy($"price_u")
    base
      .withColumn("min_size_cheaper", min($"size").over(wCheaper))
      .withColumn("min_size_eq", min($"size").over(wEq))
      .filter(($"min_size_cheaper".isNull || $"min_size_cheaper" > $"size")
        && $"size" === $"min_size_eq")
      .select($"p_partkey",
        round($"price_u".cast("double") / 100d, 2).as("price"),
        $"size".cast("int").as("size"))
      .orderBy($"price", $"p_partkey")
  }

  val paretoSkylineSql: String =
    s"""WITH base AS (
      |  SELECT p_partkey,
      |    CAST(${sqlDec("p_retailprice")} * 100 AS BIGINT) AS price_u,
      |    CAST(p_size AS BIGINT) AS size
      |  FROM part),
      |w AS (
      |  SELECT p_partkey, price_u, size,
      |    min(size) OVER (ORDER BY price_u
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS min_size_cheaper,
      |    min(size) OVER (PARTITION BY price_u) AS min_size_eq
      |  FROM base)
      |SELECT p_partkey, round(CAST(price_u AS DOUBLE) / 100, 2) AS price,
      |  CAST(size AS INT) AS size
      |FROM w
      |WHERE (min_size_cheaper IS NULL OR min_size_cheaper > size)
      |  AND size = min_size_eq
      |ORDER BY price, p_partkey""".stripMargin

  /** Revenue CONCENTRATION per brand — the exact Gini coefficient over
    * per-part revenue: G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n with x sorted
    * ascending. The "is this brand's volume three parts or three
    * thousand?" monitoring number (feeds mixture and skew decisions the
    * way [[graft.operators.Profile.joinSkewReport]] feeds join
    * planning).
    *
    * Exactness: revenue on the DECIMAL money grid as BIGINT
    * ten-thousandths; rank·value products summed in DECIMAL(38,0)
    * (i ≤ n keeps every product exact); ties in x rank arbitrarily but
    * Σ i·xᵢ is tie-order-invariant over equal values, so the statistic
    * is engine-exact. One fixed-order double derivation at the end.
    *
    * Scale: one (brand, part) partial agg over the scan, one
    * brand-keyed window, |brands| output rows.
    */
  def giniByBrand(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val perPart = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand".as("brand"), $"p_partkey")
      .agg((sum(revTerm($"l_extendedprice", $"l_discount")) * 10000)
        .cast(d38).cast("long").as("x_u"))
    perPart
      .withColumn("i", row_number().over(
        W.partitionBy($"brand").orderBy($"x_u", $"p_partkey")).cast("long"))
      .groupBy($"brand")
      .agg(count(lit(1)).as("n_parts"),
        sum($"x_u".cast(d38)).as("sx"),
        sum(($"i".cast(d38) * $"x_u".cast(d38)).cast(d38)).as("six"))
      .select($"brand", $"n_parts",
        round($"sx".cast("double") / 10000d, 2).as("revenue"),
        round(lit(2d) * $"six".cast("double")
            / ($"n_parts".cast("double") * $"sx".cast("double"))
          - ($"n_parts" + 1).cast("double") / $"n_parts".cast("double"), 6)
          .as("gini"))
      .orderBy($"brand")
  }

  val giniByBrandSql: String =
    s"""WITH per_part AS (
      |  SELECT p.p_brand AS brand, l.l_partkey,
      |    CAST(CAST(sum($sqlRev) * 10000 AS DECIMAL(38,0)) AS BIGINT) AS x_u
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY p.p_brand, l.l_partkey),
      |ranked AS (
      |  SELECT brand, x_u,
      |    CAST(row_number() OVER (PARTITION BY brand ORDER BY x_u, l_partkey)
      |      AS BIGINT) AS i
      |  FROM per_part),
      |agg AS (
      |  SELECT brand, count(*) AS n_parts,
      |    CAST(sum(CAST(x_u AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(CAST(i AS DECIMAL(38,0)) * CAST(x_u AS DECIMAL(38,0)))
      |      AS DECIMAL(38,0)) AS six
      |  FROM ranked GROUP BY brand)
      |SELECT brand, n_parts,
      |  round(CAST(sx AS DOUBLE) / 10000, 2) AS revenue,
      |  round(2 * CAST(six AS DOUBLE)
      |      / (CAST(n_parts AS DOUBLE) * CAST(sx AS DOUBLE))
      |    - CAST(n_parts + 1 AS DOUBLE) / CAST(n_parts AS DOUBLE), 6) AS gini
      |FROM agg ORDER BY brand""".stripMargin
}
