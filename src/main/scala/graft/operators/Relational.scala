package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** TPC-H-flavoured relational operator library over the testdata star
  * schema.
  *
  * Conventions (scale + correctness):
  *   - Only constant-cardinality dimensions (region: 5 rows, nation: 25
  *     rows) carry a `broadcast` hint. customer/part/supplier scale
  *     linearly with SF — multi-billion-row at the 100 TB target — so
  *     those joins are left to AQE, which broadcasts when the runtime
  *     size fits `spark.sql.autoBroadcastJoinThreshold` and shuffles
  *     when it doesn't. A forced hint there is a latent executor OOM.
  *   - Money arithmetic runs in `decimal(18,4)` (sources carry 2 decimal
  *     places, so the cast is exact) and every product is re-cast to
  *     `decimal(18,4)` before the next multiply; sums are exact and
  *     independent of partition order — then the final value is cast to
  *     DOUBLE. The DuckDB oracle does the identical casts, so results
  *     are bit-identical, which a 1000-executor cluster (nondeterministic
  *     partial-agg order) also needs for reproducible output.
  *   - Every computed column is aliased; oracle SQL uses the same names.
  */
object Relational {

  private[operators] val D = "decimal(18,4)"
  private[operators] def dec(c: Column): Column = c.cast(D)
  /** exact, order-independent money sum surfaced as double */
  private[operators] def dsum(c: Column): Column = sum(c.cast(D)).cast("double")
  /** lineitem revenue term: extprice * (1 - discount), exact at 4dp */
  private[operators] def revTerm(price: Column, disc: Column): Column =
    (dec(price) * (lit(1.0) - disc).cast(D)).cast(D)

  // SQL-side mirrors of the helpers above
  private[operators] def sqlDec(e: String) = s"CAST($e AS DECIMAL(18,4))"
  private[operators] def sqlDsum(e: String) = s"CAST(sum(${sqlDec(e)}) AS DOUBLE)"
  private[operators] val sqlRev =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4)) AS DECIMAL(18,4))"

  /** q1: pricing summary report — multi-aggregate groupBy. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        sum(revTerm($"l_extendedprice", $"l_discount")).cast("double").as("sum_disc_price"),
        // charge factor (1-d)(1+t) is precomputed in double then cast once:
        // chained decimal multiplies would need a mid-chain re-cast whose
        // rounding mode differs across engines on exact .xxxx5 ties.
        // round(…,4): the scale-10 decimal sum exceeds 2^53 when scaled to
        // int, and DuckDB's decimal→double conversion is not correctly
        // rounded there — 4dp absorbs the ulp while staying exact.
        round(sum(dec($"l_extendedprice") *
          ((lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).cast("decimal(18,6)"))
          .cast("double"), 4).as("sum_charge"),
        (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec($"l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec($"l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  ${sqlDsum("l_quantity")} AS sum_qty,
      |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
      |  CAST(sum($sqlRev) AS DOUBLE) AS sum_disc_price,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST((1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_charge,
      |  CAST(sum(${sqlDec("l_quantity")}) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(${sqlDec("l_extendedprice")}) AS DOUBLE) / count(*) AS avg_price,
      |  CAST(sum(${sqlDec("l_discount")}) AS DOUBLE) / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q2: selective filter + narrow projection (pushdown showcase: the
    * parquet scan reads 4 of 6 columns and both predicates are pushed).
    */
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .filter($"p_size" >= 10 && $"p_size" <= 20 && ($"p_type" === "PROMO" || $"p_type" === "STANDARD"))
      .select($"p_partkey", $"p_name", $"p_retailprice")
      .orderBy($"p_partkey")
  }

  val q2Sql: String =
    """SELECT p_partkey, p_name, p_retailprice FROM part
      |WHERE p_size BETWEEN 10 AND 20 AND p_type IN ('PROMO','STANDARD')
      |ORDER BY p_partkey""".stripMargin

  /** q3: 3-way join + agg + top-N. customer scales with SF, so its join
    * is AQE-sized (broadcast at small SF, shuffle at 100 TB) — no hint.
    */
  def q3TopRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir).filter($"c_mktsegment" === "BUILDING")
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum(revTerm($"l_extendedprice", $"l_discount")).cast("double").as("revenue"))
      .select($"l_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"),
        $"o_orderpriority", $"revenue")
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority,
      |  CAST(sum($sqlRev) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** q4: EXISTS — left-semi join (no row duplication, no distinct). */
  def q4SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir).filter($"l_returnflag" === "R")
    o.join(l, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q5: 6-way star join — region→nation→(customer,supplier)→orders→lineitem.
    * region/nation broadcast (constant cardinality); customer/supplier
    * joins are AQE-sized because both scale with SF.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val r = Tables.region(spark, dir).filter($"r_name" === "ASIA")
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(s, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(sum(revTerm($"l_extendedprice", $"l_discount")).cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q5Sql: String =
    s"""SELECT n_name, CAST(sum($sqlRev) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** q6: forecast revenue — selective range scan, scalar aggregate. */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1995-01-01") && $"l_shipdate" < lit("1996-01-01")
        && $"l_discount" >= 0.04 && $"l_discount" <= 0.06 && $"l_quantity" < 24)
      .agg(sum((dec($"l_extendedprice") * dec($"l_discount")).cast(D)).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val q6Sql: String =
    s"""SELECT CAST(sum(CAST(${sqlDec("l_extendedprice")} * ${sqlDec("l_discount")} AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""".stripMargin

  /** q7: NOT EXISTS — customers with no completed ('F') orders, left-anti. */
  def q7AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter($"o_orderstatus" === "F")
    c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("cnt"), dsum($"c_acctbal").as("total_bal"))
      .orderBy($"n_name")
  }

  val q7Sql: String =
    s"""SELECT n_name, count(*) AS cnt, ${sqlDsum("c_acctbal")} AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** q8: market share — conditional numerator inside agg over a 5-way join. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = Tables.nation(spark, dir)
    val s = Tables.supplier(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val joined = l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(s, $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
    joined
      .groupBy(year($"o_orderdate").as("o_year"))
      .agg(
        (sum(when($"n_name" === "NATION_1", revTerm($"l_extendedprice", $"l_discount"))
          .otherwise(lit(0).cast(D))).cast("double")
          / sum(revTerm($"l_extendedprice", $"l_discount")).cast("double")).as("mkt_share"),
        count(lit(1)).as("n_lines"))
      .orderBy($"o_year")
  }

  val q8Sql: String =
    s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(sum(CASE WHEN n_name = 'NATION_1' THEN $sqlRev ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |    / CAST(sum($sqlRev) AS DOUBLE) AS mkt_share,
      |  count(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY year(o_orderdate) ORDER BY o_year""".stripMargin

  /** q10: returned items — join + filter + agg + top-N customers. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir).filter($"l_returnflag" === "R")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal")
      .agg(sum(revTerm($"l_extendedprice", $"l_discount")).cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  val q10Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, CAST(sum($sqlRev) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** q12: CASE-conditional aggregation over a join. */
  def q12Priority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir).filter($"l_shipdate" >= lit("1996-01-01"))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_linestatus")
      .agg(
        sum(when($"o_orderpriority" === "1-URGENT" || $"o_orderpriority" === "2-HIGH", 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when($"o_orderpriority" =!= "1-URGENT" && $"o_orderpriority" =!= "2-HIGH", 1L)
          .otherwise(0L)).as("low_line_count"))
      .orderBy($"l_linestatus")
  }

  val q12Sql: String =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** q13: customer order-count distribution — left outer join, two-level agg. */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(!$"o_orderpriority".startsWith("4"))
    c.join(o, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '4%'
      |  GROUP BY c_custkey) t
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** q14: promo revenue share — conditional numerator / denominator. */
  def q14Promo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, dir)
    val l = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01") && $"l_shipdate" < lit("1997-01-01"))
    l.join(p, $"l_partkey" === $"p_partkey")
      .agg((lit(100.0) * sum(when($"p_type" === "PROMO", revTerm($"l_extendedprice", $"l_discount"))
        .otherwise(lit(0).cast(D))).cast("double")
        / sum(revTerm($"l_extendedprice", $"l_discount")).cast("double")).as("promo_revenue"))
  }

  val q14Sql: String =
    s"""SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN $sqlRev ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |  / CAST(sum($sqlRev) AS DOUBLE) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'""".stripMargin

  /** q16: distinct-agg with anti-join filter (suppliers per brand/size,
    * excluding one brand and suppliers with negative balance).
    */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, dir).filter($"p_brand" =!= "Brand#1")
    val bad = Tables.supplier(spark, dir).filter($"s_acctbal" < 0).select($"s_suppkey")
    val l = Tables.lineitem(spark, dir)
    l.join(p, $"l_partkey" === $"p_partkey")
      .join(bad, $"l_suppkey" === $"s_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_size")
  }

  val q16Sql: String =
    """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1'
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin

  /** q17: scalar correlated subquery (per-part avg qty) decorrelated to an
    * aggregate + join — lineitems below 50%% of their part's average.
    */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, dir)
    val avgQ = l.groupBy($"l_partkey".as("ap_partkey"))
      .agg((sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"))
    // avgQ is part-cardinality (scales with SF) — AQE decides the join.
    l.join(avgQ, $"l_partkey" === $"ap_partkey")
      .filter($"l_quantity" < lit(0.5) * $"avg_qty")
      .agg((sum(dec($"l_extendedprice")).cast("double") / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_rows"))
  }

  val q17Sql: String =
    s"""SELECT CAST(sum(${sqlDec("l_extendedprice")}) AS DOUBLE) / 7.0 AS avg_yearly, count(*) AS n_rows
      |FROM lineitem l JOIN (
      |  SELECT l_partkey AS ap_partkey,
      |         CAST(sum(${sqlDec("l_quantity")}) AS DOUBLE) / count(*) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey) a ON l.l_partkey = a.ap_partkey
      |WHERE l_quantity < 0.5 * avg_qty""".stripMargin

  /** q18: groupBy-HAVING + join back (large-quantity orders). */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val big = l.groupBy($"l_orderkey".as("bo_orderkey"))
      .agg(sum(dec($"l_quantity")).cast("double").as("sum_qty"))
      .filter($"sum_qty" > 150)
    o.join(big, $"o_orderkey" === $"bo_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"),
        $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  val q18Sql: String =
    s"""SELECT c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |  o_totalprice, sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey AS bo_orderkey, CAST(sum(${sqlDec("l_quantity")}) AS DOUBLE) AS sum_qty
      |      FROM lineitem GROUP BY l_orderkey HAVING CAST(sum(${sqlDec("l_quantity")}) AS DOUBLE) > 150) b
      |  ON o_orderkey = bo_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** q19: disjunctive OR-of-ANDs predicate join. */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(p, $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) && $"l_quantity".between(1, 11)) ||
        ($"p_brand" === "Brand#23" && $"p_size".between(1, 25) && $"l_quantity".between(10, 20)) ||
        ($"p_brand" === "Brand#34" && $"p_size".between(1, 35) && $"l_quantity".between(20, 30)))
      .agg(sum(revTerm($"l_extendedprice", $"l_discount")).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val q19Sql: String =
    s"""SELECT CAST(sum($sqlRev) AS DOUBLE) AS revenue, count(*) AS n_rows
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** q21: semi + anti combination — suppliers whose 'A'-return lines sit in
    * multi-supplier orders where no other supplier had an 'A' return.
    */
  def q21Waiting(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val l1 = l.filter($"l_returnflag" === "A")
    val multi = l.groupBy($"l_orderkey".as("m_orderkey"))
      .agg(countDistinct($"l_suppkey").as("nsupp")).filter($"nsupp" > 1)
    val otherBad = l.filter($"l_returnflag" === "A")
      .select($"l_orderkey".as("b_orderkey"), $"l_suppkey".as("b_suppkey"))
    l1.join(multi, $"l_orderkey" === $"m_orderkey", "left_semi")
      .join(otherBad, $"l_orderkey" === otherBad("b_orderkey") &&
        $"l_suppkey" =!= otherBad("b_suppkey"), "left_anti")
      .join(s, $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
  }

  val q21Sql: String =
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE l1.l_returnflag = 'A'
      |  AND EXISTS (SELECT 1 FROM (SELECT l_orderkey, count(DISTINCT l_suppkey) ns
      |              FROM lineitem GROUP BY l_orderkey) m
      |              WHERE m.l_orderkey = l1.l_orderkey AND ns > 1)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |              WHERE l3.l_orderkey = l1.l_orderkey
      |                AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'A')
      |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin

  /** q22: scalar-subquery threshold + anti-join (rich customers, no orders
    * after a cutoff date).
    */
  def q22GlobalSales(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter($"o_orderdate" >= lit("2000-01-01"))
    val cutoff = c.filter($"c_acctbal" > 0)
      .agg((sum(dec($"c_acctbal")).cast("double") / count(lit(1))).as("avg_bal"))
    c.crossJoin(broadcast(cutoff))
      .filter($"c_acctbal" > $"avg_bal")
      .join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("numcust"), dsum($"c_acctbal").as("totacctbal"))
      .orderBy($"c_mktsegment")
  }

  val q22Sql: String =
    s"""SELECT c_mktsegment, count(*) AS numcust, ${sqlDsum("c_acctbal")} AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT CAST(sum(${sqlDec("c_acctbal")}) AS DOUBLE) / count(*)
      |                   FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Global sort + limit with full tie-break (deterministic top-50). */
  def sortLimit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
      .limit(50)
  }

  val sortLimitSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 50""".stripMargin

  /** UNION ALL + UNION (dedup) composition. */
  def unionOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val a = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val b = c.filter($"c_acctbal" > 5000).select($"c_custkey")
    val unionAll = a.unionAll(b).groupBy().agg(count(lit(1)).as("n_all"))
    val unionDistinct = a.union(b).distinct().groupBy().agg(count(lit(1)).as("n_distinct"))
    unionAll.crossJoin(unionDistinct)
  }

  val unionOpsSql: String =
    """SELECT (SELECT count(*) FROM (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  UNION ALL SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t) AS n_all,
      |(SELECT count(*) FROM (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  UNION SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t) AS n_distinct""".stripMargin

  /** Exact + approx distinct counts (approx column checked in spec, not
    * oracle — returned here as exact for the oracle gate, the approx
    * variant lives in PlanSpec).
    */
  def distinctCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_suppkey").as("n_supp"),
        countDistinct($"l_partkey").as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  val distinctCountSql: String =
    """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
      |  count(DISTINCT l_partkey) AS n_part, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** String function battery over part. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .filter($"p_name".like("%e%"))
      .select(
        $"p_partkey",
        substring($"p_name", 1, 6).as("name_prefix"),
        upper($"p_brand").as("brand_upper"),
        lower($"p_type").as("type_lower"),
        concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
        length($"p_name").as("name_len"),
        regexp_extract($"p_name", "([a-z]+)", 1).as("name_num"),
        ltrim(rtrim($"p_name")).as("name_trim"))
      .orderBy($"p_partkey")
  }

  val stringFuncsSql: String =
    """SELECT p_partkey, substring(p_name, 1, 6) AS name_prefix, upper(p_brand) AS brand_upper,
      |  lower(p_type) AS type_lower, concat_ws('|', p_brand, p_type) AS brand_type,
      |  CAST(length(p_name) AS INT) AS name_len,
      |  coalesce(regexp_extract(p_name, '([a-z]+)', 1), '') AS name_num,
      |  ltrim(rtrim(p_name)) AS name_trim
      |FROM part WHERE p_name LIKE '%e%' ORDER BY p_partkey""".stripMargin

  /** Date/time function battery over orders. */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy(year($"o_orderdate").as("y"), quarter($"o_orderdate").as("q"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(month($"o_orderdate")).as("n_months"),
        min(date_format($"o_orderdate", "yyyy-MM-dd")).as("first_day"),
        max(dayofmonth($"o_orderdate")).as("max_dom"))
      .orderBy($"y", $"q")
  }

  val dateFuncsSql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(quarter(o_orderdate) AS INT) AS q,
      |  count(*) AS n_orders, count(DISTINCT month(o_orderdate)) AS n_months,
      |  min(strftime(o_orderdate, '%Y-%m-%d')) AS first_day,
      |  CAST(max(day(o_orderdate)) AS INT) AS max_dom
      |FROM orders GROUP BY year(o_orderdate), quarter(o_orderdate) ORDER BY y, q""".stripMargin
}
