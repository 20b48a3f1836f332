package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Declarative data-quality gate: referential integrity, uniqueness,
  * null, and range checks across the warehouse tables, emitted as one
  * violations report — the admission check a pipeline runs on every new
  * data drop before it joins the corpus.
  *
  * Scale: each check is either a single-pass aggregate over its table
  * (null/range/uniqueness — map-side partials, one number out) or an
  * anti-join against a dimension key set (FK checks — the dimension key
  * column broadcasts when it fits, and the anti-join output is COUNTED,
  * never materialized). All checks over the same table share its scan;
  * the report is |checks| rows at any input size.
  */
object DataQuality {

  def dqReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // plant one corrupt order (dup key, dangling custkey, non-positive
    // price) so the report's counting paths are exercised — the clean
    // testdata would otherwise make every check trivially zero
    val orders = Tables.orders(spark, dir).unionByName(
      Tables.orders(spark, dir).orderBy($"o_orderkey").limit(1)
        .select($"o_orderkey", lit(99999999L).as("o_custkey"),
          $"o_orderstatus", lit(-1.0).as("o_totalprice"),
          $"o_orderdate", $"o_orderpriority"))
    val lineitem = Tables.lineitem(spark, dir)
    val customer = Tables.customer(spark, dir)
    val events = Tables.events(spark, dir)
    val documents = Tables.documents(spark, dir)

    def one(name: String, violations: DataFrame): DataFrame =
      violations.select(lit(name).as("check"),
        coalesce(first($"v"), lit(0L)).cast("long").as("violations"))

    // single-pass aggregate checks (shared scan per table)
    val ordersAgg = orders.agg(
      sum(when($"o_totalprice" <= 0, 1L).otherwise(0L)).as("price_nonpos"),
      sum(when($"o_custkey".isNull, 1L).otherwise(0L)).as("custkey_null"),
      (count(lit(1)) - countDistinct($"o_orderkey")).as("orderkey_dup"))
    val lineitemAgg = lineitem.agg(
      sum(when($"l_quantity" < 1 || $"l_quantity" > 50, 1L).otherwise(0L)).as("qty_range"),
      sum(when($"l_shipdate".isNull, 1L).otherwise(0L)).as("shipdate_null"))
    val eventsAgg = events.agg(
      sum(when($"ts".isNull, 1L).otherwise(0L)).as("ts_null"),
      (count(lit(1)) - countDistinct($"event_id")).as("event_id_dup"))
    val docsAgg = documents.agg(
      sum(when(length($"text") === 0 || $"text".isNull, 1L).otherwise(0L)).as("text_empty"),
      sum(when($"n_chars" =!= length($"text"), 1L).otherwise(0L)).as("nchars_drift"))

    // FK checks: count of fact rows whose key misses the dimension
    val custKeys = customer.select($"c_custkey").distinct()
    val orderKeys = orders.select($"o_orderkey").distinct()
    // custKeys is customer-cardinality (scales with SF) — AQE sizes the join.
    val fkOrdersCust = orders.join(custKeys,
        $"o_custkey" === $"c_custkey", "left_anti")
      .agg(count(lit(1)).as("v"))
    val fkLineOrders = lineitem.join(orderKeys,
        $"l_orderkey" === $"o_orderkey", "left_anti")
      .agg(count(lit(1)).as("v"))

    one("fk_lineitem_orderkey", fkLineOrders)
      .unionByName(one("fk_orders_custkey", fkOrdersCust))
      .unionByName(ordersAgg.select(lit("orders_orderkey_unique").as("check"),
        $"orderkey_dup".cast("long").as("violations")))
      .unionByName(ordersAgg.select(lit("orders_custkey_notnull").as("check"),
        $"custkey_null".cast("long").as("violations")))
      .unionByName(ordersAgg.select(lit("orders_totalprice_positive").as("check"),
        $"price_nonpos".cast("long").as("violations")))
      .unionByName(lineitemAgg.select(lit("lineitem_quantity_range").as("check"),
        $"qty_range".cast("long").as("violations")))
      .unionByName(lineitemAgg.select(lit("lineitem_shipdate_notnull").as("check"),
        $"shipdate_null".cast("long").as("violations")))
      .unionByName(eventsAgg.select(lit("events_ts_notnull").as("check"),
        $"ts_null".cast("long").as("violations")))
      .unionByName(eventsAgg.select(lit("events_event_id_unique").as("check"),
        $"event_id_dup".cast("long").as("violations")))
      .unionByName(docsAgg.select(lit("documents_text_nonempty").as("check"),
        $"text_empty".cast("long").as("violations")))
      .unionByName(docsAgg.select(lit("documents_nchars_consistent").as("check"),
        $"nchars_drift".cast("long").as("violations")))
      .withColumn("pass", ($"violations" === 0L).cast("boolean"))
      .orderBy($"check")
  }

  val dqReportSql: String =
    """WITH orders_x AS (
      |  SELECT * FROM orders
      |  UNION ALL
      |  (SELECT o_orderkey, 99999999 AS o_custkey, o_orderstatus,
      |     -1.0 AS o_totalprice, o_orderdate, o_orderpriority
      |   FROM orders ORDER BY o_orderkey LIMIT 1)),
      |checks AS (
      |  SELECT 'fk_lineitem_orderkey' AS "check", (
      |    SELECT count(*) FROM lineitem l
      |    WHERE NOT EXISTS (SELECT 1 FROM orders_x o WHERE o.o_orderkey = l.l_orderkey)
      |  ) AS violations
      |  UNION ALL SELECT 'fk_orders_custkey', (
      |    SELECT count(*) FROM orders_x o
      |    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |  UNION ALL SELECT 'orders_orderkey_unique',
      |    (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders_x)
      |  UNION ALL SELECT 'orders_custkey_notnull',
      |    (SELECT count(*) FILTER (WHERE o_custkey IS NULL) FROM orders_x)
      |  UNION ALL SELECT 'orders_totalprice_positive',
      |    (SELECT count(*) FILTER (WHERE o_totalprice <= 0) FROM orders_x)
      |  UNION ALL SELECT 'lineitem_quantity_range',
      |    (SELECT count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) FROM lineitem)
      |  UNION ALL SELECT 'lineitem_shipdate_notnull',
      |    (SELECT count(*) FILTER (WHERE l_shipdate IS NULL) FROM lineitem)
      |  UNION ALL SELECT 'events_ts_notnull',
      |    (SELECT count(*) FILTER (WHERE ts IS NULL) FROM events)
      |  UNION ALL SELECT 'events_event_id_unique',
      |    (SELECT count(*) - count(DISTINCT event_id) FROM events)
      |  UNION ALL SELECT 'documents_text_nonempty',
      |    (SELECT count(*) FILTER (WHERE text IS NULL OR length(text) = 0) FROM documents)
      |  UNION ALL SELECT 'documents_nchars_consistent',
      |    (SELECT count(*) FILTER (WHERE n_chars <> length(text)) FROM documents))
      |SELECT "check", CAST(violations AS BIGINT) AS violations,
      |  violations = 0 AS pass
      |FROM checks ORDER BY "check"""".stripMargin
}
