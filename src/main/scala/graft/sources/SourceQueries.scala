package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-visible queries over the non-parquet batch sources: each
  * round-trips a table through the format (write + schema-checked read)
  * and computes an aggregate the oracle reproduces from the original
  * parquet — proving the source path end-to-end, not just in a spec.
  */
object SourceQueries {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** CSV source: nation through header CSV, joined to region. */
  def csvSource(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = tmp("graft_csv")
    Tables.nation(spark, dir).write.mode("overwrite")
      .option("header", "true").csv(out)
    val nation = spark.read.option("header", "true")
      .schema(Tables.nation(spark, dir).schema).csv(out)
    nation.join(Tables.region(spark, dir), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(count(lit(1)).as("n_nations"), min($"n_name").as("first_nation"))
      .orderBy($"r_name")
  }

  val csvSourceSql: String =
    """SELECT r_name, count(*) AS n_nations, min(n_name) AS first_nation
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** JSON-lines source: customer through JSON (numeric-safe output:
    * grouped counts and integer keys only — double round-trips are
    * format-exact in Spark's JSON writer, but the oracle reads the
    * original parquet, so the query sticks to discrete columns).
    */
  def jsonSource(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = tmp("graft_json")
    Tables.customer(spark, dir)
      .select($"c_custkey", $"c_nationkey", $"c_mktsegment")
      .write.mode("overwrite").json(out)
    val customer = spark.read
      .schema("c_custkey BIGINT, c_nationkey INT, c_mktsegment STRING")
      .json(out)
    customer.groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        min($"c_custkey").as("min_key"), max($"c_custkey").as("max_key"))
      .orderBy($"c_mktsegment")
  }

  val jsonSourceSql: String =
    """SELECT c_mktsegment, count(*) AS n_customers,
      |  min(c_custkey) AS min_key, max(c_custkey) AS max_key
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** ORC source: orders through Spark's built-in columnar ORC format
    * (typed round-trip incl. timestamps), aggregated by status. ORC is
    * the second pushdown-capable columnar format next to parquet — the
    * predicate below reaches the ORC reader as a pushed filter, and the
    * oracle reproduces the aggregate from the original parquet.
    */
  def orcSource(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = tmp("graft_orc")
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_orderpriority")
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .filter($"o_orderpriority" =!= "3-MEDIUM")
      .groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        min($"o_orderkey").as("min_key"), max($"o_orderkey").as("max_key"))
      .orderBy($"o_orderstatus", $"o_orderpriority")
  }

  val orcSourceSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM orders WHERE o_orderpriority <> '3-MEDIUM'
      |GROUP BY o_orderstatus, o_orderpriority
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin
}
