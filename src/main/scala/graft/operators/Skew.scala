package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Skew-handling utilities.
  *
  * AQE's skew-join split handles sort-merge skew at runtime; salting is
  * the static complement for hash aggregations and joins where one key
  * dominates (the classic null-key / hot-user problem at 100 TB).
  */
object Skew {

  /** Salted equi-join: the big side gets a deterministic salt derived
    * from a unique column (hash, not RNG — reruns and retries produce
    * identical partitioning); the small side is exploded `salts`×. The
    * result is row-identical to `big.join(small, key)`, but a hot key's
    * rows spread over `salts` reducers instead of one.
    */
  def saltedJoin(big: DataFrame, bigUnique: Column, small: DataFrame,
                 key: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(bigUnique), lit(salts)))
    val saltedSmall = small
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted partial → final) aggregation: pre-aggregate on
    * (key, salt), then merge. Equivalent to a plain groupBy-sum, but the
    * hot key's partial states are built on `salts` tasks. Spark's own
    * partial aggregation covers the map side; explicit salting also
    * splits the REDUCE side, which partial agg cannot.
    */
  def saltedSum(df: DataFrame, key: String, unique: Column, value: Column,
                salts: Int): DataFrame = {
    df.withColumn("__salt", pmod(xxhash64(unique), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("total"))
  }

  /** Demonstration query: per-event-type value totals via salted
    * two-phase aggregation (event_type has only 5 values — every key is
    * hot by construction). Oracle: the plain GROUP BY.
    */
  def skewAggSalted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    saltedSum(Tables.events(spark, dir), "event_type", $"event_id",
        $"value".cast("decimal(18,4)"), salts = 16)
      .select($"event_type", $"total".cast("double").as("total_value"))
      .orderBy($"event_type")
  }

  val skewAggSaltedSql: String =
    """SELECT event_type, CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Demonstration query: events joined to their user's order count via a
    * salted join. Oracle: the plain join.
    */
  def skewJoinSalted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val userOrders = Tables.orders(spark, dir)
      .groupBy($"o_custkey".as("user_id"))
      .agg(count(lit(1)).as("n_orders"))
    saltedJoin(Tables.events(spark, dir), $"event_id", userOrders, "user_id", 8)
      .groupBy($"user_id", $"n_orders")
      .agg(count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  val skewJoinSaltedSql: String =
    """SELECT user_id, n_orders, count(*) AS n_events
      |FROM events JOIN (SELECT o_custkey AS user_id, count(*) AS n_orders
      |                  FROM orders GROUP BY o_custkey) uo USING (user_id)
      |GROUP BY user_id, n_orders ORDER BY user_id""".stripMargin
}
