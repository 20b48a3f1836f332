package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities: pre-shuffle once at write time, join free
  * forever after.
  *
  * At 100 TB the orders⋈lineitem shuffle is the single largest cost in
  * the relational suite; bucketing both fact tables by the join key at
  * ingest amortizes that shuffle across every downstream join. The spec
  * (BucketingSpec) asserts the bucketed join plans with NO shuffle
  * exchange on either side.
  */
object Bucketing {

  /** Write a DataFrame as a bucketed managed table (sorted within
    * buckets so sort-merge joins skip the sort too).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a previously-failed write can leave the managed location behind
    // without a catalog entry; clear it so CREATE TABLE AS can proceed
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Bucket the two fact tables by orderkey and return the co-located
    * join — no Exchange feeding the join (later aggregations shuffle on
    * their own keys as usual).
    */
  def bucketedFactJoin(spark: SparkSession, dir: String, buckets: Int = 8): DataFrame = {
    import spark.implicits._
    writeBucketed(graft.sources.Tables.orders(spark, dir), "b_orders", "o_orderkey", buckets)
    writeBucketed(graft.sources.Tables.lineitem(spark, dir), "b_lineitem", "l_orderkey", buckets)
    spark.table("b_lineitem")
      .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
  }

  /** Driver-visible query over the bucketed join (the write-once /
    * join-shuffle-free ingest pattern, then a rollup); values must match
    * the same aggregation over the raw parquet tables.
    */
  def bucketedJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import Relational.dec
    bucketedFactJoin(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(dec($"l_quantity")).cast("double").as("total_qty"))
      .orderBy($"o_orderpriority")
  }

  val bucketedJoinAggSql: String =
    s"""SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(sum(${Relational.sqlDec("l_quantity")}) AS DOUBLE) AS total_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
}
