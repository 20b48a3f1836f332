package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated testdata tables.
  *
  * One parquet file per table under `sfDir`. Loaders are thin on
  * purpose: the parquet scan is the pushdown frontier — callers select
  * and filter, Catalyst prunes columns and pushes predicates into the
  * scan, so a loader that pre-projected would only hide that.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table $name")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** events.ts is TIMESTAMP(NANOS) in parquet, read as a long (see
    * `spark.sql.legacy.parquet.nanosAsLong`). Surface it as:
    *   - `ts`: microsecond timestamp, ns floor-divided (matches DuckDB's
    *     floor-truncation semantics exactly, so oracle comparisons at any
    *     granularity agree), and
    *   - `ts_ns`: the raw nanosecond long for exact arithmetic.
    */
  private def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts_ns", col("ts"))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df.withColumn("ts_ns", unix_micros(col("ts")) * 1000)
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
