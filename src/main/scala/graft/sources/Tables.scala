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

  /** The driver has generated events.ts under several parquet encodings
    * across rounds — TIMESTAMP(NANOS) (read as a long via
    * `spark.sql.legacy.parquet.nanosAsLong`), TIMESTAMP_NTZ micros
    * (isAdjustedToUTC=false), and plain TIMESTAMP micros. Normalize all
    * of them to the same two columns so operators never branch:
    *   - `ts`: microsecond TIMESTAMP (ns floor-divided when the source
    *     is nanos — matches DuckDB's floor-truncation, so oracle
    *     comparisons at any granularity agree; NTZ is cast under the
    *     UTC session timezone, which preserves the wall-clock instant
    *     DuckDB sees), and
    *   - `ts_ns`: a nanosecond long for exact integer arithmetic
    *     (mirrors DuckDB `epoch_ns(ts)`, which also accepts micros).
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        val t = col("ts").cast(TimestampType)
        df.withColumn("ts", t).withColumn("ts_ns", unix_micros(t) * 1000)
      case _ =>
        df.withColumn("ts_ns", unix_micros(col("ts")) * 1000)
    }
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
