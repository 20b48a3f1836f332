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

  /** Floor below which the adaptive repartition cannot pay for itself.
    * 48 KB keeps documents in at every oracle-checked SF, so the
    * repartitioned plan shape is exactly what correctness verifies. */
  private val ScaledReadMinBytes = 48L * 1024

  /** Scale-adaptive scan parallelism for operators whose SCAN-FUSED
    * per-row compute dominates (per-position md5 fingerprinting, gram
    * pyramids — guide §2.5 "input skew"/§1.2 step 1): the driver's
    * testdata ships ONE single-row-group parquet file per table, so
    * every scan is a one-task stage and the fused kernel serializes
    * onto one core. When the file's split count (bytes /
    * maxPartitionBytes) cannot feed `defaultParallelism`, insert one
    * round-robin repartition; at a production layout (splits >> cores)
    * the condition is false and this is a no-op — no exchange is added
    * at scale. Filters and column pruning still reach the parquet scan
    * (verified: PushedFilters/ReadSchema identical with and without —
    * the optimizer pushes both below the Repartition).
    *
    * Deliberately OPT-IN per operator, not applied in [[load]]: for
    * explode→aggregate pipelines the extra exchange ships the text
    * payload and costs more than the parallel decode buys (measured
    * +40..90% on bm25_multi / text_tfidf / events_hourly / gopher_rules
    * at sf0.1; −30..54% on the md5-per-position family — see
    * OPTIMIZATION_r13.md).
    */
  def documentsScaled(spark: SparkSession, sfDir: String): DataFrame = {
    val df = documents(spark, sfDir)
    val bytes =
      try new java.io.File(s"$sfDir/documents.parquet").length
      catch { case _: Throwable => Long.MaxValue }
    val cores = spark.sparkContext.defaultParallelism
    val maxPart = spark.sessionState.conf.filesMaxPartitionBytes
    if (bytes >= ScaledReadMinBytes && bytes < maxPart * cores.toLong)
      df.repartition(cores)
    else df
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
