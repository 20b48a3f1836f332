package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** A message-bus source for CDC envelope streams: anything that can open
  * a streaming DataFrame with a single `raw` string column of JSON
  * envelope lines. Routing, per-table schema application, dead-letter
  * quarantine and restart semantics all live ABOVE this interface
  * ([[CdcStream.ingestTopics]]), so swapping the bus swaps only where
  * bytes come from — the pipeline logic is proven once on the file bus
  * and runs unchanged on a broker.
  */
sealed trait BusSource {
  /** Open the unbounded stream of raw envelope lines (column `raw`). */
  def open(spark: SparkSession): DataFrame
}

/** Directory bus — the no-broker analog used in tests and this sandbox:
  * each subdirectory of `busDir` is a topic of JSON envelope lines and
  * `topicGlob` selects which topics are ingested (the file-system twin
  * of Kafka's `subscribePattern`).
  */
final case class FileBus(busDir: String, topicGlob: String) extends BusSource {
  override def open(spark: SparkSession): DataFrame =
    spark.readStream
      .text(s"$busDir/$topicGlob")
      .withColumnRenamed("value", "raw")
}

/** Kafka bus mirroring the reference consumer's subscription
  * (/root/reference/spark/scripts/consumer.py:33-38: `format("kafka")`,
  * `subscribePattern "cdc.commerce.*"`, `startingOffsets earliest`).
  * Offset progress is managed by the Structured Streaming checkpoint
  * (the `checkpointLocation` the ingest query already sets), NOT by a
  * Kafka consumer group — replay after failure re-reads from the last
  * committed batch's offsets, preserving the pipeline's idempotent
  * append semantics. `extraOptions` passes through any further
  * `kafka.*` client or source tuning (e.g. `maxOffsetsPerTrigger` to
  * bound batch size at scale, TLS configs).
  *
  * The spark-sql-kafka connector jar is not shipped in this sandbox, so
  * [[open]] can only be exercised against a real broker deployment;
  * [[readerOptions]] is the spec-tested wiring.
  */
final case class KafkaBus(bootstrapServers: String,
                          subscribePattern: String,
                          startingOffsets: String = "earliest",
                          extraOptions: Map[String, String] = Map.empty)
    extends BusSource {

  /** The exact option map handed to the kafka source. */
  def readerOptions: Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribePattern" -> subscribePattern,
      "startingOffsets" -> startingOffsets) ++ extraOptions

  override def open(spark: SparkSession): DataFrame =
    spark.readStream
      .format("kafka")
      .options(readerOptions)
      .load()
      // Kafka delivers bytes; envelopes are UTF-8 JSON lines like the
      // file bus, so downstream parsing is source-agnostic
      .select(col("value").cast("string").as("raw"))
}
