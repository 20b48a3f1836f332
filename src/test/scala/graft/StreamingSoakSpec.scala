package graft

import org.apache.spark.sql.functions._

class StreamingSoakSpec extends SparkSpec {
  import spark.implicits._

  test("rate source soak: continuous micro-batches aggregate without loss") {
    val stream = spark.readStream
      .format("rate")
      .option("rowsPerSecond", "500")
      .load()  // schema: timestamp, value
    val agg = stream
      .withWatermark("timestamp", "2 seconds")
      .groupBy(window($"timestamp", "1 second"))
      .agg(count(lit(1)).as("n"), max($"value").as("max_v"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("rate_soak").start()
    try {
      q.processAllAvailable()
      Thread.sleep(2500)
      q.processAllAvailable()
      val rows = spark.table("rate_soak").agg(sum($"n"), max($"max_v")).first()
      val total = rows.getLong(0)
      val maxV = rows.getLong(1)
      // every generated value 0..max_v must be accounted for exactly once
      assert(total == maxV + 1, s"lost/duplicated rows: total=$total max=$maxV")
    } finally q.stop()
  }

  test("checkpointed CDC ingest is idempotent across restarts") {
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val in = tmp("graft_ck_in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$in/events.parquet"))
    val logDir = tmp("graft_ck_log")
    val ckpt = tmp("graft_ck_ckpt")
    val q1 = streaming.CdcStream.ingest(spark, in, logDir, ckpt)
    q1.processAllAvailable(); q1.stop()
    val n1 = spark.read.parquet(logDir).count()
    // restart with the same checkpoint: no new input → no new output
    val q2 = streaming.CdcStream.ingest(spark, in, logDir, ckpt)
    q2.processAllAvailable(); q2.stop()
    val n2 = spark.read.parquet(logDir).count()
    assert(n1 == n2, s"restart duplicated rows: $n1 -> $n2")
    assert(n1 == spark.read.parquet(s"$in/events.parquet").count())
  }
}
