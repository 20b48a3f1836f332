package graft

import org.apache.spark.sql.functions._
import graft.streaming.{SessEvent, Sessionize}

/** Append-mode emission discipline across micro-batches: every session
  * is emitted exactly once — when closed by a gap or when the watermark
  * passes its deadline — and open trailing sessions are never emitted
  * provisionally (the r1 implementation re-emitted the open session
  * every batch with growing counts).
  */
class SessionEmissionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("sessions are emitted exactly once across micro-batches") {
    val inDir = tmp("graft_sess_in")
    val t0 = 1000000L // away from epoch 0 (the initial watermark)
    // batch 1: user 1 and user 2 each open a session
    Seq((1L, 1L, t0, 1.0), (1L, 2L, t0 + 100, 2.0),
        (2L, 3L, t0, 5.0), (2L, 4L, t0 + 50, 5.0))
      .toDF("user_id", "event_id", "ts_s", "value")
      .coalesce(1).write.mode("append").parquet(inDir)
    // batch 2: user 1 returns after > 30 min (closes session 1, opens
    // session 2); user 2 is silent (watermark passes their deadline)
    Seq((1L, 5L, t0 + 10000, 3.0), (1L, 6L, t0 + 10100, 4.0))
      .toDF("user_id", "event_id", "ts_s", "value")
      .coalesce(1).write.mode("append").parquet(inDir)

    val name = "sess_emission_out"
    val events = spark.readStream
      .schema(spark.read.parquet(inDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
      .withColumn("et", col("ts_s").cast("timestamp"))
      .withWatermark("et", "0 seconds")
      .select(col("user_id"), col("event_id"), col("ts_s"), col("value"), col("et"))
      .as[SessEvent]
    val q = Sessionize.sessionize(spark, events)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable(); q.stop()

    val rows = spark.table(name)
      .select($"user_id", $"session_id", $"n_events", $"session_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // user 1 session 1: closed by the gap, final counts, exactly once;
    // user 2 session 1: finalized by watermark timeout;
    // user 1 session 2: still open at end of input -> NOT emitted
    assert(rows == Set((1L, 1L, 2L, 3.0), (2L, 1L, 2L, 10.0)),
      s"got $rows")
    // exactly-once: no duplicates possible if sizes match
    assert(spark.table(name).count() == 2)
  }
}
