package graft

import org.apache.spark.sql.functions._
import graft.streaming.{CdcStream, SessEvent, Sessionize}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** File streams require a directory source; stage the single-parquet
    * table into one.
    */
  private lazy val eventsDir: String = {
    val d = tmp("graft_events_in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$d/events.parquet"))
    d
  }

  test("streaming CDC ingest: routed log + materialized view match batch") {
    val logDir = tmp("graft_stream_log")
    val q = CdcStream.ingest(spark, eventsDir, logDir, tmp("graft_ckpt"))
    q.processAllAvailable(); q.stop()
    val view = CdcStream.materializedView(spark, logDir)
      .select($"user_id", $"current_value".as("stream_value"))
    val batch = graft.cdc.Cdc.cdcMaterialize(spark, sf)
    assert(view.count() == batch.count())
    val mismatched = view.join(batch, "user_id")
      .filter($"stream_value" =!= $"current_value").count()
    assert(mismatched == 0)
  }

  test("merge-on-write sink: multi-batch MERGE with mid-stream restart equals full replay") {
    val inDir = tmp("graft_merge_in")
    graft.sources.Tables.events(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(inDir)
    val baseDir = tmp("graft_merge_base")
    val ckpt = tmp("graft_merge_ckpt")
    // phase 1: run a first query and stop it (whatever batches it got)
    val q1 = CdcStream.mergeIngest(spark, inDir, baseDir, ckpt)
    q1.processAllAvailable(); q1.stop()
    // phase 2: RESTART from the same checkpoint — replays/continues;
    // version-by-batchId overwrite must keep the result exactly-once
    val q2 = CdcStream.mergeIngest(spark, inDir, baseDir, ckpt)
    q2.processAllAvailable(); q2.stop()
    val merged = CdcStream.mergedView(spark, baseDir)
      .select($"user_id", $"current_value", $"last_op", $"last_offset")
    val full = graft.cdc.Cdc.cdcMaterialize(spark, sf)
      .select($"user_id", $"current_value", $"last_op", $"last_offset")
    assert(merged.exceptAll(full).count() == 0 && full.exceptAll(merged).count() == 0,
      "streamed merge snapshot must equal the batch full replay")
    // multiple versions actually materialized (several micro-batches ran)
    val versions = new java.io.File(baseDir).listFiles().count(_.getName.startsWith("v="))
    assert(versions >= 2, s"expected multiple snapshot versions, got $versions")
  }

  test("streaming window agg equals batch window agg") {
    val outName = "stream_hourly"
    val events = sources.Tables.normalizeEventTs(spark.readStream
      .schema(spark.read.parquet(eventsDir).schema)
      .parquet(eventsDir))
    val q = CdcStream.windowAgg(events)
      .writeStream.outputMode("complete").format("memory").queryName(outName).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table(outName)
      .agg(sum($"n")).first().getLong(0)
    val total = spark.read.parquet(s"$sf/events.parquet").count()
    assert(streamed == total)
  }

  test("streaming dedup drops re-delivered events") {
    val ev = sources.Tables.events(spark, sf).limit(100)
    val dup = ev.unionAll(ev) // simulate at-least-once redelivery
    val outName = "stream_dedup_out"
    val dir = tmp("graft_dedup_in")
    dup.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(dup.schema).parquet(dir)
    val q = CdcStream.streamDedup(stream)
      .writeStream.outputMode("append").format("memory").queryName(outName).start()
    q.processAllAvailable(); q.stop()
    assert(spark.table(outName).count() == 100)
  }

  test("stream-stream interval join matches the batch range join") {
    def streamEvents() = sources.Tables.normalizeEventTs(spark.readStream
      .schema(spark.read.parquet(eventsDir).schema)
      .parquet(eventsDir))
    val purchases = streamEvents().filter($"event_type" === "purchase")
    val clicks = streamEvents().filter($"event_type" === "click")
    val q = streaming.CdcStream.streamStreamJoin(purchases, clicks)
      .writeStream.outputMode("append").format("memory")
      .queryName("ss_join").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ss_join").count()
    // batch equivalent on the same inputs
    val ev = sources.Tables.events(spark, sf)
      .withColumn("s", expr("ts_ns div 1000000000"))
    val batch = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"s".as("ps"))
      .join(ev.filter($"event_type" === "click").select($"user_id".as("cu"), $"s".as("cs")),
        $"pu" === $"cu" && $"cs" >= $"ps" - 3600 && $"cs" <= $"ps")
      .count()
    // second-floor vs microsecond boundaries can differ on exact-edge
    // pairs; allow a tiny slack
    assert(math.abs(streamed - batch) <= 2,
      s"stream=$streamed batch=$batch")
  }

  test("stateful sessionization matches batch gap-sessionizer session counts") {
    val ev = sources.Tables.events(spark, sf)
      .select($"user_id", $"event_id", expr("ts_ns div 1000000000").as("ts_s"), $"value")
      .as[SessEvent]
    val sessions = Sessionize.sessionize(spark, ev, closeAtEnd = true)
    val streamedCounts = sessions.groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"))
    val batch = operators.Windows.sessionize(spark, sf)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions_b"), sum($"n_events").as("n_events_b"))
    val diff = streamedCounts.join(batch, "user_id")
      .filter($"n_sessions" =!= $"n_sessions_b" || $"n_events" =!= $"n_events_b")
    assert(diff.count() == 0)
    assert(streamedCounts.count() == batch.count())
  }

  test("streaming attribution carries last-touch state across micro-batches") {
    // split events into 3 time-ordered files: maxFilesPerTrigger=1
    // forces 3 micro-batches, so a purchase in batch N must be credited
    // to a touch carried from batch N-1 via state, not the batch slice
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"event_type", $"ts_ns", $"value")
      .orderBy($"ts_ns", $"event_id")
    val inDir = java.nio.file.Files.createTempDirectory("graft_attrib_multi").toString
    val n = ev.count()
    val slices = ev.collect().grouped((n / 3 + 1).toInt).toSeq
    slices.zipWithIndex.foreach { case (rows, i) =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), ev.schema)
        .write.parquet(s"$inDir/slice_$i")
    }
    val schema = ev.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$inDir/slice_*")
      .as[graft.streaming.AttribEvent]
    val name = "attrib_multi_sink"
    val q = graft.streaming.Attribution.attribute(spark, stream)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table(name)
      .groupBy($"channel")
      .agg(count(lit(1)).as("conversions"), sum($"v_micro").as("value_micro"))
    val batch = operators.Behavior.funnelAttribution(spark, sf)
      .select($"channel", $"conversions".as("conversions_b"),
        $"value_micro".as("value_micro_b"))
    val bad = streamed.join(batch, "channel")
      .filter($"conversions" =!= $"conversions_b" ||
        $"value_micro" =!= $"value_micro_b")
    assert(bad.count() == 0, "streamed channel rollup diverged from batch")
    assert(streamed.count() == batch.count())
  }
}
