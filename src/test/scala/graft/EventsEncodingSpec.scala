package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Events-schema polymorphism: the driver has re-encoded `events.ts`
  * across rounds (nanosecond INT64 → TIMESTAMP_NTZ micros → TIMESTAMP
  * micros), and each re-encode has broken whichever read path wasn't
  * normalized that round (r5: the 7 event-time streaming queries).
  * This spec pins the contract that makes the next re-encode a no-op:
  * BOTH read paths — batch [[graft.sources.Tables.events]] and
  * streaming [[graft.streaming.StreamQueries.eventStream]] — yield the
  * identical normalized (`ts` TIMESTAMP, `ts_ns` LONG) pair under ALL
  * THREE encodings, and representative event-time operators (batch
  * window + the streaming window/sessionize shapes) produce
  * bit-identical results regardless of the on-disk encoding.
  */
class EventsEncodingSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Canonical fixture: 400 micro-aligned events over ~3 hours for 20
    * users (micro-aligned so every encoding can represent the instant
    * exactly).
    */
  private lazy val baseNs: Seq[(Long, Long, Long, String, Double, String)] = {
    val t0 = 1700000000L * 1000000000L
    (0 until 400).map { i =>
      (i.toLong, t0 + i.toLong * 27000000L * 1000L, (i % 20).toLong,
        Seq("click", "view", "purchase", "signup")(i % 4), (i % 97) * 1.25, "{}")
    }
  }

  /** Write the fixture under one of the three ts encodings and return
    * the directory holding events.parquet.
    */
  private def stage(encoding: String): String = {
    val d = tmpDir(s"graft_enc_$encoding")
    val df = baseNs.toDF("event_id", "ts_src", "user_id", "event_type", "value", "props")
    val encoded = encoding match {
      case "ns_long" => df.withColumn("ts", $"ts_src")
      case "ntz" => df.withColumn("ts",
        timestamp_micros(expr("ts_src div 1000")).cast("timestamp_ntz"))
      case "tz" => df.withColumn("ts", timestamp_micros(expr("ts_src div 1000")))
    }
    // single FLAT file named events.parquet, exactly like the driver's
    // testdata layout (a write.parquet dir would defeat the directory
    // reads in stageEvents/eventStream)
    val scratch = tmpDir(s"graft_enc_w_$encoding")
    encoded.select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$d/events.parquet"))
    d
  }

  private lazy val dirs: Map[String, String] =
    Seq("ns_long", "ntz", "tz").map(e => e -> stage(e)).toMap

  private def canon(df: DataFrame): Seq[(Long, Long, String)] =
    df.select($"event_id", $"ts_ns",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq

  test("batch loader normalizes all three encodings to the same (ts, ts_ns)") {
    val per = dirs.map { case (enc, d) =>
      val df = graft.sources.Tables.events(spark, d)
      assert(df.schema("ts").dataType.typeName === "timestamp", s"$enc: ts type")
      assert(df.schema("ts_ns").dataType.typeName === "long", s"$enc: ts_ns type")
      enc -> canon(df)
    }
    val want = baseNs.map(t => t._1 -> t._2).toMap
    per.foreach { case (enc, rows) =>
      rows.foreach { case (id, ns, _) =>
        assert(ns === want(id), s"$enc: ts_ns diverged for event $id")
      }
    }
    assert(per.values.toSeq.distinct.size === 1,
      "batch normalization differs across encodings")
  }

  test("streaming read path normalizes identically to the batch path") {
    dirs.foreach { case (enc, d) =>
      val name = s"enc_stream_$enc"
      val q = graft.streaming.StreamQueries.eventStream(spark, d)
        .select($"event_id", $"ts", $"ts_ns")
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      q.processAllAvailable(); q.stop()
      val streamed = canon(spark.table(name))
      val batch = canon(graft.sources.Tables.events(spark, d))
      assert(streamed === batch, s"$enc: stream/batch normalization diverged")
    }
  }

  test("event-time operators are encoding-invariant (batch + streaming shapes)") {
    // batch: the hourly rollup; streaming: tumbling window agg — the
    // two shapes the r5 regression broke
    val results = dirs.map { case (enc, d) =>
      val hourly = graft.sources.Tables.events(spark, d)
        .groupBy(date_trunc("hour", $"ts").as("h"), $"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(18,4)")).cast("double").as("tv"))
        .select(date_format($"h", "yyyy-MM-dd HH:mm:ss").as("h"),
          $"event_type", $"n", $"tv")
        .as[(String, String, Long, Double)].collect().sorted.toSeq
      val name = s"enc_wagg_$enc"
      val q = graft.streaming.CdcStream.windowAgg(
          graft.streaming.StreamQueries.eventStream(spark, d))
        .writeStream.outputMode("complete").format("memory").queryName(name).start()
      q.processAllAvailable(); q.stop()
      val streamed = spark.table(name)
        .select(date_format($"hour", "yyyy-MM-dd HH:mm:ss").as("h"),
          $"event_type", $"n", $"total_value")
        .as[(String, String, Long, Double)].collect().sorted.toSeq
      assert(streamed === hourly, s"$enc: streaming window != batch hourly")
      enc -> hourly
    }
    assert(results.values.toSeq.distinct.size === 1,
      "operator output differs across encodings")
  }
}
