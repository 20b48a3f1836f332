package graft

import org.apache.spark.sql.functions._
import graft.streaming.{Scd2Change, Scd2Stream}

/** Cross-micro-batch semantics for the round-4 streaming pair:
  * stream_scd2 (a version must close across a batch boundary) and
  * stream_dedup_gate (the frozen index flags arrivals in any batch).
  */
class Scd2GateSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("stream_scd2: versions close across micro-batches and match the batch lead()") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select($"user_id",
        when($"event_type" === "signup", "c")
          .when($"event_type" === "purchase", "u")
          .when($"event_type" === "error", "d")
          .otherwise("r").as("op"),
        $"value", $"event_id".as("offset"))
    val Array(half) = ev.agg(expr("max(offset) div 2")).collect().map(_.getLong(0))
    val inDir = tmpDir("graft_scd2_in")
    // wave 1 = low offsets, wave 2 = high: every key whose history
    // straddles the boundary must close its open wave-1 version from
    // a wave-2 arrival — the cross-batch path
    ev.filter($"offset" <= half).coalesce(1).write.mode("append").parquet(inDir)
    val name = "scd2_spec_sink"
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir).as[Scd2Change]
    val q = Scd2Stream.history(spark, stream)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    val closedAfterWave1 = spark.table(name).count()
    ev.filter($"offset" > half).coalesce(1).write.mode("append").parquet(inDir)
    q.processAllAvailable(); q.stop()

    val got = spark.table(name)
      .select($"user_id", $"value", $"op", $"valid_from", $"valid_to").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"offset")
    val want = ev.withColumn("valid_to", lead($"offset", 1).over(w))
      .filter($"op" =!= "d" && $"valid_to".isNotNull)
      .select($"user_id", $"value", $"op", $"offset", $"valid_to").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === want, "streamed closed versions diverged from the batch lead()")
    // the cross-batch close path genuinely ran: wave 2 closed versions
    // that were still open when wave 1 finished
    val straddling = want.count { case (_, _, _, from, to) => from <= half && to > half }
    assert(straddling > 0 && got.size.toLong > closedAfterWave1,
      s"no version closed across the batch boundary ($straddling straddling)")
  }

  test("stream_dedup_gate: every flagged pair is (old index doc, new arrival) " +
    "verified by signature agreement") {
    val out = graft.streaming.StreamQueries.streamDedupGate(spark, sf).collect()
    val cut = spark.read.parquet(s"$sf/documents.parquet")
      .agg(expr("max(doc_id) div 2")).first().getLong(0)
    assert(out.nonEmpty, "gate flagged nothing — planted dups should collide")
    out.foreach { r =>
      assert(r.getLong(0) <= cut, "i must be an index-side (old) doc")
      assert(r.getLong(1) > cut, "j must be a new arrival")
      assert(r.getDouble(2) >= 0.5, "flag below the verification threshold")
    }
    assert(out.map(r => (r.getLong(0), r.getLong(1))).distinct.length === out.length,
      "multi-band collisions must collapse to one row per pair")
  }
}
