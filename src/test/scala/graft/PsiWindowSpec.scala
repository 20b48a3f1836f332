package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Profile

/** Windowed PSI: batch/stream equivalence and update-mode
  * incrementality (multiple micro-batches revise the same key; the
  * recovered final state still matches the batch operator exactly).
  */
class PsiWindowSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("psi_drift_windowed: every live window scores against the full reference grid") {
    val out = Profile.psiDriftWindowed(spark, sf).collect()
    assert(out.nonEmpty)
    // n_base and n_bins are per-type constants across windows: the
    // reference side does not depend on the window
    val byType = out.groupBy(_.getString(0))
    byType.foreach { case (t, rows) =>
      assert(rows.map(_.getAs[Long]("n_base")).distinct.length === 1,
        s"$t: reference size varied across windows")
    }
    // psi is nonnegative-ish only when distributions differ in one
    // direction; just pin finiteness + exact integer consistency
    out.foreach { r =>
      val nano = r.getAs[Long]("psi_nano")
      assert(r.getAs[Double]("psi") === math.rint(nano / 1e9 * 1e9) / 1e9 ||
        math.abs(r.getAs[Double]("psi") - nano / 1e9) < 1e-9)
    }
  }

  test("stream_psi_update across micro-batches: keys revised per batch, " +
    "final state bit-identical to batch") {
    val dayNs = 86400L * 1000000000L
    // normalized load: `ts_ns` is a long under every driver-side
    // encoding of events.ts (ns-long / TIMESTAMP_NTZ / TIMESTAMP)
    val ev = graft.sources.Tables.events(spark, sf)
    val Row(mn: Long, mx: Long) = ev.agg(min($"ts_ns"), max($"ts_ns")).first()
    val mid = mn + (mx - mn) / 2

    // stage the LIVE half in two waves split by event parity so most
    // (type, w, bin) keys receive rows in BOTH micro-batches; the
    // staged files carry the normalized schema, so the stream reads
    // `ts_ns` directly
    val inDir = tmpDir("graft_psiw_in")
    val live = ev.filter($"ts_ns" > mid)
    live.filter($"event_id" % 2 === 0).coalesce(1).write.mode("append").parquet(inDir)
    val name = "psiw_spec_sink"
    val q = spark.readStream.schema(live.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
      .withColumn("w", expr(s"cast((ts_ns - ${mid}L - 1) div ${dayNs}L as int)"))
      .withColumn("bin", floor($"value" / 50.0).cast("int"))
      .groupBy($"event_type", $"w", $"bin").agg(count(lit(1)).as("c_c"))
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    q.processAllAvailable()
    live.filter($"event_id" % 2 === 1).coalesce(1).write.mode("append").parquet(inDir)
    q.processAllAvailable(); q.stop()

    val sinkRaw = spark.table(name).collect()
    // update mode re-emits a key per micro-batch that changed it —
    // with both waves touching most keys, some key MUST appear twice
    val multiplicity = sinkRaw.groupBy(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      .map(_._2.length).max
    assert(multiplicity >= 2,
      "no key was revised across micro-batches — update mode did no incremental work")

    // final state (per-key max: counts are monotone) equals the batch counts
    val got = sinkRaw.groupBy(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      .map { case (k, rs) => (k, rs.map(_.getLong(3)).max) }
    val want = live
      .withColumn("w", expr(s"cast((ts_ns - ${mid}L - 1) div ${dayNs}L as int)"))
      .withColumn("bin", floor($"value" / 50.0).cast("int"))
      .groupBy($"event_type", $"w", $"bin").agg(count(lit(1)).as("c_c"))
      .collect()
      .map(r => ((r.getString(0), r.getInt(1), r.getInt(2)), r.getLong(3))).toMap
    assert(got.toMap === want, "recovered final state diverged from batch counts")
  }
}
