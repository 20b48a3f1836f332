package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional extra args: restrict to the named queries (dev iteration
    // only — the driver always calls with exactly two args)
    val only = args.drop(2).toSet
    val sel: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      (if (only.isEmpty) SparkEntry.queries
       else SparkEntry.queries.filter(kv => only(kv._1))).toSeq.sortBy(_._1)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle_sql.json FIRST: if the sweep is cut short (driver wall
    // clock, OOM-kill), the oracle list must still exist so partial
    // results compare instead of the whole round zeroing.
    val json = SparkEntry.oracleSql
      .filter(kv => only.isEmpty || only(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // per-query watchdog: one hung query must not zero the whole
    // round's correctness dump. The query runs under its own job
    // group; on timeout the group is cancelled (stops the executors'
    // work, not just the wait) and the sweep continues. Sorted order +
    // start/done stderr lines make any driver-side drop attributable
    // (r7: domain_reweight had no CORRECTNESS row in any round while
    // locally green — this instrumentation is the tripwire).
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_VERIFY_TIMEOUT_SEC", "300").toLong
    val total = sel.size
    var idx = 0
    var failed = List.empty[String]
    sel.foreach { case (name, fn) =>
      idx += 1
      System.err.println(s"[verify] start $idx/$total $name")
      val t0 = System.nanoTime()
      val worker = new Thread(() =>
        try {
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        } finally spark.sparkContext.clearJobGroup())
      worker.setDaemon(true)
      worker.start()
      worker.join(timeoutSec * 1000)
      if (worker.isAlive) {
        System.err.println(s"[verify] $name TIMED OUT after ${timeoutSec}s — cancelling")
        spark.sparkContext.cancelJobGroup(name)
        worker.join(30000)
      }
      val ms = (System.nanoTime() - t0) / 1000000
      val ok = Files.exists(Paths.get(s"$outDir/$name/_SUCCESS"))
      if (!ok) failed ::= name
      System.err.println(s"[verify] done  $idx/$total $name ms=$ms ok=$ok")
      // operators persist intermediates (index/signature tables); left
      // cached across 160+ queries they accumulate until eviction storms
      spark.sharedState.cacheManager.clearCache()
    }
    // end-of-sweep audit: every registered query must have a committed
    // parquet dir; a shortfall is printed loudly so a missing
    // CORRECTNESS row is attributable to a named failure, never silent.
    if (failed.nonEmpty)
      System.err.println(s"[verify] INCOMPLETE ${total - failed.size}/$total — missing: ${failed.reverse.mkString(", ")}")
    else
      System.err.println(s"[verify] COMPLETE $total/$total")
    spark.stop()
  }
}
