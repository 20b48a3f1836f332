package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry: headline queries on SPARK_GRAFT_SF_DIR, one JSON
  * line to stdout. Times are end-to-end per query (plan + execute via
  * count()), after a warmup that touches every input file once so the
  * numbers measure compute, not page-cache priming.
  */
object Bench {
  // representative of each operator family; the full surface is in
  // SparkEntry.queries (exercised by Verify)
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_top_revenue", "q5_local_supplier",
    "q13_order_distribution", "q18_large_orders",
    "window_topn", "sessionize", "asof_join", "events_hourly",
    "cdc_materialize", "cdc_history",
    "dedup_exact", "dedup_minhash", "text_quality", "text_fingerprint",
    "ann_bruteforce")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: page-cache every input and run each headline query once at
    // the smallest SF so codegen/JIT compilation is excluded from the
    // timed pass (we measure compute, not JVM warmup)
    graft.sources.Tables.names.foreach { t =>
      graft.sources.Tables.load(spark, sfDir, t).count()
    }
    headline.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        try fn(spark, "/root/testdata/sf0.001").count()
        catch { case _: Throwable => () }
      }
    }

    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
