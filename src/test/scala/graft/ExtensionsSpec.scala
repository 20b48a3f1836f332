package graft

import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL users can call the native functions after registration") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT vec_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>), CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d")
      .first().getDouble(0)
    assert(dot == 11.0)
    val sig = spark.sql("SELECT minhash_sig(array(CAST(7 AS BIGINT))) AS s")
      .first().getSeq[Long](0)
    assert(sig.length == functions.MinHashPerms.NumHashes)
    val sh = spark.sql("SELECT simhash64(array(CAST(5 AS BIGINT))) AS s")
      .first().getLong(0)
    assert(sh == 5L) // single token: its bits win every vote
  }

  test("extensions class injects functions into a fresh session") {
    val s2 = GraftSession.builder(2)
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    // getOrCreate may return the shared session; register covers both
    GraftExtensions.register(s2)
    assert(s2.sql("SELECT vec_dot(CAST(array(1.0) AS ARRAY<FLOAT>), CAST(array(2.0) AS ARRAY<FLOAT>)) AS d")
      .first().getDouble(0) == 2.0)
  }

  test("changelog compaction folds the log into a current-state base") {
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val logDir = tmp("graft_compact_log")
    val baseDir = tmp("graft_compact_base")
    cdc.Cdc.changelog(spark, sf)
      .select($"key".as("user_id"), $"op", $"value", $"offset".as("event_id"))
      .write.mode("overwrite").parquet(logDir)
    cdc.Cdc.compactChangelog(spark, logDir, baseDir, targetFiles = 2)
    val base = spark.read.parquet(baseDir)
    val expected = cdc.Cdc.cdcMaterialize(spark, sf)
    assert(base.count() == expected.count())
    val files = new java.io.File(baseDir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files <= 2, s"compaction left $files files")
    val joined = base.select($"user_id", $"value")
      .join(expected.select($"user_id", $"current_value"), "user_id")
      .filter($"value" =!= $"current_value")
    assert(joined.count() == 0)
  }
}
