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
    val ts = spark.sql(
      "SELECT t.s.* FROM (SELECT token_stats('the cat the hat', 'the,a') AS s) t")
      .first()
    assert(ts.getLong(0) == 4 && ts.getLong(1) == 12
      && ts.getLong(2) == 2 && ts.getLong(3) == 3 && ts.getLong(4) == 2,
      s"token_stats SQL surface mismatch: $ts")
    val rp = spark.sql(
      "SELECT rp_project(CAST(array(1.0, -1.0) AS ARRAY<FLOAT>), 4) AS p")
      .first().getSeq[Long](0)
    assert(rp.length == 4 && rp.forall(v => math.abs(v) == 2000000L || v == 0L),
      s"rp_project SQL surface mismatch: $rp")
  }

  test("bloom_agg + bloom_might_contain compose as a SQL pre-pass filter") {
    GraftExtensions.register(spark)
    spark.range(100).createOrReplaceTempView("bloom_probe_t")
    // the scalar-subquery form might_contain requires; no false
    // negatives on the inserted half, few false positives above it
    val hits = spark.sql(
      """SELECT count(*) AS n FROM bloom_probe_t
        |WHERE bloom_might_contain(
        |  (SELECT bloom_agg(id, 1000) FROM bloom_probe_t WHERE id < 50), id)""".stripMargin)
      .first().getLong(0)
    assert(hits >= 50, s"bloom lost inserted items: $hits")
    assert(hits <= 60, s"false-positive rate implausibly high: $hits")
  }

  test("spark.sql.extensions injection path registers the functions") {
    import org.apache.spark.sql.SparkSession
    // force a genuinely new session (same SparkContext) so the
    // GraftExtensions.apply/injectFunction path actually runs — with the
    // shared session still default, getOrCreate would just return it
    val prior = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // `spark.sql.extensions` is a STATIC conf — it only takes effect on
      // a fresh SparkContext, which a test JVM can't make. withExtensions
      // drives the same GraftExtensions.apply/injectFunction path.
      val s2 = GraftSession.builder(2)
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s2 ne prior, "expected a fresh session for the injection test")
      // no manual register(): these resolve only if injection ran
      assert(s2.sql("SELECT vec_dot(CAST(array(1.0) AS ARRAY<FLOAT>), CAST(array(2.0) AS ARRAY<FLOAT>)) AS d")
        .first().getDouble(0) == 2.0)
      assert(s2.sql("SELECT sig_agree(array(CAST(1 AS BIGINT)), array(CAST(1 AS BIGINT))) AS a")
        .first().getInt(0) == 1)
      assert(s2.sql("SELECT token_hash32('a a') AS t").first().getSeq[Long](0).distinct.length == 1)
      // the native aggregates resolve through injection too
      assert(s2.sql(
        "SELECT top_k_by(CAST(v AS DOUBLE), CAST(v AS BIGINT), 2)[0].payload AS p " +
          "FROM VALUES (1), (5), (3) AS t(v)").first().getLong(0) == 5L)
      assert(s2.sql(
        "SELECT size(vec_cov_sum(array(CAST(1 AS BIGINT), CAST(2 AS BIGINT)))) AS s " +
          "FROM VALUES (1), (2) AS t(x)").first().getInt(0) == 3)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
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
