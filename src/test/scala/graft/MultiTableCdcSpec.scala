package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.Cdc

/** The reference's e2e flow (test_cdc.py: insert rows upstream → they
  * appear in the per-table sink tables) over a TWO-table envelope feed —
  * each table with its own row schema and its own id-columns, like
  * postgres/scripts/seed/000_init.sql's two-table model and
  * connect-iceberg-sink.json's per-table key config.
  */
class MultiTableCdcSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val accountSchema = StructType(Seq(
    StructField("id", LongType), StructField("owner", StringType),
    StructField("balance", DoubleType)))
  private val productSchema = StructType(Seq(
    StructField("sku", StringType), StructField("price", DoubleType)))

  private def env(table: String, op: String, after: String, before: String, tsMs: Long) = {
    val a = if (after == null) "null" else after
    val b = if (before == null) "null" else before
    s"""{"payload":{"before":$b,"after":$a,"op":"$op","ts_ms":$tsMs,""" +
      s""""source":{"db":"postgres","schema":"commerce","table":"$table"}}}"""
  }

  // batch 1: inserts; batch 2: update/insert/delete — split across files
  // so the STREAM processes them as separate micro-batches
  private val batch1 = Seq(
    env("account", "c", """{"id":1,"owner":"ada","balance":10.5}""", null, 1),
    env("account", "c", """{"id":2,"owner":"bob","balance":20.0}""", null, 2),
    env("product", "c", """{"sku":"A","price":5.0}""", null, 3),
    env("product", "c", """{"sku":"B","price":7.0}""", null, 4))
  private val batch2 = Seq(
    env("account", "u", """{"id":1,"owner":"ada","balance":99.9}""",
      """{"id":1,"owner":"ada","balance":10.5}""", 5),
    env("account", "c", """{"id":3,"owner":"eve","balance":1.0}""", null, 6),
    env("product", "u", """{"sku":"A","price":6.5}""", """{"sku":"A","price":5.0}""", 7),
    env("product", "d", null, """{"sku":"B","price":7.0}""", 8))

  private val schemas = Map("account" -> accountSchema, "product" -> productSchema)
  private val routes = Map(
    "account" -> Cdc.TableRoute(Seq("id"), "ts_ms"),
    "product" -> Cdc.TableRoute(Seq("sku"), "ts_ms"))

  test("two-table envelope feed: typed per-table parse + per-key upsert (batch)") {
    val raw = (batch1 ++ batch2).toDF("raw")
    val logs = Cdc.parseTables(raw, schemas)
    assert(logs("account").columns.toSeq ==
      Seq("id", "owner", "balance", "op", "ts_ms"))
    assert(logs("product").columns.toSeq == Seq("sku", "price", "op", "ts_ms"))
    val snaps = Cdc.materializeAll(logs, routes)

    val acct = snaps("account").orderBy($"id")
      .select($"id", $"owner", $"balance").collect()
    assert(acct.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(acct(0).getDouble(2) == 99.9)  // update applied, latest wins
    assert(acct(1).getDouble(2) == 20.0)

    val prod = snaps("product").orderBy($"sku")
      .select($"sku", $"price").collect()
    assert(prod.map(_.getString(0)).toSeq == Seq("A"))  // B deleted
    assert(prod(0).getDouble(1) == 6.5)
  }

  test("topic-pattern ingestion: glob-matched topics only, typed per-table sinks") {
    val busDir = tmp("graft_bus")
    val sinkDir = tmp("graft_bus_sink")
    def topic(name: String, lines: Seq[String]): Unit = {
      val d = java.nio.file.Paths.get(s"$busDir/$name")
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve("part0.json"), lines.mkString("\n").getBytes)
    }
    topic("cdc.commerce.account", batch1.take(2) ++ batch2.take(2))
    topic("cdc.commerce.product", batch1.drop(2) ++ batch2.drop(2))
    // a topic OUTSIDE the subscribed pattern: must not be ingested
    topic("audit.internal.log",
      Seq(env("account", "c", """{"id":99,"owner":"mallory","balance":0.0}""", null, 9)))

    val q = graft.streaming.CdcStream.ingestTopics(
      spark, busDir, "cdc.commerce.*", schemas, sinkDir, tmp("graft_bus_ckpt"))
    q.processAllAvailable(); q.stop()

    val acct = Cdc.materialize(spark.read.parquet(s"$sinkDir/account"), routes("account"))
    val prod = Cdc.materialize(spark.read.parquet(s"$sinkDir/product"), routes("product"))
    assert(acct.count() == 3)                       // id 99 NOT ingested
    assert(acct.filter($"id" === 99).count() == 0)
    assert(acct.filter($"id" === 1).first().getAs[Double]("balance") == 99.9)
    assert(prod.collect().map(_.getAs[String]("sku")).toSeq == Seq("A"))
  }

  test("two-table streaming ingest: inserted rows appear in each sink table") {
    val inDir = tmp("graft_mt_in")
    val sinkDir = tmp("graft_mt_sink")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$inDir/b1.json"),
      batch1.mkString("\n").getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$inDir/b2.json"),
      batch2.mkString("\n").getBytes)
    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1) // force two micro-batches
      .text(inDir)
      .withColumnRenamed("value", "raw")
    val q = stream.writeStream
      .option("checkpointLocation", tmp("graft_mt_ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Cdc.parseTables(batch, schemas).foreach { case (t, df) =>
          df.write.mode("append").parquet(s"$sinkDir/$t")
        }
      }
      .start()
    q.processAllAvailable(); q.stop()

    // the reference assertion: rows inserted upstream appear in the
    // sink, current-state view reflects per-table keyed upserts
    val acct = Cdc.materialize(spark.read.parquet(s"$sinkDir/account"), routes("account"))
    val prod = Cdc.materialize(spark.read.parquet(s"$sinkDir/product"), routes("product"))
    assert(acct.count() == 3)
    assert(acct.filter($"id" === 1).first().getAs[Double]("balance") == 99.9)
    assert(prod.count() == 1)
    assert(prod.first().getAs[String]("sku") == "A")
    assert(prod.first().getAs[Double]("price") == 6.5)
  }

  test("bus dead letters: malformed and unrouted envelopes are quarantined, not dropped") {
    val busDir = tmp("graft_dl_bus")
    val sinkDir = tmp("graft_dl_sink")
    val topicDir = java.nio.file.Paths.get(s"$busDir/cdc.commerce.mixed")
    java.nio.file.Files.createDirectories(topicDir)
    val lines = Seq(
      batch1.head,                                               // valid account insert
      "{not json at all",                                        // unparseable
      env("ledger", "c", """{"x":1}""", null, 99))               // table w/o schema
    java.nio.file.Files.write(topicDir.resolve("p0.json"), lines.mkString("\n").getBytes)
    val q = graft.streaming.CdcStream.ingestTopics(
      spark, busDir, "cdc.commerce.*", Map("account" -> accountSchema),
      sinkDir, tmp("graft_dl_ckpt"))
    q.processAllAvailable(); q.stop()

    assert(spark.read.parquet(s"$sinkDir/account").count() == 1)
    val dead = spark.read.parquet(s"$sinkDir/_dead_letter").collect()
    assert(dead.length == 2)
    val reasons = dead.map(_.getAs[String]("reason")).sorted
    assert(reasons.toSeq == Seq("unparseable_envelope", "unrouted_table:ledger"))
  }

  test("streaming schema evolution: a table gains a column mid-stream and the sink widens") {
    // the reference's mergeSchema behavior (consumer.py:76-78): upstream
    // DDL adds a column; envelopes after it carry the extra field;
    // restarting the consumer with the widened schema must (a) keep the
    // old rows readable, (b) land the new field, (c) null-fill history
    val busDir = tmp("graft_evo_bus")
    val sinkDir = tmp("graft_evo_sink")
    val ckpt = tmp("graft_evo_ckpt")
    val topicDir = java.nio.file.Paths.get(s"$busDir/cdc.commerce.account")
    java.nio.file.Files.createDirectories(topicDir)

    // phase 1: v1 schema (no 'tier' column)
    java.nio.file.Files.write(topicDir.resolve("p1.json"),
      batch1.take(2).mkString("\n").getBytes)
    val q1 = graft.streaming.CdcStream.ingestTopics(
      spark, busDir, "cdc.commerce.*", Map("account" -> accountSchema), sinkDir, ckpt)
    q1.processAllAvailable(); q1.stop()

    // phase 2: upstream added 'tier'; envelopes carry it; consumer
    // restarts from the SAME checkpoint with the widened schema
    val widened = StructType(accountSchema.fields :+ StructField("tier", StringType))
    java.nio.file.Files.write(topicDir.resolve("p2.json"),
      Seq(env("account", "u",
        """{"id":2,"owner":"bob","balance":55.0,"tier":"gold"}""",
        """{"id":2,"owner":"bob","balance":20.0}""", 10)).mkString("\n").getBytes)
    val q2 = graft.streaming.CdcStream.ingestTopics(
      spark, busDir, "cdc.commerce.*", Map("account" -> widened), sinkDir, ckpt)
    q2.processAllAvailable(); q2.stop()

    val acct = Cdc.materialize(
      spark.read.option("mergeSchema", "true").parquet(s"$sinkDir/account"),
      routes("account"))
    assert(acct.count() == 2)
    assert(acct.schema.fieldNames.contains("tier"), "sink schema must widen")
    assert(acct.filter($"id" === 2).first().getAs[String]("tier") == "gold")
    assert(acct.filter($"id" === 2).first().getAs[Double]("balance") == 55.0)
    assert(acct.filter($"id" === 1).first().getAs[String]("tier") == null,
      "pre-evolution rows null-fill the new column")
  }
}
