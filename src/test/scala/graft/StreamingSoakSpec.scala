package graft

import org.apache.spark.sql.functions._

class StreamingSoakSpec extends SparkSpec {
  import spark.implicits._

  test("rate source soak: continuous micro-batches aggregate without loss") {
    val stream = spark.readStream
      .format("rate")
      .option("rowsPerSecond", "500")
      .load()  // schema: timestamp, value
    val agg = stream
      .withWatermark("timestamp", "2 seconds")
      .groupBy(window($"timestamp", "1 second"))
      .agg(count(lit(1)).as("n"), max($"value").as("max_v"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("rate_soak").start()
    try {
      q.processAllAvailable()
      Thread.sleep(2500)
      q.processAllAvailable()
      val rows = spark.table("rate_soak").agg(sum($"n"), max($"max_v")).first()
      val total = rows.getLong(0)
      val maxV = rows.getLong(1)
      // every generated value 0..max_v must be accounted for exactly once
      assert(total == maxV + 1, s"lost/duplicated rows: total=$total max=$maxV")
    } finally q.stop()
  }

  test("checkpointed CDC ingest is idempotent across restarts") {
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val in = tmp("graft_ck_in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$in/events.parquet"))
    val logDir = tmp("graft_ck_log")
    val ckpt = tmp("graft_ck_ckpt")
    val q1 = streaming.CdcStream.ingest(spark, in, logDir, ckpt)
    q1.processAllAvailable(); q1.stop()
    val n1 = spark.read.parquet(logDir).count()
    // restart with the same checkpoint: no new input → no new output
    val q2 = streaming.CdcStream.ingest(spark, in, logDir, ckpt)
    q2.processAllAvailable(); q2.stop()
    val n2 = spark.read.parquet(logDir).count()
    assert(n1 == n2, s"restart duplicated rows: $n1 -> $n2")
    assert(n1 == spark.read.parquet(s"$in/events.parquet").count())
  }

  test("wide soak matrix: 4 tables x 8 waves x 2 restarts with deletes, " +
    "dead letters, and an unsubscribed topic") {
    import org.apache.spark.sql.types._
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val busDir = tmp("graft_wsoak_bus")
    val sinkDir = tmp("graft_wsoak_sink")
    val ckpt = tmp("graft_wsoak_ckpt")
    val tables = Seq("account", "product", "orders", "shipment")
    val schemas: Map[String, StructType] = tables.map { t =>
      t -> StructType(Seq(StructField("id", LongType), StructField("v", DoubleType)))
    }.toMap
    val routes = tables.map(t => t -> graft.cdc.Cdc.TableRoute(Seq("id"), "ts_ms")).toMap
    (tables :+ "audit.other").foreach { t =>
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$busDir/cdc.commerce.$t"))
    }

    val nIds = 4
    var validLines = 0L
    var deadLines = 0L
    def env(t: String, id: Long, op: String, v: Double, ts: Long): String = {
      val row = s"""{"id":$id,"v":$v}"""
      val (b, a) = if (op == "d") (row, "null") else ("null", row)
      s"""{"payload":{"before":$b,"after":$a,"op":"$op","ts_ms":$ts,""" +
        s""""source":{"db":"p","schema":"commerce","table":"$t"}}}"""
    }
    def writeWave(w: Int): Unit = {
      tables.foreach { t =>
        val lines = (0 until nIds).map { id =>
          // wave 3 deletes account's even ids; everything else upserts
          val op = if (w == 3 && t == "account" && id % 2 == 0) "d"
                   else if (w == 0) "c" else "u"
          env(t, id, op, w * 100.0 + id, w * 10L + id)
        } ++ (if (w == 4 && t == "product")
                Seq("{corrupt line", env("ghost_table", 9L, "c", 0.0, 999L))
              else Nil)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$busDir/cdc.commerce.$t/w$w.json"),
          lines.mkString("\n").getBytes)
        validLines += nIds
        if (w == 4 && t == "product") deadLines += 2
      }
      // traffic on the unsubscribed topic must never be ingested
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$busDir/cdc.commerce.audit.other/w$w.json"),
        "should never be read".getBytes)
    }
    // segment the 8 waves across three query incarnations (two restarts)
    def runWaves(ws: Range): Unit = {
      val q = streaming.CdcStream.ingestTopics(
        spark, streaming.FileBus(busDir, "cdc.commerce.{account,product,orders,shipment}"),
        schemas, sinkDir, ckpt)
      ws.foreach { w => writeWave(w); q.processAllAvailable() }
      q.stop()
    }
    runWaves(0 to 2); runWaves(3 to 5); runWaves(6 to 7)

    // exactly-once per table across both restarts
    val logs = tables.map(t => t -> spark.read.parquet(s"$sinkDir/$t")).toMap
    assert(logs.values.map(_.count()).sum == validLines,
      s"lost/duplicated changelog rows across restarts")
    // dead letters quarantined exactly once, with reasons
    val dead = spark.read.parquet(s"$sinkDir/_dead_letter")
    assert(dead.count() == deadLines)
    assert(dead.filter($"reason" === "unrouted_table:ghost_table").count() == 1)
    // latest-wins snapshots: wave-7 values everywhere, minus the
    // tombstoned account ids (deleted in wave 3, re-upserted in 4..7 —
    // so they must be PRESENT with post-delete values, proving the
    // delete didn't permanently shadow later updates)
    val snaps = graft.cdc.Cdc.materializeAll(logs, routes)
    tables.foreach { t =>
      val rows = snaps(t).collect()
      assert(rows.length == nIds, s"$t snapshot wrong size: ${rows.length}")
      rows.foreach { r =>
        assert(r.getAs[Double]("v") == 700.0 + r.getAs[Long]("id"),
          s"$t id ${r.getAs[Long]("id")} not at wave-7 state")
      }
    }
    // and a mid-history read really shows the tombstone: materializing
    // only waves <= 3 must drop account's even ids
    val upTo3 = logs("account").filter($"ts_ms" < 40)
    val snap3 = graft.cdc.Cdc.materialize(upTo3, routes("account"))
    assert(snap3.collect().map(_.getAs[Long]("id")).toSet == Set(1L, 3L),
      "wave-3 tombstones must erase even ids at that point in history")
  }

  test("topic-bus soak: waves across a restart ingest exactly once") {
    import org.apache.spark.sql.types._
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val busDir = tmp("graft_soak_bus")
    val sinkDir = tmp("graft_soak_sink")
    val ckpt = tmp("graft_soak_ckpt")
    val accountSchema = StructType(Seq(
      StructField("id", LongType), StructField("balance", DoubleType)))
    val productSchema = StructType(Seq(
      StructField("sku", StringType), StructField("price", DoubleType)))
    val schemas = Map("account" -> accountSchema, "product" -> productSchema)
    for (t <- schemas.keys)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$busDir/cdc.commerce.$t"))

    val nIds = 5
    var written = 0L
    def wave(w: Int): Unit = {
      val acct = (0 until nIds).map { id =>
        val op = if (w == 0) "c" else "u"
        s"""{"payload":{"before":null,"after":{"id":$id,"balance":${w * 100 + id}.0},""" +
          s""""op":"$op","ts_ms":${w * 10 + id},""" +
          s""""source":{"db":"p","schema":"commerce","table":"account"}}}"""
      }
      val prod = (0 until nIds).map { id =>
        s"""{"payload":{"before":null,"after":{"sku":"S$id","price":${w}.5},""" +
          s""""op":"${if (w == 0) "c" else "u"}","ts_ms":${w * 10 + id},""" +
          s""""source":{"db":"p","schema":"commerce","table":"product"}}}"""
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$busDir/cdc.commerce.account/w$w.json"),
        acct.mkString("\n").getBytes)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$busDir/cdc.commerce.product/w$w.json"),
        prod.mkString("\n").getBytes)
      written += 2L * nIds
    }

    val lastWave = 5
    val q1 = streaming.CdcStream.ingestTopics(
      spark, busDir, "cdc.commerce.*", schemas, sinkDir, ckpt)
    (0 to 2).foreach { w => wave(w); q1.processAllAvailable() }
    q1.stop()
    // restart from the same checkpoint mid-soak
    val q2 = streaming.CdcStream.ingestTopics(
      spark, busDir, "cdc.commerce.*", schemas, sinkDir, ckpt)
    (3 to lastWave).foreach { w => wave(w); q2.processAllAvailable() }
    q2.processAllAvailable(); q2.stop()

    // exactly-once: changelog row counts equal lines written, and the
    // latest-wins snapshot reflects only the final wave
    val acctLog = spark.read.parquet(s"$sinkDir/account")
    val prodLog = spark.read.parquet(s"$sinkDir/product")
    assert(acctLog.count() + prodLog.count() == written,
      s"lost/duplicated: ${acctLog.count() + prodLog.count()} vs $written")
    val snap = graft.cdc.Cdc.materializeAll(
      Map("account" -> acctLog, "product" -> prodLog),
      Map("account" -> graft.cdc.Cdc.TableRoute(Seq("id"), "ts_ms"),
          "product" -> graft.cdc.Cdc.TableRoute(Seq("sku"), "ts_ms")))
    val acct = snap("account").collect()
    assert(acct.length == nIds)
    acct.foreach { r =>
      assert(r.getAs[Double]("balance") == lastWave * 100.0 + r.getAs[Long]("id"))
    }
    assert(snap("product").collect().forall(_.getAs[Double]("price") == lastWave + 0.5))
  }
}
