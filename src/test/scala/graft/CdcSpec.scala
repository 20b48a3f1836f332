package graft

import org.apache.spark.sql.functions._
import graft.cdc.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def changelogDf(rows: Seq[(Long, String, Double, Long)]) =
    rows.toDF("key", "op", "value", "offset")

  test("materialize: latest-wins upsert with delete") {
    val log = changelogDf(Seq(
      (1L, "c", 10.0, 0L), (1L, "u", 20.0, 1L),          // update wins
      (2L, "c", 5.0, 2L), (2L, "d", 0.0, 3L),            // deleted
      (3L, "c", 7.0, 4L), (3L, "d", 0.0, 5L), (3L, "c", 9.0, 6L))) // re-created
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"key").orderBy($"offset".desc)
    val mat = log.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"op" =!= "d")
      .select($"key", $"value")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(mat == Map(1L -> 20.0, 3L -> 9.0))
  }

  test("cdc_materialize excludes users whose last op is delete") {
    val mat = Cdc.cdcMaterialize(spark, sf)
    val tomb = Cdc.cdcTombstones(spark, sf)
    val matIds = mat.select("user_id").as[Long].collect().toSet
    val tombIds = tomb.select("user_id").as[Long].collect().toSet
    assert(matIds.intersect(tombIds).isEmpty)
    val all = Cdc.changelog(spark, sf).select("key").distinct().count()
    assert(matIds.size + tombIds.size == all)
  }

  test("cdc_parse round-trips the envelope losslessly") {
    val parsed = Cdc.cdcParse(spark, sf)
    val src = Cdc.changelog(spark, sf)
    assert(parsed.count() == src.count())
    val j = parsed.select($"offset", $"value".as("pv"), $"op".as("pop"))
      .join(src, "offset")
      .filter($"pv" =!= $"value" || $"pop" =!= $"op")
    assert(j.count() == 0)
  }

  test("history versions chain: valid_to links to a later offset, one current per live key") {
    val h = Cdc.cdcHistory(spark, sf)
    assert(h.filter($"valid_to" =!= -1 && $"valid_to" <= $"valid_from").count() == 0)
    val multiCurrent = h.filter($"is_current" === 1)
      .groupBy($"user_id").count().filter($"count" > 1)
    assert(multiCurrent.count() == 0)
  }

  test("schema evolution: union by name null-fills missing columns") {
    val v1 = Seq((1L, "c", 1.0)).toDF("key", "op", "value")
    val v2 = Seq((2L, "u", 2.0, "extra")).toDF("key", "op", "value", "origin")
    val merged = Cdc.evolve(v1, v2)
    assert(merged.columns.toSet == Set("key", "op", "value", "origin"))
    assert(merged.filter($"origin".isNull).count() == 1)
    assert(merged.count() == 2)
  }

  test("incremental agg equals a full recompute over the final state") {
    val inc = Cdc.cdcIncrementalAgg(spark, sf).collect()
    val direct = Cdc.cdcMaterialize(spark, sf)
      .join(sources.Tables.events(spark, sf)
        .select($"event_id".as("last_offset"), $"event_type"), "last_offset")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_users"),
        round(sum($"current_value".cast("decimal(18,4)")), 4).cast("double")
          .as("total_value"))
      .orderBy($"event_type").collect()
    assert(inc.length == direct.length)
    inc.zip(direct).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getLong(1) == b.getLong(1), s"count differs for ${a.getString(0)}")
      assert(a.getDouble(2) == b.getDouble(2), s"sum differs for ${a.getString(0)}")
    }
  }

  test("cdc_merge_upsert equals a full replay at ANY batch cut") {
    val full = Cdc.cdcMaterialize(spark, sf)
      .select($"user_id", $"current_value", $"last_op", $"last_offset")
    Seq(2, 3, 7).foreach { cutDiv =>
      val merged = Cdc.cdcMergeUpsert(spark, sf, cutDiv)
      assert(merged.exceptAll(full).count() == 0 && full.exceptAll(merged).count() == 0,
        s"merge at cut div $cutDiv must equal the full replay")
    }
  }

  test("routing: partitioned write creates one directory per target") {
    val out = java.nio.file.Files.createTempDirectory("graft_route").toString
    Cdc.changelog(spark, sf)
      .withColumn("target", concat(lit("commerce_"), $"event_type"))
      .write.mode("overwrite").partitionBy("target").parquet(out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("target=commerce_")) == 5)
    // read back one routed table
    val clicks = spark.read.parquet(out).filter($"target" === "commerce_click")
    assert(clicks.count() > 0)
  }
}
