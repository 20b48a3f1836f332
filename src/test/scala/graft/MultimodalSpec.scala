package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media synthesis: binary payload + typed metadata") {
    val media = Multimodal.withMedia(sources.Tables.documents(spark, sf))
    val r = media.select($"media_bytes", $"media_format", $"media_meta.width").first()
    assert(r.getAs[Array[Byte]](0).nonEmpty)
    assert(Set("png", "jpeg", "wav").contains(r.getString(1)))
    assert(r.getInt(2) >= 16)
  }

  test("batch decode: schema, determinism, per-format aggregate") {
    val out = Multimodal.multimodalMeta(spark, sf)
    val rows = out.collect()
    assert(rows.map(_.getString(0)).toSet == Set("jpeg", "png", "wav"))
    assert(rows.map(_.getLong(1)).sum == sources.Tables.documents(spark, sf).count())
    // deterministic across runs
    val again = Multimodal.multimodalMeta(spark, sf).collect()
    assert(rows.sameElements(again))
  }

  test("resize plan fits the target box and preserves aspect ratio") {
    val media = Multimodal.withMedia(sources.Tables.documents(spark, sf))
    val planned = Multimodal.resizePlan(media, 32, 32)
    val bad = planned.filter($"resize_w" > 32 || $"resize_h" > 32 ||
      $"resize_w" < 1 || $"resize_h" < 1)
    assert(bad.count() == 0)
    // aspect preserved within floor rounding
    val r = planned.select($"media_meta.width", $"media_meta.height",
      $"resize_w", $"resize_h").first()
    val srcRatio = r.getInt(0).toDouble / r.getInt(1)
    val dstRatio = r.getInt(2).toDouble / r.getInt(3)
    assert(math.abs(srcRatio - dstRatio) / srcRatio < 0.2)
  }

  test("frame sampling emits one row per sampled frame with timestamps") {
    val media = Multimodal.withMedia(sources.Tables.documents(spark, sf).limit(50))
    val frames = Multimodal.frameSample(media, fps = 25.0, stride = 5)
    assert(frames.count() >= 50)  // at least one frame per doc
    assert(frames.filter($"frame_idx" % 5 =!= 0).count() == 0)
    val row = frames.filter($"frame_idx" === 5).first()
    assert(row.getLong(3) == 200L)  // frame 5 at 25fps = 200ms
  }

  test("decoded features reflect payload bytes") {
    val media = Multimodal.withMedia(sources.Tables.documents(spark, sf))
    val feats = Multimodal.decodeStub(spark, media)
    assert(feats.filter($"n_bytes" <= 0 || $"feature_mean" <= 0.0).count() == 0)
    assert(feats.count() == media.count())
  }

  test("audio windows cover every payload byte with stride-128 overlap") {
    val wins = Multimodal.multimodalAudioWindows(spark, sf).cache()
    val payloads = Multimodal.withMedia(sources.Tables.documents(spark, sf))
      .filter($"media_format" === "wav")
      .select($"doc_id", length($"media_bytes").as("n"))
    // per doc: window 0 starts at byte 1; the last window reaches the
    // final byte; at most the last window is short
    val agg = wins.groupBy($"doc_id").agg(
      min($"win_start").as("first_start"),
      max($"win_start" + $"win_bytes" - 1).as("last_byte"),
      sum(when($"win_bytes" < 256, 1).otherwise(0)).as("n_short"))
    val j = agg.join(payloads, "doc_id")
    assert(j.filter($"first_start" =!= 1).count() == 0)
    assert(j.filter($"last_byte" =!= $"n").count() == 0,
      "window coverage must end exactly at the payload's last byte")
    assert(j.filter($"n_short" > 1).count() == 0, "at most one short window per doc")
    // consecutive windows advance by exactly the stride
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"win_idx")
    assert(wins.withColumn("next_start", lead($"win_start", 1).over(w))
      .filter($"next_start".isNotNull && $"next_start" - $"win_start" =!= 128)
      .count() == 0)
    // energy is genuine byte mass: positive and bounded by 255/byte
    assert(wins.filter($"energy" <= 0 || $"energy" > $"win_bytes" * 255L ||
      $"peak" > 255).count() == 0)
    wins.unpersist()
  }

  test("ahash dedup: planted re-encode at distance 0, planted edit within 3") {
    val pairs = Multimodal.multimodalAhashDedup(spark, sf).collect()
    // the rotated-format re-encode of the smallest doc decodes to
    // identical content — distance exactly 0, formats differ
    val reenc = pairs.find(_.getAs[Long]("j") >= 1000000000L)
    assert(reenc.isDefined, "planted re-encode pair must be detected")
    assert(reenc.get.getAs[Int]("hamming") === 0)
    assert(reenc.get.getAs[String]("format_i") !== reenc.get.getAs[String]("format_j"))
    // the one-byte edit is near but NOT byte-identical: 0 < d <= 3,
    // which exercises the banded-hamming (not just exact-equality) path
    val edited = pairs.find(_.getAs[Long]("j") >= 2000000000L)
    assert(edited.isDefined, "planted edited pair must be detected")
    assert(edited.get.getAs[Int]("hamming") <= 3)
    pairs.foreach(p => assert(p.getAs[Int]("hamming") <= 3
      && p.getAs[Long]("i") < p.getAs[Long]("j")))
  }
}
