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
}
