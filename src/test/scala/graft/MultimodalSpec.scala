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

  test("decoded features reflect payload bytes") {
    val media = Multimodal.withMedia(sources.Tables.documents(spark, sf))
    val feats = Multimodal.decodeStub(spark, media)
    assert(feats.filter($"n_bytes" <= 0 || $"feature_mean" <= 0.0).count() == 0)
    assert(feats.count() == media.count())
  }
}
