package graft

import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.functions._

/** Semantic checks for the curation family (decontaminate, doc_chunks,
  * quality_buckets, dedup_editdistance) beyond the DuckDB hash gate:
  * coverage/overlap invariants the SQL compare can't express.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("doc_chunks covers every token exactly: stride overlap, last chunk short") {
    val chunks = Curation.docChunks(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id",
        size(filter(split($"text", "\\s+"), t => t =!= "")).as("n"))
    // every chunk stays in bounds and only the last chunk of a doc may be short
    val agg = chunks.groupBy($"doc_id").agg(
      max($"start_tok" + $"chunk_tokens" - 1).as("last_tok"),
      count(lit(1)).as("n_chunks"),
      sum(when($"chunk_tokens" < 32, 1).otherwise(0)).as("n_short"))
    val joined = agg.join(docs, "doc_id")
    assert(joined.filter($"last_tok" =!= $"n").count() === 0,
      "chunk coverage must end exactly at the doc's last token")
    assert(joined.filter($"n_short" > 1).count() === 0,
      "at most one short chunk per doc")
    // stride 24 < width 32 ⇒ consecutive chunks overlap by 8 tokens
    val overlaps = chunks.withColumn("next_start",
        lead($"start_tok", 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"chunk_id")))
      .filter($"next_start".isNotNull)
    assert(overlaps.filter($"next_start" - $"start_tok" =!= 24).count() === 0)
    chunks.unpersist()
  }

  test("doc_pack: every doc packed once, offsets bounded, sequences contiguous per shard") {
    val packed = Curation.docPack(spark, sf).cache()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(packed.count() === nDocs, "one packing decision per doc")
    assert(packed.filter($"seq_offset" < 0 || $"seq_offset" >= 512).count() === 0,
      "offset must lie inside the sequence budget")
    // straddles ⟺ the doc crosses its sequence's 512-token boundary
    assert(packed.filter(
      ($"seq_offset" + $"n_tokens" > 512) =!= $"straddles").count() === 0)
    // within a shard, the first doc opens sequence 0 and seq_no is
    // non-decreasing in doc_id order (an oversized doc may legitimately
    // skip numbers — its tail spills past whole sequences)
    val perShard = packed.groupBy($"shard").agg(min($"seq_no").as("first_seq"))
    assert(perShard.filter($"first_seq" =!= 0).count() === 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"shard").orderBy($"doc_id")
    assert(packed.withColumn("prev_seq", lag($"seq_no", 1).over(w))
      .filter($"prev_seq".isNotNull && $"seq_no" < $"prev_seq").count() === 0,
      "seq_no must be non-decreasing within a shard")
    packed.unpersist()
  }

  test("decontaminate: hits are real — every flagged doc shares a 3-gram with the bench set") {
    val flagged = Curation.decontaminate(spark, sf)
    assert(flagged.count() > 0, "gate must be non-vacuous")
    // no benchmark doc may flag itself
    assert(flagged.filter($"doc_id" % 97 === 0).count() === 0)
    assert(flagged.filter($"hit_ratio" > 1.0 || $"n_hits" > $"n_grams").count() === 0)
  }

  test("quality_buckets: deciles partition the corpus with monotone score ranges") {
    val b = Curation.qualityBuckets(spark, sf).collect().sortBy(_.getAs[Int]("bucket"))
    assert(b.length === 10)
    val total = b.map(_.getAs[Long]("n_docs")).sum
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(total === nDocs, "buckets must partition all docs")
    // decile sizes differ by at most 1; score ranges are non-overlapping
    val sizes = b.map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1)
    b.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Double]("max_score") <= hi.getAs[Double]("min_score"),
        "bucket score ranges must be ordered")
    }
  }

  test("quality_buckets_approx tracks the exact deciles within sketch tolerance") {
    val approx = graft.operators.Curation.qualityBucketsApprox(spark, sf).collect()
    val exact = graft.operators.Curation.qualityBuckets(spark, sf).collect()
    assert(approx.map(_.getInt(0)).toSeq == (1 to 10), "all ten buckets populated")
    val total = exact.map(_.getLong(1)).sum
    val exactByBucket = exact.map(r => r.getInt(0) -> r.getLong(1)).toMap
    approx.foreach { r =>
      val (b, n) = (r.getInt(0), r.getLong(1))
      // sketch relative error 0.001 on thresholds; score ties move whole
      // clumps across a boundary, so allow a quarter-decile deviation
      assert(math.abs(n - exactByBucket(b)) <= total / 40 + 1,
        s"bucket $b: approx $n vs exact ${exactByBucket(b)}")
    }
    // monotone, non-overlapping score ranges (up to boundary ties)
    approx.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getDouble(3) <= hi.getDouble(2) + 1e-9,
        s"bucket ${lo.getInt(0)} max must not exceed bucket ${hi.getInt(0)} min")
    case _ => ()
    }
  }

  test("dedup_editdistance finds a planted typo pair and rejects a distant one") {
    val docs = graft.sources.Tables.documents(spark, sf).select($"doc_id", $"text")
    val base = docs.filter($"doc_id" === 0).select($"text").head().getString(0)
    // plant: same prefix, one word changed mid-text (distance ≈ word length)
    val words = base.split("\\s+")
    val typo = (words.take(words.length / 2) ++ Array("zzzz") ++
      words.drop(words.length / 2 + 1)).mkString(" ")
    val planted = docs.unionByName(Seq((9000001L, typo)).toDF("doc_id", "text"))
    val out = Dedup.dedupEditDistanceOn(spark, planted)
    assert(out.filter($"i" === 0 && $"j" === 9000001L).count() === 1,
      "typo-distance pair must be found via prefix block")
  }
}
