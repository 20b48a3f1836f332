package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextAnalysis}

class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("text_repetition flags a degenerate repeated doc far above a varied one") {
    val dir = java.nio.file.Files.createTempDirectory("rep").toString
    Seq(
      (0L, ("spam ham " * 30).trim),                       // one bigram repeated
      (1L, (1 to 60).map(i => s"w$i").mkString(" "))       // all tokens distinct
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.textRepetition(spark, dir)
      .collect().map(x => x.getLong(0) -> (x.getDouble(2), x.getDouble(3))).toMap
    assert(r(0L)._1 > 0.4, "repeated doc's top bigram should dominate")
    assert(r(0L)._2 > 0.9, "repeated doc's trigrams are nearly all dups")
    assert(r(1L)._1 < 0.05 && r(1L)._2 == 0.0, "varied doc has no repetition")
  }

  test("text_pii_scrub removes every planted email/phone and counts them") {
    val out = TextAnalysis.textPiiScrub(spark, sf)
    assert(out.filter($"scrubbed".rlike("[a-z0-9]+@[a-z0-9]+\\.[a-z]+")).count() == 0)
    assert(out.filter($"scrubbed".rlike("555-[0-9]{4}")).count() == 0)
    val planted = out.filter($"doc_id" % 7 === 0)
    assert(planted.filter($"n_emails" >= 1 && $"n_phones" >= 1).count() == planted.count())
    assert(out.filter($"doc_id" % 7 =!= 0)
      .filter($"n_emails" > 0 || $"n_phones" > 0).count() == 0)
  }

  test("global_shuffle: ord is an exact permutation matching the flat hash order") {
    import org.apache.spark.sql.expressions.Window
    val out = Sampling.globalShuffle(spark, sf).cache()
    val n = out.count()
    // exact permutation 1..N
    assert(out.agg(min($"ord"), max($"ord"), countDistinct($"ord")).head.toSeq
      === Seq(1L, n, n))
    // the two-level (bucket, rank) construction equals one flat global
    // rank over the md5 order — provable here because sf0.001 is small
    val flat = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id",
        md5(concat(lit("gs:"), $"doc_id".cast("string"))).as("h"))
      .withColumn("ord2", row_number().over(Window.orderBy($"h", $"doc_id")).cast("long"))
    assert(out.join(flat, "doc_id").filter($"ord" =!= $"ord2").count() === 0,
      "bucketed two-level rank must equal the flat global hash order")
    assert(out.collect().toSeq === Sampling.globalShuffle(spark, sf).collect().toSeq)
    out.unpersist()
  }

  test("sample_split is deterministic and within 3pp of 80/10/10") {
    val a = Sampling.sampleSplit(spark, sf).collect()
    val b = Sampling.sampleSplit(spark, sf).collect()
    assert(a.sameElements(b), "split assignment must be run-stable")
    val n = a.length.toDouble
    val frac = a.groupBy(_.getString(2)).view.mapValues(_.length / n).toMap
    assert(math.abs(frac("train") - 0.797) < 0.03, s"train=${frac("train")}")
    assert(math.abs(frac("val") - 0.102) < 0.03, s"val=${frac("val")}")
    assert(math.abs(frac("test") - 0.102) < 0.03, s"test=${frac("test")}")
  }

  test("sample_stratified keeps each event_type at its own target rate") {
    val totals = graft.sources.Tables.events(spark, sf)
      .groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sampling.sampleStratified(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = Map("purchase" -> 1.0, "signup" -> 0.5, "click" -> 0.25,
      "view" -> 0.125, "error" -> 0.0625)
    for ((t, want) <- target) {
      val got = kept.getOrElse(t, 0L).toDouble / totals(t)
      // md5 bucketing is binomial around the target; 4pp covers sf0.01 noise
      assert(math.abs(got - want) < 0.04, s"$t kept=$got want=$want")
    }
    assert(kept("purchase") == totals("purchase"), "purchase stratum is kept whole")
  }

  test("native char_entropy_stats is bit-identical to the composable form") {
    import graft.operators.TextAnalysis
    val native = TextAnalysis.charEntropy(spark, sf)
    val composed = TextAnalysis.charEntropyComposed(spark, sf)
    assert(native.exceptAll(composed).count() == 0 &&
      composed.exceptAll(native).count() == 0,
      "one-pass native entropy must equal the explode+decimal-sum pipeline bit-for-bit")
    // and it must be a pure map: only the output sort shuffles
    val plan = native.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), "native path must not explode chars")
  }

  test("pipeline_clean drops exactly the docs that violate each filter") {
    val dir = java.nio.file.Files.createTempDirectory("clean").toString
    val good = (1 to 30).map(i => s"w$i the x$i").mkString(" ") // 90 toks, stopwordy, all bigrams distinct
    Seq(
      (0L, good),                                  // keeps
      (1L, good),                                  // exact dup of 0 -> dropped (not canonical)
      (2L, "too short"),                           // n_tokens < 20
      (3L, (1 to 50).map(i => s"x$i").mkString(" ")), // no stopwords
      (4L, ("spam ham " * 40).trim)                // repetitive
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.pipelineClean(spark, dir)
      .collect().map(x => x.getLong(0) -> x.getBoolean(5)).toMap
    assert(r == Map(0L -> true, 1L -> false, 2L -> false, 3L -> false, 4L -> false))
  }

  test("corpus_stats totals agree with direct aggregation") {
    val row = Sampling.corpusStats(spark, sf).collect()(0)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(row.getLong(0) == docs.count())
    val chars = docs.select(sum(length($"text").cast("long"))).first().getLong(0)
    assert(row.getLong(2) == chars)
    assert(row.getLong(4) <= row.getLong(0))
  }
}
