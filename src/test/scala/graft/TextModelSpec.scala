package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextAnalysis, TextModel}

class TextModelSpec extends SparkSpec {
  import spark.implicits._

  test("ngram_lm_score: a repetitive doc is far more predictable than a varied one") {
    val dir = java.nio.file.Files.createTempDirectory("lm").toString
    Seq(
      (0L, ("ab cd " * 40).trim),                      // one bigram, maximally predictable
      (1L, (1 to 80).map(i => s"w$i").mkString(" "))   // every bigram unique
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val r = TextModel.ngramLmScore(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(3))).toMap
    assert(r(0L)._1 == 79 && r(1L)._1 == 79, "n_bigrams = n_tokens - 1")
    assert(r(0L)._2 < r(1L)._2 - 2.0,
      s"repeated doc should score way fewer bits/token: ${r(0L)._2} vs ${r(1L)._2}")
  }

  test("bm25_multi q_spark agrees with single-query bm25_search rank for rank") {
    val single = TextAnalysis.bm25Search(spark, sf, topK = 10).collect()
      .map(r => (r.getInt(1), r.getLong(0), r.getDouble(2)))
    val multi = TextModel.bm25Multi(spark, sf).collect()
      .filter(_.getString(0) == "q_spark")
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(multi.length == 10)
    assert(single.sameElements(multi),
      s"batched scoring must reproduce the single-query ranking:\n${single.toSeq}\n${multi.toSeq}")
  }

  test("bm25_multi ranks every query and never crosses query boundaries") {
    val rows = TextModel.bm25Multi(spark, sf).collect()
    val byQ = rows.groupBy(_.getString(0))
    assert(byQ.keySet == TextModel.multiQueries.map(_._1).toSet)
    for ((q, rs) <- byQ) {
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length), s"$q ranks contiguous")
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"$q scores descend")
    }
  }
}
