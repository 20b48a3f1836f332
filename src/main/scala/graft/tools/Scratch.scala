package graft.tools

import graft.operators._

/** Dev-only profiling scratchpad (not part of the public surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get(8)
    val dir = sys.env.getOrElse("SCRATCH_SF", "/root/testdata/sf0.001")
    def shuffles(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      val n = "Exchange".r.findAllIn(plan).length -
        "ReusedExchange".r.findAllIn(plan).length
      val reused = "ReusedExchange".r.findAllIn(plan).length
      val wgl = "WindowGroupLimit".r.findAllIn(plan).length
      println(s"[scratch] $name: exchanges=$n reused=$reused wgl=$wgl")
    }
    shuffles(TextModel.ngramLmScore(spark, dir), "ngram_lm_score")
    shuffles(TextModel.topNgrams(spark, dir), "top_ngrams")
    shuffles(TextModel.bm25Multi(spark, dir), "bm25_multi")
    shuffles(Sampling.sampleStratified(spark, dir), "sample_stratified")
    shuffles(TimeSeries.slidingWindowAgg(spark, dir), "sliding_window_agg")
    shuffles(TimeSeries.ewmaSmooth(spark, dir), "ewma_smooth")
    shuffles(Profile.anomalyZscore(spark, dir), "anomaly_zscore")
    shuffles(Embeddings.embeddingCentroids(spark, dir), "embedding_centroids")
    spark.stop()
  }
}
