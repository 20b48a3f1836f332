package graft.tools

import graft.operators.Similarity

/** Dev-only profiling scratchpad (not part of the public surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get(32)
    val dir = sys.env.getOrElse("SCRATCH_SF", "/root/testdata/sf0.1")
    val df = Similarity.annBruteforce(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[scratch] full: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    df.explain("formatted")
    spark.stop()
  }
}
