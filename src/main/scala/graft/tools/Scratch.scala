package graft.tools

import graft.operators.Dedup

/** Dev-only profiling scratchpad (not part of the public surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get(8)
    val dir = sys.env.getOrElse("SCRATCH_SF", "/root/testdata/sf0.001")
    val df = Dedup.dedupMinhash(spark, dir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    println("[scratch] rows=" + df.count())
    println(f"[scratch] full: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
