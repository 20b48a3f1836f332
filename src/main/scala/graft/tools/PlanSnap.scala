package graft.tools

import java.nio.file.{Files, Paths}

/** Round-14 optimization evidence: dump `explain("formatted")` for the
  * named queries to plans/r14/<query>_<tag>.txt so before/after plan
  * claims in OPTIMIZATION_r13.md are mechanically checkable.
  *
  * Operators ending in Release.grid / Release.checkpointed rebase their
  * result onto an ExistingRDD, which hides the computation plan from a
  * post-hoc explain — so this tool also installs the Release.planCapture
  * hook and appends every pre-release plan the query produced.
  *
  * Usage: sbt 'runMain graft.tools.PlanSnap <before|after> q1 q2 ...'
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanSnap <tag> <query> [query ...]")
    val tag = args.head
    val names = args.tail.toSeq
    val spark = graft.GraftSession.get(4)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    Files.createDirectories(Paths.get("plans/r14"))
    names.foreach { name =>
      val captured = scala.collection.mutable.ArrayBuffer.empty[String]
      graft.operators.Release.planCapture = Some(df =>
        captured += df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      val df = graft.SparkEntry.queries(name)(spark, dir)
      graft.operators.Release.planCapture = None
      val finalPlan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val body =
        if (captured.isEmpty) finalPlan
        else captured.zipWithIndex.map { case (p, i) =>
          s"-- pre-release computation plan ${i + 1}/${captured.size} " +
            "(Release rebases the returned frame; this is the real query) --\n" + p
        }.mkString("\n") + "\n-- returned frame (post-release rebase) --\n" + finalPlan
      Files.write(Paths.get(s"plans/r14/${name}_$tag.txt"),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plansnap] wrote plans/r14/${name}_$tag.txt")
    }
    spark.stop()
  }
}
