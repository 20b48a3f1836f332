package graft.tools

import java.nio.file.{Files, Paths}

/** Round-13 optimization evidence: dump `explain("formatted")` for the
  * named queries to plans/r13/<query>_<tag>.txt so before/after plan
  * claims in OPTIMIZATION_r13.md are mechanically checkable.
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
    Files.createDirectories(Paths.get("plans/r13"))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(s"plans/r13/${name}_$tag.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plansnap] wrote plans/r13/${name}_$tag.txt")
    }
    spark.stop()
  }
}
