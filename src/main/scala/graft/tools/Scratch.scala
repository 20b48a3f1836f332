package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only profiling scratchpad (not part of the public surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get(32)
    import spark.implicits._
    val dir = sys.env.getOrElse("SCRATCH_SF", "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = t("incidence") {
      val d = graft.sources.Tables.lineitem(spark, dir)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      d.count(); d
    }
    val pairs = t("pairs") {
      val p = li.as("a").join(li.as("b"), $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
        .select($"a.pk".as("src"), $"b.pk".as("dst")).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      println("pairs=" + p.count()); p
    }
    val edges = t("edges") {
      val e = pairs.unionByName(pairs.select($"dst".as("src"), $"src".as("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      println("edges=" + e.count()); e
    }
    val deg = t("deg") {
      val d = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
        .withColumnRenamed("src", "node").persist(StorageLevel.MEMORY_AND_DISK)
      println("nodes=" + d.count()); d
    }
    val n = deg.count()
    var ranks = deg.select($"node", $"deg", lit(1000000000L / n).as("pr"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    for (i <- 1 to 5) {
      t(s"iter$i") {
        val contrib = edges
          .join(broadcast(ranks.withColumnRenamed("node", "src")), "src")
          .select($"dst", expr("pr DIV deg").as("c"))
        val next = contrib.groupBy($"dst").agg(sum($"c").as("s"))
          .select($"dst".as("node"),
            (lit(150000000L / n) + expr("(17 * s) DIV 20")).as("pr"))
          .join(broadcast(deg), "node")
          .select($"node", $"deg", $"pr")
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        ranks.unpersist()
        ranks = next
      }
    }
    spark.stop()
  }
}
