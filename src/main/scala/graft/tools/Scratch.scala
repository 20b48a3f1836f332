package graft.tools

import org.apache.spark.sql.functions._

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

    def pairsJoin() = {
      val li = graft.sources.Tables.lineitem(spark, dir)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
      li.as("a").join(li.as("b"), $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
        .groupBy($"a.pk".as("pa"), $"b.pk".as("pb"))
        .agg(count(lit(1)).as("n_orders"))
    }

    def pairsExplode() = {
      val sets = graft.sources.Tables.lineitem(spark, dir)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
        .groupBy($"ok").agg(sort_array(collect_set($"pk")).as("arr"))
      sets.select(posexplode($"arr").as(Seq("i", "pa")), $"arr")
        .select($"pa", explode(expr("slice(arr, i + 2, size(arr))")).as("pb"))
        .groupBy($"pa", $"pb")
        .agg(count(lit(1)).as("n_orders"))
    }

    // warm the page cache once
    t("warmup")(graft.sources.Tables.lineitem(spark, dir).count())

    for (round <- 1 to 3) {
      t(s"join-r$round")(println("join   count=" + pairsJoin().count()))
      t(s"explode-r$round")(println("explode count=" + pairsExplode().count()))
    }

    // equivalence check: identical (pa, pb, n_orders) sets
    val a = pairsJoin(); val b = pairsExplode()
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"[scratch] diff rows = $diff")

    pairsExplode().explain("formatted")
    spark.stop()
  }
}
