package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only phase profiler (not part of the engine surface). */
object ProfScratch {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime
    val r = f
    println(f"[prof] $label%-32s ${(System.nanoTime - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get(32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import spark.implicits._
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup all tables
    graft.sources.Tables.names.foreach(n => noop(graft.sources.Tables.load(spark, dir, n)))

    // ---- graph_ppr phases (current code)
    {
      import org.apache.spark.storage.StorageLevel
      val li = graft.sources.Tables.lineitem(spark, dir)
      val sets = li.select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
        .groupBy($"ok").agg(sort_array(collect_set($"pk")).as("arr"))
      val cp = sets.select(explode(graft.functions.HashFunctions.pair_pack($"arr")).as("pp"))
        .groupBy($"pp").agg(count(lit(1)).as("n_orders"))
        .select(shiftright($"pp", 32).as("pa"),
          $"pp".bitwiseAND(lit(0xFFFFFFFFL)).as("pb"), $"n_orders")
      val pairs = cp.select($"pa".as("src"), $"pb".as("dst")).persist(StorageLevel.MEMORY_AND_DISK)
      t("ppr: coPairCounts persist")(pairs.count())
      val edges = pairs.unionByName(pairs.select($"dst".as("src"), $"src".as("dst")))
      val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
        .withColumnRenamed("src", "node").persist(StorageLevel.MEMORY_AND_DISK)
      val adj = edges.join(deg.withColumnRenamed("node", "src"), "src")
        .withColumn("ck", pmod(hash($"dst"), greatest(lit(1), ceil($"deg" / 65536.0))).cast("int"))
        .groupBy($"src", $"ck")
        .agg(max($"deg").as("deg"), collect_list($"dst").as("dsts"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("ppr: adj build")(adj.count())
      val nSeeds = t("ppr: seed count")(deg.filter(pmod($"node", lit(97)) === 0).count())
      val seedStart = 1000000000L / nSeeds
      val teleport = 150000000L / nSeeds
      val isSeed = pmod($"node", lit(97)) === 0
      val tele = when(isSeed, lit(teleport)).otherwise(lit(0L))
      var ranks = deg.select($"node", when(isSeed, lit(seedStart)).otherwise(lit(0L)).as("pr"))
      for (_ <- 1 to 5) {
        val contrib = adj
          .join(ranks.filter($"pr" =!= 0L).withColumnRenamed("node", "src"), "src")
          .select($"dsts", expr("pr DIV deg").as("c"))
          .filter($"c" =!= 0L)
          .select(explode($"dsts").as("node"), $"c")
        val sums = contrib.groupBy($"node").agg(sum($"c").as("s"))
        ranks = deg.select($"node").join(sums, Seq("node"), "left")
          .select($"node", (tele + coalesce(expr("(17 * s) DIV 20"), lit(0L))).as("pr"))
      }
      t("ppr: 5 iters + topk")(
        ranks.join(deg, "node").orderBy($"pr".desc, $"node").limit(50).collect())
      pairs.unpersist(); deg.unpersist(); adj.unpersist()
    }

    // ---- embedding_communities phases
    val e = graft.sources.Tables.embeddings(spark, dir)
    val classes = e.groupBy($"embedding")
      .agg(min($"vec_id").as("rep"), count(lit(1)).as("mult"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("ec: classes persist")(classes.count())
    val reps = classes.select($"rep".as("vec_id"), $"embedding")
    val capped = graft.operators.Training.communityCandidateIndex(reps)
    t("ec: capped index")(noop(capped))
    val cand = capped.as("a")
      .join(capped.as("b"),
        $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("i"), $"b.doc_id".as("j")).distinct()
    t("ec: candidate pairs")(noop(cand))
    val vecs = reps.select($"vec_id", $"embedding",
      graft.operators.Dedup.norm($"embedding").as("nrm"))
    val edge0 = cand
      .join(vecs.select($"vec_id".as("i"), $"embedding".as("ea"), $"nrm".as("na")), "i")
      .join(vecs.select($"vec_id".as("j"), $"embedding".as("eb"), $"nrm".as("nb")), "j")
      .withColumn("cos", round(graft.operators.Dedup.cosinePre($"ea", $"eb", $"na", $"nb"), 6))
      .filter($"cos" >= 0.25)
      .select($"i", $"j", round($"cos" * 1000000d, 0).cast("long").as("w"))
    t("ec: cosine edges")(noop(edge0))
    val edges = edge0.select($"i".as("src"), $"j".as("dst"), $"w")
      .unionByName(edge0.select($"j".as("src"), $"i".as("dst"), $"w"))
      .repartition($"dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("ec: edges persist")(edges.count())
    val labels = graft.operators.Graph.lpaPropagate(edges, 3)
    t("ec: 3 LPA rounds + agg")(noop(labels))
    t("ec: full operator")(noop(graft.operators.Training.embeddingCommunities(spark, dir)))

    // ---- semdedup_paragraph phases
    val (paras, comp, planesDf) = graft.operators.Dedup.sppState(spark, dir)
    t("spp: paras persist")(paras.count())
    t("spp: comp persist")(comp.count())
    val buckets = comp.join(broadcast(planesDf), "dim")
      .groupBy($"pid", $"tbl", $"bit")
      .agg(sum($"cnt" * $"p").as("s"))
      .groupBy($"pid", $"tbl")
      .agg(sum(when($"s" >= 0, expr("shiftleft(cast(1 as bigint), bit)"))
        .otherwise(0L)).as("bucket"))
    t("spp: buckets")(noop(buckets))
    val capped2 = graft.operators.Dedup.pairableBands(
      buckets.select($"pid".as("doc_id"), $"tbl".as("band"), $"bucket"), cap = 64)
    val pairs = capped2.as("a")
      .join(capped2.as("b"),
        $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("i"), $"b.doc_id".as("j"))
      .distinct()
    t("spp: pairs")(noop(pairs))
    val dots = pairs
      .join(comp.select($"pid".as("i"), $"dim", $"cnt".as("ci")), "i")
      .join(comp.select($"pid".as("j"), $"dim", $"cnt".as("cj")), Seq("j", "dim"))
      .groupBy($"i", $"j").agg(sum($"ci" * $"cj").as("dot"))
    t("spp: exact dots")(noop(dots))
    paras.unpersist(); comp.unpersist()
    t("spp: full operator")(noop(graft.operators.Dedup.semdedupParagraph(spark, dir)))
    spark.stop()
  }
}
