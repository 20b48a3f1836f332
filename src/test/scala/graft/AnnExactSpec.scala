package graft

import graft.operators.{AnnExact, Similarity, Training}

/** The oracle-exact ANN family (AnnExact.scala): recall floors vs the
  * exact cosine scan, output-shape contracts, training determinism, and
  * a pure-Scala driver-side replay of the exact-integer subspace Lloyd
  * trainer (independent of the pq_encode_l kernel it pins).
  */
class AnnExactSpec extends SparkSpec {
  import spark.implicits._

  private def recallVsBf(got: Set[(Long, Long)]): Double = {
    val bf = Similarity.annBruteforce(spark, sf)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    bf.intersect(got).size.toDouble / bf.size
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select($"q_id", $"n_id").as[(Long, Long)].collect().toSet

  test("ann_ivf: 5 ranked rows per query, recall clearly beats the 3/8 scan fraction") {
    val ivf = AnnExact.annIvf(spark, sf)
    val perQ = ivf.groupBy($"q_id").count().collect()
    assert(perQ.length == 8 && perQ.forall(_.getLong(1) == 5))
    val r = recallVsBf(pairs(ivf))
    info(s"exact-IVF recall = $r")
    assert(r >= 0.45, s"recall $r too low")
  }

  test("ann_ivf_adaptive: probe width adapts and recall holds") {
    val ad = AnnExact.annIvfAdaptive(spark, sf)
    val perQ = ad.groupBy($"q_id").count().collect()
    assert(perQ.length == 8 && perQ.forall(_.getLong(1) == 5))
    val r = recallVsBf(pairs(ad))
    info(s"adaptive exact-IVF recall = $r")
    assert(r >= 0.5, s"recall $r too low")
  }

  test("ann_pq: shortlist re-rank finds most true neighbors from codes alone") {
    val pq = AnnExact.annPq(spark, sf)
    val perQ = pq.groupBy($"q_id").count().collect()
    assert(perQ.length == 8 && perQ.forall(_.getLong(1) == 5))
    // l2 distances must be nonnegative and nondecreasing in rank
    val byQ = pq.select($"q_id", $"rk", $"l2_dist")
      .as[(Long, Int, Double)].collect().groupBy(_._1)
    byQ.values.foreach { rows =>
      val ds = rows.sortBy(_._2).map(_._3)
      assert(ds.forall(_ >= 0.0))
      ds.sliding(2).foreach { case Array(a, b) => assert(b >= a); case _ => }
    }
    val r = recallVsBf(pairs(pq))
    info(s"exact-PQ recall = $r")
    assert(r >= 0.55, s"recall $r too low")
  }

  test("ann_ivf_pq: composed pruning+compression keeps usable recall") {
    val ip = AnnExact.annIvfPq(spark, sf)
    val perQ = ip.groupBy($"q_id").count().collect()
    assert(perQ.length == 8 && perQ.forall(_.getLong(1) == 5))
    val r = recallVsBf(pairs(ip))
    info(s"exact-IVF-PQ recall = $r")
    assert(r >= 0.4, s"recall $r too low")
  }

  test("exact subspace Lloyd trainer replays in pure Scala") {
    // independent replay: collect the quantized corpus and run the same
    // smallest-id-seed / integer-argmin / floorDiv-mean rounds without
    // Spark or the pq_encode_l kernel; books must agree exactly
    val corpus = Training.quantizedOf(
        sources.Tables.embeddings(spark, sf)).filter($"vec_id" >= 8)
    val books = AnnExact.pqLloydL(corpus, "vq", 32, 3)
    val vecs = corpus.orderBy($"vec_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val subs = 8; val subDim = 8
    var replay: Array[Array[Array[Long]]] = {
      val seeds = vecs.sortBy(_._1).take(32).map(_._2)
      Array.tabulate(subs)(s => seeds.map(_.slice(s * subDim, (s + 1) * subDim)))
    }
    for (_ <- 1 to 3) {
      // assignment: integer argmin, ties to the smallest code
      val asg = vecs.map { case (_, v) =>
        Array.tabulate(subs) { s =>
          var best = Long.MaxValue; var bi = 0
          for (c <- 0 until 32) {
            var d2 = 0L
            for (d <- 0 until subDim) {
              val diff = v(s * subDim + d) - replay(s)(c)(d)
              d2 += diff * diff
            }
            if (d2 < best) { best = d2; bi = c }
          }
          bi
        }
      }
      replay = Array.tabulate(subs)(s => Array.tabulate(32) { c =>
        val members = vecs.indices.filter(i => asg(i)(s) == c)
        if (members.isEmpty) replay(s)(c)
        else Array.tabulate(subDim) { d =>
          val tot = members.map(i => vecs(i)._2(s * subDim + d)).sum
          java.lang.Math.floorDiv(tot, members.size.toLong)
        }
      })
    }
    for (s <- 0 until subs; c <- 0 until 32)
      assert(books(s)(c).sameElements(replay(s)(c)), s"book ($s,$c) diverged")
  }

  test("exact ANN family is deterministic across runs") {
    val a = AnnExact.annIvf(spark, sf).collect().toSeq
    val b = AnnExact.annIvf(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("shuffle budgets for the exact ANN family") {
    // budgets pin the TEXTUAL post-collect count, which re-prints the
    // cached quantized-corpus subtree under every reference (index side
    // + probe side — the seq_patterns precedent); the executed shuffle
    // count measured on the pre-collect plan is 3/3/2/3
    for ((name, df, budget) <- Seq(
        ("ann_ivf", AnnExact.annIvf(spark, sf), 7),
        ("ann_ivf_adaptive", AnnExact.annIvfAdaptive(spark, sf), 7),
        ("ann_pq", AnnExact.annPq(spark, sf), 5),
        ("ann_ivf_pq", AnnExact.annIvfPq(spark, sf), 7))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val n = "ShuffleExchange|Exchange hashpartitioning|Exchange rangepartitioning".r
        .findAllIn(plan).length
      info(s"$name shuffles = $n (budget $budget)")
      assert(n <= budget, s"$name exceeded its shuffle budget: $n > $budget")
      spark.sharedState.cacheManager.clearCache()
    }
  }
}
