package graft

import org.apache.spark.sql.functions._

/** Driver-side exact replays for the round-9 additions. Each test
  * recomputes the operator's answer brute-force from the raw parquet
  * (collect at sf0.001) and compares against the distributed result.
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def toks(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  private def r6(x: Double): Double = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ngram_entropy: brute-force unigram + conditional entropy replay") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), toks(r.getString(1))))
    val out = graft.operators.TextModel.ngramEntropy(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val sources = docs.map(_._1).distinct.sorted
    assert(out.keySet === sources.toSet)
    for (src <- sources) {
      val ts = docs.filter(_._1 == src).map(_._2)
      val uni = ts.flatten.groupBy(identity).map { case (_, g) => g.length.toLong }
      val nTok = uni.sum
      // unigram H via the nano/micro idiom
      val s1 = uni.map { n =>
        val pn = (BigInt(n) * BigInt(1000000000L) / nTok).toLong
        if (pn > 0)
          Math.floorDiv(pn * math.round(-math.log(pn.toDouble / 1e9) * 1e6), 1000000L)
        else 0L
      }.sum
      // bigram conditional H from exact counts
      val bg = ts.filter(_.length >= 2)
        .flatMap(t => t.sliding(2).map(p => (p(0), p(1))))
      val bgc = bg.groupBy(identity).map { case (k, g) => (k, g.length.toLong) }
      val cu = bgc.groupBy(_._1._1).map { case (u, g) => (u, g.values.sum) }
      val cTot = bgc.values.sum
      val s2 = bgc.map { case ((u, _), c) =>
        c * math.round(-math.log(c.toDouble / cu(u).toDouble) * 1e6)
      }.sum
      val row = out(src)
      assert(row.getAs[Long]("n_tokens") === nTok)
      assert(row.getAs[Long]("vocab") === uni.size.toLong)
      assert(row.getAs[Long]("n_bigrams") === cTot)
      assert(row.getAs[Double]("h_unigram") === r6(s1.toDouble / 1e9))
      assert(row.getAs[Double]("h_bigram_cond") === r6(s2.toDouble / cTot / 1e6))
      // information-theory sanity: conditioning cannot raise entropy
      assert(row.getAs[Double]("h_bigram_cond") <=
        row.getAs[Double]("h_unigram") + 1e-6)
    }
  }

  test("text_compressibility: brute-force 4-gram distinct-ratio replay") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), toks(r.getString(1))))
      .filter(_._2.length >= 4)
    val out = graft.operators.TextAnalysis.textCompressibility(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((src, group) <- docs.groupBy(_._1)) {
      val per = group.map { case (_, t) =>
        val grams = t.sliding(4).map(_.mkString(" ")).toArray
        (grams.length.toLong, grams.distinct.length.toLong)
      }
      val row = out(src)
      assert(row.getAs[Long]("n_docs") === per.length.toLong)
      assert(row.getAs[Long]("grams_total") === per.map(_._1).sum)
      assert(row.getAs[Long]("grams_distinct") === per.map(_._2).sum)
      assert(row.getAs[Long]("repetitive_docs") ===
        per.count { case (g, d) => d * 2 < g }.toLong)
      assert(row.getAs[Double]("compress_proxy") ===
        r6(per.map(_._2).sum.toDouble / per.map(_._1).sum))
    }
  }

  test("lexicon_screen: brute-force blocklist hit replay") {
    val lex = Set("slow", "dup", "merge")
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), toks(r.getString(1))))
    val out = graft.operators.TextAnalysis.lexiconScreen(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((src, group) <- docs.groupBy(_._1)) {
      val hits = group.map(_._2.count(lex.contains).toLong)
      val row = out(src)
      assert(row.getAs[Long]("n_docs") === group.length.toLong)
      assert(row.getAs[Long]("tokens_total") === group.map(_._2.length.toLong).sum)
      assert(row.getAs[Long]("hit_tokens") === hits.sum)
      assert(row.getAs[Long]("docs_flagged") === hits.count(_ > 0).toLong)
      assert(row.getAs[Long]("max_doc_hits") === hits.max)
    }
  }

  test("winnowing_fingerprint: brute-force winnow replay and guarantee") {
    val k = 8; val w = 4; val cap = 20; val minShared = 5
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.length >= k + w - 1)
    def hash32(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val fpSets = docs.map { case (id, text) =>
      val hs = (0 to text.length - k).map(i => hash32(text.substring(i, i + k)))
      id -> hs.sliding(w).map(_.min).toSet
    }.toMap
    val dfCount = fpSets.values.flatten.groupBy(identity)
      .map { case (fp, g) => (fp, g.size) }
    val kept = fpSets.map { case (id, s) =>
      id -> s.filter(fp => dfCount(fp) <= cap)
    }
    val ids = kept.keys.toSeq.sorted
    val expected = (for {
      ai <- ids.indices; bi <- ai + 1 until ids.length
      i = ids(ai); j = ids(bi)
      shared = (kept(i) & kept(j)).size
      if shared >= minShared
    } yield ((i, j), (shared.toLong,
      r6(shared.toDouble / math.min(kept(i).size, kept(j).size))))).toMap
    val got = graft.operators.Dedup.winnowingFingerprint(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(got === expected)
    assert(expected.nonEmpty, "fixture must exercise the pair report")
    // winnowing guarantee on a planted clone: identical text of length
    // >= k+w-1 shares every fingerprint, so sim = 1.0 for exact dups
    val exact = docs.groupBy(_._2).values.filter(_.length >= 2)
    for (g <- exact.take(3); pair <- g.map(_._1).sorted.combinations(2)) {
      val (a, b) = (pair(0), pair(1))
      if (kept(a).size >= minShared)
        assert(got.contains((a, b)),
          s"exact-duplicate pair ($a,$b) missing from the winnowing report")
    }
  }

  // ---- embedding-selection / causal / ANN additions ------------------

  private def quantVecs(): Map[Long, Array[Long]] =
    graft.sources.Tables.embeddings(spark, sf).collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray
        .map(x => math.round(x.toDouble * 1000000d))
    }.toMap

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("mmr_select: brute-force greedy MMR replay") {
    val vq = quantVecs()
    val qs = vq.filter(_._1 < 8).values.toArray
    val corpus = vq.filter(_._1 >= 8)
    val cent = Array.tabulate(64)(d =>
      Math.floorDiv(qs.map(_(d)).sum, qs.length.toLong))
    val dq = corpus.map { case (id, v) => id -> d2(v, cent) }
    var picks = Vector.empty[(Int, Long, Long, Long)]
    var chosen = Set.empty[Long]
    for (t <- 1 to 8) {
      val cand = corpus.filter(c => !chosen.contains(c._1))
      val best =
        if (t == 1) { val s = cand.minBy(c => (dq(c._1), c._1)); (s._1, dq(s._1), 0L) }
        else {
          val scored = cand.map { case (id, v) =>
            val md = picks.map(p => d2(v, corpus(p._2))).min
            (id, dq(id), md)
          }
          scored.maxBy { case (id, rel, md) => (md - rel, -id) }
        }
      picks = picks :+ ((t, best._1, best._2, best._3))
      chosen += best._1
    }
    val got = graft.operators.Training.mmrSelect(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toVector
    assert(got === picks)
    // selections are distinct and the seed is the most query-relevant
    assert(got.map(_._2).distinct.length === 8)
  }

  test("propensity_ipw: brute-force stratified IPW replay") {
    val custs = graft.sources.Tables.customer(spark, sf)
      .select($"c_custkey", $"c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val spend = graft.sources.Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg((sum(round($"o_totalprice", 4).cast("decimal(14,4)")) * 10000)
        .cast("long").as("y4")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val thrMap = Map("AUTOMOBILE" -> 20, "BUILDING" -> 32, "FURNITURE" -> 44,
      "HOUSEHOLD" -> 56, "MACHINERY" -> 68)
    def h100(k: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val units = custs.map { case (k, seg) =>
      (seg, if (h100(k) < thrMap.getOrElse(seg, 50)) 1 else 0,
        spend.getOrElse(k, 0L))
    }
    val cells = units.groupBy(_._1).map { case (_, g) =>
      val n = g.length.toLong
      val nt = g.count(_._2 == 1).toLong
      val syt = g.filter(_._2 == 1).map(_._3).sum
      val syc = g.filter(_._2 == 0).map(_._3).sum
      (n, nt, syt, syc)
    }.filter(c => c._2 > 0 && c._2 < c._1).toSeq
    val nAll = cells.map(_._1).sum
    val ntAll = cells.map(_._2).sum
    val st = cells.map(_._3).sum
    val sc = cells.map(_._4).sum
    val swt = cells.map(c => (BigInt(c._3) * c._1 * 1000000 / c._2)).sum
    val swc = cells.map(c => (BigInt(c._4) * c._1 * 1000000 / (c._1 - c._2))).sum
    val row = graft.operators.Behavior.propensityIpw(spark, sf).collect().head
    assert(row.getAs[Long]("n_units") === nAll)
    assert(row.getAs[Long]("n_treated") === ntAll)
    assert(row.getAs[Double]("naive_diff") ===
      r6(st.toDouble / 1e4 / ntAll - sc.toDouble / 1e4 / (nAll - ntAll)))
    assert(row.getAs[Double]("ipw_ate") ===
      r6((swt - swc).toDouble / nAll / 1e10))
  }

  test("rp_band_sweep: brute-force bucket replay and analytic threshold") {
    val vq = quantVecs()
    def sign(i: Int, j: Int): Long = {
      val k = BigInt(i.toLong * 16 + j + 17)
      if ((k * k * k) % 1000003 % 2 == 0) 1L else -1L
    }
    val sigs = vq.values.map { v =>
      (0 until 16).map { j =>
        val proj = (0 until 64).map(i => v(i) * sign(i, j)).sum
        if (proj >= 0) 1L << j else 0L
      }.reduce(_ | _)
    }.toSeq
    val out = graft.operators.Similarity.rpBandSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    for ((b, rr) <- Seq((16, 1), (8, 2), (4, 4), (2, 8))) {
      val buckets = sigs.flatMap(s => (0 until b).map(g =>
        (g, (s >> (g * rr)) & ((1L << rr) - 1))))
        .groupBy(identity).map(_._2.size.toLong)
      val row = out((b.toLong, rr.toLong))
      assert(row.getAs[Long]("n_buckets_paired") === buckets.count(_ >= 2).toLong)
      assert(row.getAs[Long]("max_bucket") === buckets.max)
      assert(row.getAs[Long]("candidate_pairs") ===
        buckets.map(n => n * (n - 1) / 2).sum)
      assert(row.getAs[Double]("est_angle_frac") === r6(
        1.0 - math.pow(1.0 - math.pow(0.5, 1.0 / b), 1.0 / rr)))
    }
  }

  test("ann_rptree: exact routing replay and recall vs brute force") {
    val vq = quantVecs()
    def sign(i: Int, j: Int): Long = {
      val k = BigInt(i.toLong * 16 + j + 17)
      if ((k * k * k) % 1000003 % 2 == 0) 1L else -1L
    }
    def bitsOf(v: Array[Long]): Array[Long] = (0 until 16).map { j =>
      val proj = (0 until 64).map(i => v(i) * sign(i, j)).sum
      if (proj >= 0) 1L else 0L
    }.toArray
    def route(sb: Array[Long]): (Long, Long, Long) = {
      val b0 = sb(0)
      val b1 = sb(1 + b0.toInt)
      val b2 = sb(3 + 2 * b0.toInt + b1.toInt)
      (b0, b1, b2)
    }
    val corpusLeaf = vq.filter(_._1 >= 8).map { case (id, v) =>
      val (b0, b1, b2) = route(bitsOf(v)); id -> (b0 * 4 + b1 * 2 + b2)
    }
    val expected = vq.filter(_._1 < 8).toSeq.sortBy(_._1).flatMap { case (qid, qv) =>
      val sb = bitsOf(qv)
      val (b0, b1, b2) = route(sb)
      val probes = Set(
        b0 * 4 + b1 * 2 + b2,
        b0 * 4 + b1 * 2 + (1 - b2),
        b0 * 4 + (1 - b1) * 2 + sb(3 + 2 * b0.toInt + (1 - b1).toInt),
        (1 - b0) * 4 + sb(1 + (1 - b0).toInt) * 2
          + sb(3 + 2 * (1 - b0).toInt + sb(1 + (1 - b0).toInt).toInt))
      val cands = corpusLeaf.filter(c => probes.contains(c._2)).keys
      cands.map(n => (qid, n, d2(qv, vq(n)))).toSeq
        .sortBy { case (_, n, d) => (d, n) }.take(5).zipWithIndex
        .map { case ((q, n, d), i) => (q, i + 1, n,
          BigDecimal(d.toDouble / 1e12)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    }
    val got = graft.operators.Similarity.annRptree(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
    // recall@5 vs exact L2 truth — this corpus is near-isotropic, where
    // every sign-split tier is contrast-bound (the annRp caveat), so the
    // 4-probe spill's floor is modest; measured 0.375 at sf0.001
    val truth = vq.filter(_._1 < 8).flatMap { case (qid, qv) =>
      vq.filter(_._1 >= 8).toSeq.map { case (n, nv) => (qid, n, d2(qv, nv)) }
        .sortBy { case (_, n, d) => (d, n) }.take(5).map(t => (qid, t._2))
    }.toSet
    val hit = got.count(g => truth.contains((g._1, g._3)))
    info(s"ann_rptree recall@5 = ${hit.toDouble / truth.size}")
    assert(hit.toDouble / truth.size >= 0.3)
  }

  // ---- sharding / curation / training-prep additions ------------------

  private def md5h(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16)
  }

  test("coverage_curve: brute-force gram-first-percentile replay") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), toks(r.getString(1))))
      .filter(_._2.length >= 3)
    val gmin = docs.flatMap { case (id, t) =>
      val h = md5h(id.toString) % 100
      t.sliding(3).map(g => (g.mkString(" "), h))
    }.groupBy(_._1).map { case (_, g) => g.map(_._2).min }
    val total = gmin.size.toLong
    val out = graft.operators.Curation.coverageCurve(spark, sf).collect()
    assert(out.length === 7)
    for (r <- out) {
      val p = r.getLong(0)
      assert(r.getAs[Long]("grams_total") === total)
      assert(r.getAs[Long]("grams_covered") === gmin.count(_ < p).toLong)
    }
    // the curve is monotone and complete at 100%
    val cov = out.map(_.getAs[Double]("coverage"))
    cov.sliding(2).foreach { case Array(a, b) => assert(b >= a) }
    assert(cov.last === 1.0)
  }

  test("class_weights: exact replay and balanced-mass property") {
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .select($"label").collect().map(_.getInt(0))
    val byLabel = labels.groupBy(identity).map { case (l, g) => (l, g.length.toLong) }
    val n = labels.length.toLong
    val k = byLabel.size.toLong
    val out = graft.operators.Training.classWeights(spark, sf).collect()
    assert(out.length === k.toInt)
    for (r <- out) {
      val nc = byLabel(r.getInt(0))
      assert(r.getAs[Long]("n_vectors") === nc)
      val wMicro = (BigInt(n) * 1000000 / (k * nc)).toLong
      assert(r.getAs[Double]("weight") === r6(wMicro.toDouble / 1e6))
    }
    // balanced by construction: every class' weighted mass n_c·w_c ≈ N/k
    for (r <- out) {
      val mass = r.getAs[Long]("n_vectors") * r.getAs[Double]("weight")
      assert(math.abs(mass - n.toDouble / k) <= n.toDouble / k * 0.001)
    }
  }

  test("shard_mix_audit: exact per-shard JSD replay, near-zero for hash shards") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source").collect()
      .map(r => (md5h(r.getLong(0).toString) % 16, r.getString(1)))
    val cells = docs.groupBy(identity).map { case ((sh, src), g) =>
      ((sh, src), g.length.toLong) }
    val shardTot = cells.groupBy(_._1._1).map { case (sh, g) => (sh, g.values.sum) }
    val global = cells.groupBy(_._1._2).map { case (src, g) => (src, g.values.sum) }
    val nt = global.values.sum
    val out = graft.operators.Sharding.shardMixAudit(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    for ((sh, ns) <- shardTot) {
      var s = 0L
      for ((src, ng) <- global) {
        val q = (BigInt(ng) * 1000000000L / nt).toLong
        val p = (BigInt(cells.getOrElse((sh, src), 0L)) * 1000000000L / ns).toLong
        val la = if (p > 0) math.round(math.log(2.0 * p / (p + q).toDouble) * 1e6) else 0L
        val lb =
          if (p > 0 && q > 0) math.round(math.log(2.0 * q / (p + q).toDouble) * 1e6)
          else if (p == 0) 693147L else 0L
        s += Math.floorDiv(p * la, 1000000L) + Math.floorDiv(q * lb, 1000000L)
      }
      val row = out(sh)
      assert(row.getAs[Long]("n_docs") === ns)
      assert(row.getAs[Double]("jsd_nats") === r6(s.toDouble / 2e9))
      // hash sharding mixes: every shard stays well under the ln 2 ≈
      // 0.693 single-source ceiling (at sf0.001 a shard holds only ~31
      // docs over 20 sources, so sampling noise alone reaches ~0.21 —
      // the bound is a burst detector, not a tightness claim)
      assert(row.getAs[Double]("jsd_nats") >= 0.0)
      assert(row.getAs[Double]("jsd_nats") < 0.35,
        s"shard $sh diverges from the global mix: ${row.getAs[Double]("jsd_nats")}")
    }
  }

  test("ann_hubness: brute-force k-occurrence replay and conservation") {
    val vq = quantVecs()
    val corpus = vq.filter(_._1 >= 8)
    // fixed-COUNT md5-smallest probe sample (matches the operator)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val probes = corpus.keys.toSeq
      .sortBy(id => (md5hex(s"hub:$id"), id)).take(32)
    val occ = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for (q <- probes) {
      val top = corpus.toSeq.filter(_._1 != q)
        .map { case (n, v) => (n, d2(vq(q), v)) }
        .sortBy { case (n, d) => (d, n) }.take(5)
      top.foreach { case (n, _) => occ(n) += 1 }
    }
    val expected = (occ.values.groupBy(identity)
      .map { case (k, g) => (k, g.size.toLong) }
      + (0L -> (corpus.size - occ.size).toLong)).toSeq.sorted
    val got = graft.operators.AnnExact.annHubness(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === expected)
    // conservation: retrieval slots and vector mass both add up
    assert(got.map { case (k, n) => k * n }.sum === probes.size * 5L)
    assert(got.map(_._2).sum === corpus.size.toLong)
  }

  test("stream_lexicon_gate: streaming output equals the batch flags") {
    val stream = graft.streaming.StreamQueries.streamLexiconGate(spark, sf)
      .collect().toSeq
    val batch = graft.operators.TextAnalysis
      .lexiconFlags(graft.sources.Tables.documents(spark, sf))
      .orderBy($"doc_id").collect().toSeq
    assert(stream === batch)
    assert(stream.exists(_.getAs[Boolean]("blocked")),
      "fixture must exercise the blocked path")
  }
}
