package graft

import graft.operators.{Sharding, Stats, Curation}
import org.apache.spark.sql.functions._

/** Semantic checks for the round-7 association/sharding/sweep batch
  * beyond the DuckDB hash gate: chi² replayed exactly driver-side in
  * BigInt, residual/contribution conservation, serpentine shard
  * balance, sweep monotonicity, and the streaming mixture gate's
  * batch equivalence.
  */
class ChiShardSpec extends SparkSpec {
  import spark.implicits._

  test("chi2_independence: exact BigInt replay of the statistic and dof") {
    val row = Stats.chi2Independence(spark, sf).collect().head
    val docs = graft.sources.Tables.documents(spark, sf)
      .groupBy($"lang", $"source").agg(count(lit(1)).as("o"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = docs.keys.map(_._1).toSeq.distinct.sorted
    val srcs = docs.keys.map(_._2).toSeq.distinct.sorted
    val rt = langs.map(l => l -> docs.collect { case ((`l`, _), o) => o }.sum).toMap
    val ct = srcs.map(s => s -> docs.collect { case ((_, `s`), o) => o }.sum).toMap
    val n = docs.values.sum
    var chi2Micro = BigInt(0)
    for (l <- langs; s <- srcs) {
      val o = docs.getOrElse((l, s), 0L)
      val a = BigInt(o) * n - BigInt(rt(l)) * ct(s)
      chi2Micro += (a * a * 1000000) / (BigInt(rt(l)) * ct(s) * n)
    }
    assert(row.getAs[Long]("n") === n)
    assert(row.getAs[Int]("dof") === (langs.size - 1) * (srcs.size - 1))
    assert(math.abs(row.getAs[Double]("chi2") - chi2Micro.toDouble / 1e6) < 1e-6)
    val v = row.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
    // dof 76 ⇒ the Wilson–Hilferty critical value is near the true
    // 97.35; sanity-pin the ballpark so a formula regression is loud
    assert(math.abs(row.getAs[Double]("chi2_crit_95") -
      97.35) < 1.0, s"WH crit: ${row.getAs[Double]("chi2_crit_95")}")
  }

  test("contingency_residuals: contributions sum to the statistic; expected mass ≈ N") {
    val cells = Stats.contingencyResiduals(spark, sf).collect()
    val stat = Stats.chi2Independence(spark, sf).collect().head
    val chi2Micro = math.round(stat.getAs[Double]("chi2") * 1e6)
    assert(cells.map(_.getAs[Long]("contrib_micro")).sum === chi2Micro)
    // Σ expected = N exactly in rationals; micro floor loses < 1 micro
    // per cell
    val n = stat.getAs[Long]("n")
    val expSum = cells.map(_.getAs[Long]("expected_micro")).sum
    assert(expSum <= n * 1000000L && expSum > n * 1000000L - cells.length)
    // observed marginal conservation
    assert(cells.map(_.getAs[Long]("observed")).sum === n)
  }

  test("shard_plan/shard_balance: partition of the corpus, serpentine balance") {
    val plan = Sharding.shardPlan(spark, sf).cache()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(plan.count() === nDocs, "every doc sharded exactly once")
    val shards = plan.select($"shard").distinct().collect().map(_.getInt(0)).sorted
    assert(shards.toSeq === (0 until Sharding.NumShards))
    val bal = Sharding.shardBalance(spark, sf).collect()
    assert(bal.map(_.getAs[Long]("n_docs")).sum === nDocs)
    val totalTok = plan.agg(sum($"n_tokens")).collect().head.getLong(0)
    assert(bal.map(_.getAs[Long]("tokens")).sum === totalTok)
    // serpentine LPT on descending sizes: worst-shard deviation stays
    // within one max-doc of ideal (loose practical bound, exact for
    // the classic folded dealing on sorted input)
    val maxDoc = plan.agg(max($"n_tokens")).collect().head.getLong(0)
    val ideal = totalTok.toDouble / Sharding.NumShards
    bal.foreach { r =>
      assert(math.abs(r.getAs[Long]("tokens") - ideal) <= maxDoc.toDouble,
        s"shard ${r.getAs[Int]("shard")} off ideal by more than one max doc")
    }
    // dev_micro is the micro-unit rendering of the same deviation
    bal.foreach { r =>
      val expect = math.floor(
        r.getAs[Long]("tokens").toDouble * Sharding.NumShards * 1e6 / totalTok).toLong - 1000000L
      assert(r.getAs[Long]("dev_micro") === expect)
    }
    plan.unpersist()
  }

  test("quality_sweep: monotone non-increasing, shares exact, grid complete") {
    val sweep = Curation.qualitySweep(spark, sf).collect()
    assert(sweep.map(_.getAs[Long]("threshold_micro")).toSeq ===
      (1 to 9).map(_ * 100000L))
    val docs = sweep.map(_.getAs[Long]("n_docs_kept"))
    val toks = sweep.map(_.getAs[Long]("tokens_kept"))
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b },
      "doc survival must not increase with a higher bar")
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b })
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    sweep.foreach { r =>
      assert(r.getAs[Long]("doc_share_micro") ===
        r.getAs[Long]("n_docs_kept") * 1000000L / nDocs)
    }
  }

  test("xcorr_lags: bounded, lag-0 symmetric, ACF-consistent normalization") {
    val x = graft.operators.TimeSeries2.xcorrLags(spark, sf).collect()
    assert(x.nonEmpty)
    // correlation bound (floor/rounding slack only)
    assert(x.forall(r => math.abs(r.getAs[Double]("xcorr")) <= 1.000001))
    // at lag 0 the overlap is the full common support, so r_AB(0) =
    // r_BA(0) exactly (same products, same denominators)
    val lag0 = x.filter(_.getAs[Int]("lag") == 0)
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("xcorr")).toMap
    lag0.foreach { case ((a, b), v) =>
      assert(lag0((b, a)) === v, s"lag-0 asymmetry for ($a,$b)")
    }
    // every ordered pair of the event types appears at lag 0
    val types = graft.sources.Tables.events(spark, sf)
      .select($"event_type").distinct().count()
    assert(lag0.size === (types * (types - 1)).toInt)
  }

  test("classifier_calibration: mass conservation and bin-consistent means") {
    val cal = graft.operators.Training.classifierCalibration(spark, sf).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(cal.map(_.getAs[Long]("n")).sum === nDocs)
    cal.foreach { r =>
      val bin = r.getAs[Int]("bin"); val n = r.getAs[Long]("n")
      val ms = r.getAs[Long]("mean_score_micro")
      val pr = r.getAs[Long]("pos_rate_micro")
      assert(bin >= 0 && bin <= 9)
      assert(pr >= 0L && pr <= 1000000L)
      assert(r.getAs[Long]("gap_micro") === ms - pr)
      assert(r.getAs[Long]("brier_micro") >= 0L && n > 0L)
    }
    // range-relative binning must actually spread the compressed
    // scores, and bin means must rise with the bin (bins partition
    // the score axis)
    assert(cal.length >= 3, s"only ${cal.length} non-empty bins")
    val means = cal.sortBy(_.getAs[Int]("bin")).map(_.getAs[Long]("mean_score_micro"))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b })
    // Σ n·pos_rate recovers the positive count within per-bin floor loss
    val posApprox = cal.map(r => r.getAs[Long]("n") * r.getAs[Long]("pos_rate_micro")).sum
    val nPos = graft.sources.Tables.documents(spark, sf)
      .filter($"lang" === "en").count()
    assert(math.abs(posApprox - nPos * 1000000L) <= cal.map(_.getAs[Long]("n")).sum)
  }

  test("domain_reweight: weights sum to ~1, order tracks quality inversely, dynamics moved") {
    val w = graft.operators.Sampling.domainReweight(spark, sf).collect()
    val k = w.length
    val tot = w.map(_.getAs[Long]("weight_micro")).sum
    // floor renormalization loses < 1 micro per source per round
    assert(tot <= 1000000L && tot >= 1000000L - 8L * k)
    // multiplicative weights preserve the initial (uniform) order:
    // strictly lower loss ⇒ weight no smaller
    val byLoss = w.sortBy(r => (r.getAs[Long]("loss_micro"), r.getString(0)))
    byLoss.sliding(2).foreach { case Array(a, b) =>
      if (a.getAs[Long]("loss_micro") < b.getAs[Long]("loss_micro"))
        assert(a.getAs[Long]("weight_micro") >= b.getAs[Long]("weight_micro"))
      case _ => ()
    }
    // the loop actually reweighted: not everything is still uniform
    assert(w.map(_.getAs[Long]("weight_micro")).distinct.length > 1)
  }

  test("graph_reach_profile: one root per seed, bounded hops, positive frontiers") {
    val r = graft.operators.Graph.graphReachProfile(spark, sf).collect()
    val seeds = r.map(_.getAs[Long]("seed")).distinct
    assert(seeds.length === 4)
    seeds.foreach { s =>
      val hops = r.filter(_.getAs[Long]("seed") == s)
        .map(x => x.getAs[Int]("hop") -> x.getAs[Long]("n_nodes")).toMap
      assert(hops(0) === 1L, s"seed $s must be its own hop-0 set")
      assert(hops.keys.forall(h => h >= 0 && h <= 3))
      assert(hops.values.forall(_ > 0L))
    }
  }

  test("stream_mixture_gate equals the batch plan+gate decision") {
    val streamed = graft.streaming.StreamQueries.streamMixtureGate(spark, sf)
      .collect().map(r => (r.getString(0),
        (r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    // batch replay of the same plan + hash gate
    val toks = filter(split($"text", "\\s+"), t => t =!= "")
    val d = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text", size(toks).cast("long").as("n_tok"))
    val per = d.groupBy($"source").agg(sum($"n_tok").as("src_tokens"))
    val tot = per.agg(sum($"src_tokens").as("t"), count(lit(1)).as("k")).collect().head
    val rates = per.collect().map { r =>
      r.getString(0) -> math.min(1.0,
        BigDecimal(0.5 * tot.getLong(0) / tot.getLong(1) / r.getLong(1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val batch = d.collect().groupBy(_.getString(1)).map { case (src, rows) =>
      val rate = rates(src)
      val cut = if (rate >= 1.0) "zzzz"
        else f"${math.floor(rate * 65536).toLong}%04x"
      val kept = rows.filter { r =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"mix:${r.getLong(0)}:${r.getString(2)}".getBytes("UTF-8"))
        md.take(2).map(b => f"$b%02x").mkString < cut
      }
      src -> (rate, kept.length.toLong, kept.map(_.getLong(3)).sum)
    }
    val batchKept = batch.filter(_._2._2 > 0)
    assert(streamed === batchKept,
      s"stream/batch mixture gate mismatch")
  }

  test("anova_oneway: brute-force replay of F and the sum-of-squares identity") {
    val row = Stats.anovaOneway(spark, sf).collect().head
    val vals = graft.sources.Tables.events(spark, sf)
      .select($"event_type", round($"value", 4)).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val n = vals.length
    val groups = vals.groupBy(_._1)
    assert(row.getAs[Long]("n") === n)
    assert(row.getAs[Int]("k") === groups.size)
    // brute force with exact BigDecimal moments → double tree
    val s = BigDecimal(vals.map(v => BigDecimal(v._2)).sum.toString).toDouble
    val ss = vals.map(v => BigDecimal(v._2) * BigDecimal(v._2)).sum.toDouble
    val sumSq = groups.toSeq.sortBy(_._1).map { case (_, rows) =>
      val sg = rows.map(v => BigDecimal(v._2)).sum.toDouble
      sg * sg / rows.length
    }.sum
    val ssb = sumSq - s * s / n
    val ssw = ss - sumSq
    val f = (ssb / (groups.size - 1)) / (ssw / (n - groups.size))
    assert(math.abs(row.getAs[Double]("f_stat") - f) < 1e-4, s"F: $f vs ${row.getAs[Double]("f_stat")}")
    // partition identity: SSB + SSW = SST (within display rounding)
    val sst = ss - s * s / n
    assert(math.abs(row.getAs[Double]("ss_between") + row.getAs[Double]("ss_within") - sst) < 1e-3)
    val eta = row.getAs[Double]("eta_sq")
    assert(eta >= 0.0 && eta <= 1.0)
    assert(math.abs(row.getAs[Double]("f_crit_95") - 2.372) < 0.02,
      "WH F_crit(4, inf) should be near the true 2.372")
  }

  test("kendall_tau: exact O(n²) pair brute force") {
    val row = Stats.kendallTau(spark, sf).collect().head
    val pts = graft.sources.Tables.lineitem(spark, sf)
      .select(round($"l_quantity", 0).cast("int"),
        round($"l_discount" * 100, 0).cast("int")).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    var conc = 0L; var disc = 0L
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val dx = pts(i)._1.compareTo(pts(j)._1)
      val dy = pts(i)._2.compareTo(pts(j)._2)
      if (dx != 0 && dy != 0) { if (dx == dy) conc += 1 else disc += 1 }
    }
    assert(row.getAs[Long]("concordant") === conc)
    assert(row.getAs[Long]("discordant") === disc)
    val n = pts.length.toLong
    val n0 = n * (n - 1) / 2
    val n1 = pts.groupBy(_._1).values.map(g => g.length.toLong * (g.length - 1) / 2).sum
    val n2 = pts.groupBy(_._2).values.map(g => g.length.toLong * (g.length - 1) / 2).sum
    assert(row.getAs[Long]("ties_x") === n1)
    assert(row.getAs[Long]("ties_y") === n2)
    val tau = (conc - disc).toDouble / math.sqrt((n0 - n1).toDouble) / math.sqrt((n0 - n2).toDouble)
    assert(math.abs(row.getAs[Double]("tau_b") - tau) < 1e-5)
    assert(math.abs(row.getAs[Double]("tau_b")) <= 1.0)
  }

  test("spearman_corr: exact midrank brute force and range bounds") {
    val row = Stats.spearmanCorr(spark, sf).collect().head
    val pts = graft.sources.Tables.lineitem(spark, sf)
      .select(round($"l_quantity", 0).cast("int"),
        round($"l_discount" * 100, 0).cast("int")).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    val n = pts.length
    assert(row.getAs[Long]("n") === n)
    def midranks(xs: Seq[Int]): Map[Int, Double] = {
      val cnt = xs.groupBy(identity).view.mapValues(_.size).toMap
      cnt.keys.toSeq.sorted.foldLeft((0L, Map.empty[Int, Double])) {
        case ((below, acc), v) =>
          (below + cnt(v), acc + (v -> (below + (cnt(v) + 1) / 2.0)))
      }._2
    }
    val rx = midranks(pts.map(_._1).toIndexedSeq)
    val ry = midranks(pts.map(_._2).toIndexedSeq)
    def pearson(xs: Seq[Double], ys: Seq[Double]): Double = {
      val nD = xs.length.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(x => x * x).sum
      val syy = ys.map(y => y * y).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      (nD * sxy - sx * sy) / math.sqrt((nD * sxx - sx * sx) * (nD * syy - sy * sy))
    }
    val rho = pearson(pts.map(p => rx(p._1)).toIndexedSeq, pts.map(p => ry(p._2)).toIndexedSeq)
    assert(math.abs(row.getAs[Double]("spearman_rho") - rho) < 1e-4,
      s"rho: $rho vs ${row.getAs[Double]("spearman_rho")}")
    assert(math.abs(row.getAs[Double]("spearman_rho")) <= 1.0)
    assert(math.abs(row.getAs[Double]("pearson_r")) <= 1.0)
    assert(row.getAs[Int]("n_distinct_x") === pts.map(_._1).distinct.length)
    assert(row.getAs[Int]("n_distinct_y") === pts.map(_._2).distinct.length)
  }
}
