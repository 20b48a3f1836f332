package graft

import graft.operators.Similarity
import graft.cdc.Cdc

/** Round-8 operator batch: contrastive triplet mining and the CDC
  * compaction acceptance audit — each with a full driver-side
  * brute-force replay plus shuffle budgets.
  */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  test("contrastive_triplets: pos/neg are the true per-class argmax, margins replay") {
    val out = Similarity.contrastiveTriplets(spark, sf).collect()
    assert(out.length == 8)
    // exact replay: integer-grid cosine over the collected corpus
    val all = sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label", $"embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => BigDecimal(x.toDouble * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray))
    val corpus = all.filter(_._1 >= 8)
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    for (row <- out) {
      val qid = row.getLong(0)
      val (_, qLabel, qv) = all.find(_._1 == qid).get
      def top(same: Boolean): (Long, Double) =
        corpus.filter(c => (c._2 == qLabel) == same)
          .map(c => (c._1, cos(qv, c._3)))
          .minBy { case (id, c) => (-c, id) }
      val (posId, posCos) = top(same = true)
      val (negId, negCos) = top(same = false)
      assert(row.getInt(1) == qLabel, s"q$qid anchor_label")
      assert(row.getLong(2) == posId, s"q$qid pos_id")
      assert(row.getLong(4) == negId, s"q$qid neg_id")
      def r6(x: Double): Double = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(row.getDouble(3) - r6(posCos)) < 1e-9)
      assert(math.abs(row.getDouble(5) - r6(negCos)) < 1e-9)
      assert(math.abs(row.getDouble(6) - r6(posCos - negCos)) < 1e-9)
    }
  }

  test("cdc_compact_audit: disposition accounting and checksum replay") {
    val row = Cdc.cdcCompactAudit(spark, sf).collect()
    assert(row.length == 1)
    val r = row.head
    val (nLog, nKeys, nSup, nTomb, nBase, checksum) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    // the audit's own arithmetic contract
    assert(nLog == nSup + nTomb + nBase)
    assert(nKeys == nTomb + nBase)
    // full driver-side replay from the raw events
    val ev = sources.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"event_type", $"value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(nLog == ev.length)
    def opOf(t: String) = t match {
      case "signup" => "c"; case "purchase" => "u"; case "error" => "d"; case _ => "r"
    }
    val lastPerKey = ev.groupBy(_._1).map { case (k, rows) =>
      val last = rows.maxBy(_._2)
      (k, last._2, opOf(last._3), last._4)
    }
    assert(nKeys == lastPerKey.size)
    assert(nTomb == lastPerKey.count(_._3 == "d"))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16)
    }
    val want = lastPerKey.filter(_._3 != "d").toSeq
      .map { case (k, ofs, _, v) =>
        BigInt(h(s"$k:${BigDecimal(v * 10000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong}:$ofs"))
      }.sum % BigInt(281474976710656L)
    assert(BigInt(checksum) == want, "base checksum replay")
  }

  test("loo_source_impact: per-source ablation replays a literal k-pass removal") {
    import graft.operators.Sampling
    val out = Sampling.looSourceImpact(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(6))).toSeq
    // literal replay: materialize the planted corpus, then for each
    // source actually REMOVE it and recount — the k-pass computation
    // the operator's one-pass algebra must equal
    val base = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"source", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val corpus = base ++ base.filter(_._1 < 30)
      .map(d => (d._1 + 3000000L, d._2, s"src${(d._1 + 1) % 20}", d._4))
    def dupMass(docs: Seq[(Long, String, String, Long)]): Long =
      docs.groupBy(_._2).valuesIterator.map(_.size.toLong).filter(_ >= 2).sum
    val fullDup = dupMass(corpus)
    assert(out.nonEmpty && out.forall(_._6 == fullDup))
    for ((src, nDocs, remDocs, remMean, remDup, _) <- out) {
      val kept = corpus.filterNot(_._3 == src)
      assert(nDocs == corpus.count(_._3 == src), s"$src n_docs")
      assert(remDocs == kept.size, s"$src remaining_docs")
      assert(remDup == dupMass(kept), s"$src remaining_dup_docs")
      val mean = BigDecimal(kept.map(_._4).sum.toDouble / kept.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(remMean - mean) < 1e-9, s"$src remaining_mean_chars")
    }
    // the planted redeliveries must make the correction term non-vacuous:
    // at least one source's ablation changes the duplicate mass
    assert(out.exists(_._5 != fullDup), "LOO dup correction is vacuous")
  }

  test("cdc_lag_report: nearest-rank percentiles replay from raw event times") {
    val out = Cdc.cdcLagReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(out.nonEmpty)
    val ev = sources.Tables.events(spark, sf)
      .select($"event_type", $"ts_ns").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byTarget = ev.groupBy { case (t, _) => s"cdc.commerce_$t" }
    assert(out.length == byTarget.size)
    for ((target, n, p50, p95, p99, mx, mean) <- out) {
      val lags = byTarget(target).map { case (_, ns) =>
        val cs = Math.floorDiv(ns, 1000000000L)
        (Math.floorDiv(cs, 300L) + 1L) * 300L - cs
      }.sorted
      assert(n == lags.length, s"$target n")
      def nr(p: Double): Long = lags(math.ceil(p * lags.length).toInt - 1)
      assert(p50 == nr(0.5), s"$target p50")
      assert(p95 == nr(0.95), s"$target p95")
      assert(p99 == nr(0.99), s"$target p99")
      assert(mx == lags.last, s"$target max")
      val m = BigDecimal(lags.sum.toDouble / lags.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(mean - m) < 1e-9, s"$target mean")
      assert(lags.forall(l => l >= 1 && l <= 300), s"$target lag range")
    }
  }

  test("graph_powerlaw_fit: CSN alpha and KS replay from the collected degree list") {
    import graft.operators.Graph
    val r = Graph.graphPowerlawFit(spark, sf).collect()
    assert(r.length == 1)
    val (nTail, dmin, alpha, ks, nDeg) =
      (r.head.getLong(0), r.head.getLong(1), r.head.getDouble(2),
        r.head.getDouble(3), r.head.getLong(4))
    assert(dmin == 2L)
    // rebuild degrees from first principles: distinct (order, part)
    // incidence → co-purchase pairs with support >= 2 → node degrees
    val li = sources.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).valuesIterator.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val degs = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).map(_._2.size.toLong).filter(_ >= 2).toSeq
    assert(nTail == degs.length, "tail size")
    assert(nDeg == degs.distinct.length, "distinct degrees")
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sMicro = degs.groupBy(identity).map { case (d, g) =>
      g.size * math.round(math.log(d.toDouble / 1.5) * 1e6)
    }.sum
    val wantAlpha = r6(1.0 + degs.length.toDouble * 1e6 / sMicro.toDouble)
    assert(math.abs(alpha - wantAlpha) < 1e-9, "alpha")
    val n = degs.length.toDouble
    val wantKs = r6(degs.distinct.map { d =>
      math.abs(r6(degs.count(_ >= d) / n)
        - r6(math.pow(d.toDouble / 1.5, 1.0 - wantAlpha)))
    }.max)
    assert(math.abs(ks - wantKs) < 1e-9, "ks")
    assert(alpha > 1.0 && ks >= 0.0 && ks <= 1.0)
  }

  test("ab_cuped: theta, adjusted lift, and rho2 replay from per-user moments") {
    import graft.operators.Behavior
    val r = Behavior.abCuped(spark, sf).collect()
    assert(r.length == 1)
    val splitNs = 1705363200000000000L
    def hexEven(salt: String, uid: Long): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt$uid".getBytes("UTF-8"))
      "0123456789abcdef".charAt((d(0) >> 4) & 0xf) match {
        case c => "02468ace".contains(c)
      }
    }
    def q4(x: Double): BigDecimal =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ev = sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts_ns", $"value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val perUser = ev.groupBy(_._1).map { case (uid, rows) =>
      val x = rows.filter(_._2 < splitNs).map(e => q4(e._3)).sum
      val y = rows.filter(_._2 >= splitNs).map(e => q4(e._3)).sum
      (uid, x, y, hexEven("arm:", uid))
    }.toSeq
    val (nT, nC) = (perUser.count(_._4).toLong, perUser.count(!_._4).toLong)
    def d(b: BigDecimal): Double = b.toDouble
    val sxT = d(perUser.filter(_._4).map(_._2).sum)
    val sxC = d(perUser.filter(!_._4).map(_._2).sum)
    val syT = d(perUser.filter(_._4).map(_._3).sum)
    val syC = d(perUser.filter(!_._4).map(_._3).sum)
    val sx = d(perUser.map(_._2).sum); val sy = d(perUser.map(_._3).sum)
    val sxx = d(perUser.map(u => u._2 * u._2).sum)
    val sxy = d(perUser.map(u => u._2 * u._3).sum)
    val syy = d(perUser.map(u => u._3 * u._3).sum)
    val nd = (nT + nC).toDouble
    val theta = r6((nd * sxy - sx * sy) / (nd * sxx - sx * sx))
    val row = r.head
    assert(row.getLong(0) == nT && row.getLong(1) == nC, "arm sizes")
    assert(math.abs(row.getDouble(2) - r6(syT / nT)) < 1e-9, "mean_y_treat")
    assert(math.abs(row.getDouble(4) - r6(syT / nT - syC / nC)) < 1e-9, "diff_raw")
    assert(math.abs(row.getDouble(5) - theta) < 1e-9, "theta")
    assert(math.abs(row.getDouble(6)
      - r6(syT / nT - syC / nC - theta * (sxT / nT - sxC / nC))) < 1e-9,
      "diff_cuped")
    val rho2 = r6((nd * sxy - sx * sy) * (nd * sxy - sx * sy)
      / ((nd * sxx - sx * sx) * (nd * syy - sy * sy)))
    assert(math.abs(row.getDouble(7) - rho2) < 1e-9, "rho2")
    assert(rho2 > 0.0 && rho2 <= 1.0)
  }

  test("diff_in_diff: the 2x2 cell means and DiD estimate replay exactly") {
    import graft.operators.Behavior
    val r = Behavior.diffInDiff(spark, sf).collect()
    assert(r.length == 1)
    val splitNs = 1705363200000000000L
    def hexEven(uid: Long): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"did:$uid".getBytes("UTF-8"))
      "02468ace".contains("0123456789abcdef".charAt((d(0) >> 4) & 0xf))
    }
    def q4(x: Double): BigDecimal =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ev = sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts_ns", $"value").collect()
      .map(r => (hexEven(r.getLong(0)), r.getLong(1) >= splitNs, r.getDouble(2)))
    def cell(t: Boolean, p: Boolean): (Long, Double) = {
      val vs = ev.filter(e => e._1 == t && e._2 == p).map(_._3)
      (vs.length.toLong, vs.map(q4).sum.toDouble / vs.length)
    }
    val (nTp, mTp) = cell(t = true, p = true)
    val (nT0, mT0) = cell(t = true, p = false)
    val (nCp, mCp) = cell(t = false, p = true)
    val (nC0, mC0) = cell(t = false, p = false)
    val row = r.head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      == ((nTp, nT0, nCp, nC0)), "cell sizes")
    assert(math.abs(row.getDouble(4) - r6(mTp)) < 1e-9, "mean_treat_post")
    assert(math.abs(row.getDouble(5) - r6(mT0)) < 1e-9, "mean_treat_pre")
    assert(math.abs(row.getDouble(6) - r6(mCp)) < 1e-9, "mean_ctrl_post")
    assert(math.abs(row.getDouble(7) - r6(mC0)) < 1e-9, "mean_ctrl_pre")
    assert(math.abs(row.getDouble(8) - r6((mTp - mT0) - (mCp - mC0))) < 1e-9,
      "did")
  }

  test("cdc_key_churn: log2 buckets, masses, and cumulative shares replay") {
    val out = Cdc.cdcKeyChurn(spark, sf).collect()
    assert(out.nonEmpty)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ev = sources.Tables.events(spark, sf)
      .select($"user_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getString(1) == "error"))
    // toSeq BEFORE mapping to (cnt, dels): mapping a Map to pair
    // tuples would collapse users with identical counts
    val perKey = ev.groupBy(_._1).toSeq.map { case (_, rows) =>
      (rows.length.toLong, rows.count(_._2).toLong)
    }
    val buckets = perKey.groupBy { case (cnt, _) =>
      63 - java.lang.Long.numberOfLeadingZeros(cnt)
    }.map { case (b, g) =>
      (b.toLong, g.size.toLong, g.map(_._1).sum, g.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    val total = buckets.map(_._3).sum.toDouble
    assert(out.length == buckets.length, "bucket count")
    var cum = 0L
    for ((row, (b, nk, ch, dl)) <- out.zip(buckets)) {
      cum += ch
      assert(row.getLong(0) == b && row.getLong(1) == 1L << b, s"bucket $b bounds")
      assert(row.getLong(2) == nk && row.getLong(3) == ch
        && row.getLong(4) == dl, s"bucket $b masses")
      assert(math.abs(row.getDouble(5) - r6(ch / total)) < 1e-9, s"bucket $b pct")
      assert(math.abs(row.getDouble(6) - r6(cum / total)) < 1e-9, s"bucket $b cum")
    }
    assert(math.abs(out.last.getDouble(6) - 1.0) < 1e-9, "cum ends at 1")
  }

  test("graph_richclub: phi(k) replays from first-principles club density") {
    import graft.operators.Graph
    val out = Graph.graphRichclub(spark, sf).collect()
    assert(out.nonEmpty)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // rebuild the co-purchase graph: distinct (order, part) → pairs
    // with support >= 2 → degrees
    val li = sources.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).valuesIterator.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map { case (n, g) => (n, g.size.toLong) }
    val ks = deg.values.toSeq.distinct.sorted
    val expected = ks.flatMap { k =>
      val club = deg.filter(_._2 > k).keySet
      val n = club.size.toLong
      if (n < 2) None
      else {
        val e = edges.count(p => club(p._1) && club(p._2)).toLong
        Some((k, n, e, r6(2.0 * e / (n.toDouble * (n - 1).toDouble))))
      }
    }
    assert(out.length == expected.length, "threshold count")
    for ((row, (k, n, e, phi)) <- out.zip(expected)) {
      assert(row.getLong(0) == k && row.getLong(1) == n
        && row.getLong(2) == e, s"k=$k club size/edges")
      assert(math.abs(row.getDouble(3) - phi) < 1e-9, s"k=$k phi")
    }
    // density must be within [0,1] and the top club fully dense or absent
    assert(out.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }

  test("levene_test: F on absolute deviations replays from collected groups") {
    import graft.operators.Stats
    val r = Stats.leveneTest(spark, sf).collect()
    assert(r.length == 1)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def q(x: Double, s: Int): BigDecimal =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    val ev = sources.Tables.events(spark, sf)
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val byType = ev.groupBy(_._1)
    val groups = byType.toSeq.map { case (_, rows) =>
      val n = rows.length.toLong
      val mean6 = r6(rows.map(e => q(e._2, 4)).sum.toDouble / n)
      val zs = rows.map(e => q(math.abs(q(e._2, 4).toDouble - mean6), 6))
      val sz = zs.sum // exact decimal, like the engine's DECIMAL sum
      val szz = zs.map(z => z * z).sum
      val szd = sz.toDouble
      val ai = math.round(szd * szd / n * 1e6)
      (n, sz, szz, ai)
    }
    val k = groups.length.toLong
    val nn = groups.map(_._1).sum
    val szsum = groups.map(_._2).sum.toDouble
    val szzsum = groups.map(_._3).sum.toDouble
    val ad = groups.map(_._4).sum.toDouble / 1e6
    val ssb = ad - szsum * szsum / nn
    val ssw = szzsum - ad
    val row = r.head
    assert(row.getLong(0) == k && row.getLong(1) == nn, "k/n")
    assert(math.abs(row.getDouble(2) - r6(ssb)) < 1e-6, "ss_between")
    assert(math.abs(row.getDouble(3) - r6(ssw)) < 1e-6, "ss_within")
    assert(math.abs(row.getDouble(4)
      - r6((ssb / (k - 1)) / (ssw / (nn - k)))) < 1e-6, "f_stat")
    assert(row.getDouble(2) >= 0.0 && row.getDouble(3) > 0.0)
  }

  test("markov_stationary: nano-quantized fixpoint tracks the double-precision chain") {
    import graft.operators.Behavior
    val out = Behavior.markovStationary(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out.nonEmpty)
    // rebuild the chain in doubles and power-iterate far past 25 steps
    val ev = sources.Tables.events(spark, sf)
      .select($"user_id", $"ts_ns", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).valuesIterator.flatMap { rows =>
      val s = rows.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.drop(1))
    }.toSeq
    val counts = trans.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    val states = counts.keys.map(_._1).toSeq.distinct.sorted
    val tot = counts.groupBy(_._1._1).map { case (f, g) => (f, g.values.sum) }
    def pOf(f: String, t: String): Double =
      counts.getOrElse((f, t), 0L).toDouble / tot(f)
    var pi = states.map(_ => 1.0 / states.length)
    for (_ <- 1 to 300)
      pi = states.map(t => states.zip(pi).map { case (f, w) => w * pOf(f, t) }.sum)
    val piRef = states.zip(pi).toMap
    val hRef = states.map { f =>
      (f, states.map { t =>
        val p = pOf(f, t); if (p > 0) -p * math.log(p) else 0.0
      }.sum)
    }.toMap
    val entRef = states.map(s => piRef(s) * hRef(s)).sum
    assert(out.map(_._1).toSeq == states, "state set")
    for ((s, p, h, e) <- out) {
      assert(math.abs(p - piRef(s)) < 1e-4, s"pi($s): $p vs ${piRef(s)}")
      assert(math.abs(h - hRef(s)) < 1e-4, s"h_state($s)")
      assert(math.abs(e - entRef) < 1e-3, "entropy_rate")
    }
    val mass = out.map(_._2).sum
    assert(mass > 0.999 && mass <= 1.0 + 1e-9, s"pi mass $mass")
  }

  test("holt_winters: the (l, b, s[7]) fold replays step-for-step in driver doubles") {
    import graft.operators.TimeSeries2
    val out = TimeSeries2.holtWinters(spark, sf).collect()
    assert(out.nonEmpty)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def q4(x: Double): BigDecimal =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val ev = sources.Tables.events(spark, sf)
      .select($"event_type", $"ts_ns", $"value").collect()
      .map(r => (r.getString(0), Math.floorDiv(r.getLong(1), 86400000000000L),
        r.getDouble(2)))
    val series = ev.groupBy(_._1).map { case (t, rows) =>
      (t, rows.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (_, g) => g.map(e => q4(e._3)).sum.toDouble })
    }.filter(_._2.length >= 15)
    for (row <- out) {
      val t = row.getString(0)
      val v = series(t).toArray
      val n = v.length
      def at(i: Int): Double = v(i - 1)
      val l0 = (at(1) + at(2) + at(3) + at(4) + at(5) + at(6) + at(7)) / 7.0
      val m2 = (at(8) + at(9) + at(10) + at(11) + at(12) + at(13) + at(14)) / 7.0
      var l = l0; var b = (m2 - l0) / 7.0
      val s = Array.tabulate(7)(k => at(k + 1) - l0)
      for (i <- 8 to n) {
        val x = at(i); val j = (i - 1) % 7 // 0-based
        val nl = 0.3 * (x - s(j)) + 0.7 * (l + b)
        val nb = 0.2 * (nl - l) + 0.8 * b
        s(j) = 0.1 * (x - nl) + 0.9 * s(j)
        l = nl; b = nb
      }
      assert(row.getLong(1) == n, s"$t n_days")
      assert(math.abs(row.getDouble(2) - r6(l)) < 1e-9, s"$t level")
      assert(math.abs(row.getDouble(3) - r6(b)) < 1e-9, s"$t trend")
      for (h <- 1 to 3) {
        val f = l + h.toDouble * b + s((n + h - 1) % 7)
        assert(math.abs(row.getDouble(3 + h) - r6(f)) < 1e-9, s"$t forecast_$h")
      }
    }
  }

  test("bootstrap_ci: replicate means, CI order stats, and SE replay exactly") {
    import graft.operators.Stats
    val r = Stats.bootstrapCi(spark, sf).collect()
    assert(r.length == 1)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def q(x: Double, s: Int): BigDecimal =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def pois(h2: Int): Long =
      if (h2 <= 93) 0L else if (h2 <= 187) 1L else if (h2 <= 234) 2L
      else if (h2 <= 250) 3L else if (h2 <= 254) 4L else 5L
    val ev = sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"event_id", $"value").collect()
      .map(r => (r.getLong(0), q(r.getDouble(1), 4)))
    val ms = (1 to 40).map { b =>
      var sw = 0L; var swx = BigDecimal(0)
      for ((id, x) <- ev) {
        val h2 = Integer.parseInt(md5hex(s"bs:$b:$id").substring(0, 2), 16)
        val w = pois(h2); sw += w; swx += x * w
      }
      (b, q(swx.toDouble / sw, 6))
    }
    val sorted = ms.sortBy { case (b, m) => (m, b) }.map(_._2)
    val sm = ms.map(_._2).sum.toDouble
    val smm = ms.map(m => m._2 * m._2).sum.toDouble
    val bn = 40L
    val row = r.head
    assert(row.getLong(0) == ev.length.toLong, "n_events")
    assert(math.abs(row.getDouble(1)
      - r6(ev.map(_._2).sum.toDouble / ev.length)) < 1e-9, "mean")
    assert(math.abs(row.getDouble(2) - sorted.head.toDouble) < 1e-9, "ci_lo")
    assert(math.abs(row.getDouble(3) - sorted(38).toDouble) < 1e-9, "ci_hi")
    assert(math.abs(row.getDouble(4)
      - r6(math.sqrt((smm - sm * sm / bn) / (bn - 1)))) < 1e-9, "se_boot")
    assert(row.getLong(5) == 40L)
    assert(row.getDouble(2) <= row.getDouble(1) + 1e-6
      && row.getDouble(1) <= row.getDouble(3) + 1e-6, "CI brackets the mean")
  }

  test("minhash_band_sweep: every config's bucket workload replays from the sigs") {
    import graft.operators.Dedup
    val out = Dedup.minhashBandSweep(spark, sf).collect()
    assert(out.length == 5)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sigs = Dedup.minhashSigs(spark, sf).collect()
      .map(r => r.getSeq[Long](1).toVector)
    for (row <- out) {
      val (b, r) = (row.getLong(0).toInt, row.getLong(1).toInt)
      assert(b * r == 64, s"($b,$r) factorization")
      val buckets = scala.collection.mutable.Map[(Int, Vector[Long]), Long]()
        .withDefaultValue(0L)
      for (sig <- sigs; g <- 0 until b)
        buckets((g, sig.slice(g * r, g * r + r))) += 1L
      val ns = buckets.values.toSeq
      assert(row.getLong(2) == ns.count(_ >= 2).toLong, s"($b,$r) paired buckets")
      assert(row.getLong(3) == ns.max, s"($b,$r) max bucket")
      assert(row.getLong(4) == ns.map(n => n * (n - 1) / 2).sum,
        s"($b,$r) candidate pairs")
      assert(math.abs(row.getDouble(5)
        - r6(math.pow(1.0 / b, 1.0 / r))) < 1e-9, s"($b,$r) threshold")
    }
    // sanity: single-row bands admit everything more than 16-row bands
    val byRows = out.map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(byRows(1L) >= byRows(16L), "workload falls with precision")
  }

  test("cem_att: stratum matching, pruning, and the weighted ATT replay") {
    import graft.operators.Behavior
    val r = Behavior.cemAtt(spark, sf).collect()
    assert(r.length == 1)
    val splitNs = 1705363200000000000L
    def hexEven(uid: Long): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cem:$uid".getBytes("UTF-8"))
      "02468ace".contains("0123456789abcdef".charAt((d(0) >> 4) & 0xf))
    }
    def q4(x: Double): BigDecimal =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ev = sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts_ns", $"value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val users = ev.groupBy(_._1).toSeq.map { case (uid, rows) =>
      val x = rows.filter(_._2 < splitNs).map(e => q4(e._3)).sum
      val y = rows.filter(_._2 >= splitNs).map(e => q4(e._3)).sum
      val tenk = (x * 10000).toLongExact
      (Math.floorDiv(tenk, 500000L), hexEven(uid), y)
    }
    val strata = users.groupBy(_._1).map { case (s, g) =>
      val t = g.filter(_._2); val c = g.filterNot(_._2)
      (s, t.size.toLong, c.size.toLong, t.map(_._3).sum, c.map(_._3).sum)
    }.toSeq
    val matched = strata.filter(s => s._2 > 0 && s._3 > 0)
    val unmatchedT = strata.filter(_._3 == 0).map(_._2).sum
    val wsum = matched.map { case (_, nt, nc, syt, syc) =>
      nt * math.round((syt.toDouble / nt - syc.toDouble / nc) * 1e6)
    }.sum
    val ntm = matched.map(_._2).sum
    val row = r.head
    assert(row.getLong(0) == matched.size.toLong, "n_strata_matched")
    assert(row.getLong(1) == ntm, "n_treated_matched")
    assert(row.getLong(2) == unmatchedT, "n_treated_unmatched")
    assert(math.abs(row.getDouble(3)
      - r6(ntm.toDouble / (ntm + unmatchedT))) < 1e-9, "match rate")
    assert(math.abs(row.getDouble(4)
      - r6(wsum.toDouble / ntm / 1e6)) < 1e-9, "att")
  }

  test("er_blocking_sweep: block workloads replay; truth coverage identities hold") {
    import graft.operators.Dedup
    val out = Dedup.erBlockingSweep(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq("len20", "pre1", "pre3", "suf3"))
    // workload replay from collected docs
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def keys(text: String): Map[String, String] = {
      val t = text.split("\\s+").filter(_.nonEmpty)
      Map("pre1" -> t.headOption.orNull,
        "pre3" -> t.take(3).mkString(" "),
        "suf3" -> t.takeRight(3).mkString(" "),
        "len20" -> (text.length / 20).toString)
    }
    val keyed = docs.map(d => keys(d._2))
    for ((scheme, nbp, maxB, cand, truthN, caught, recall) <- out) {
      val blocks = keyed.map(_(scheme)).groupBy(identity).map(_._2.size.toLong)
      assert(nbp == blocks.count(_ >= 2).toLong, s"$scheme paired blocks")
      assert(maxB == blocks.max, s"$scheme max block")
      assert(cand == blocks.map(n => n * (n - 1) / 2).sum, s"$scheme workload")
      assert(recall >= 0.0 && recall <= 1.0 && caught <= truthN)
    }
    // every verified pair agrees on pre3 OR suf3 by construction
    val byScheme = out.map(o => o._1 -> o).toMap
    assert(byScheme("pre3")._6 + byScheme("suf3")._6 >= byScheme("pre3")._5,
      "pre3/suf3 union covers the truth set")
    assert(out.map(_._5).distinct.length == 1, "one truth set across schemes")
  }

  test("anomaly_seasonal: profile residual z-scores replay exactly") {
    import graft.operators.Profile
    val out = Profile.anomalySeasonal(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(5)))
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def q(x: Double, s: Int): BigDecimal =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    val ev = sources.Tables.events(spark, sf)
      .select($"event_id", $"event_type",
        org.apache.spark.sql.functions.hour($"ts").as("how"), $"value")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    val prof = ev.groupBy(e => (e._2, e._3)).map { case (k, g) =>
      (k, r6(g.map(e => q(e._4, 4)).sum.toDouble / g.length))
    }
    val resid = ev.map(e => (e._1, q(q(e._4, 4).toDouble - prof((e._2, e._3)), 6)))
    val n = resid.length.toLong
    val sr = resid.map(_._2).sum.toDouble
    val srr = resid.map(e => e._2 * e._2).sum.toDouble
    val mu = r6(sr / n)
    val sd = r6(math.sqrt((srr - sr * sr / n) / (n - 1)))
    val expected = resid.map { case (id, r) => (id, r6((r.toDouble - mu) / sd)) }
      .filter(e => math.abs(e._2) >= 3.0).sortBy(_._1)
    assert(out.length == expected.length, s"${out.length} vs ${expected.length}")
    for (((idO, zO), (idE, zE)) <- out.zip(expected)) {
      assert(idO == idE, "anomaly id")
      assert(math.abs(zO - zE) < 1e-9, s"z for $idO")
    }
    assert(out.nonEmpty, "detector fires on this corpus")
  }

  test("neyman_allocation: optimal allocation replays; budget identity holds") {
    import graft.operators.Sampling
    val out = Sampling.neymanAllocation(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.nonEmpty)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = sources.Tables.documents(spark, sf)
      .select($"source", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val strata = docs.groupBy(_._1).toSeq.map { case (src, g) =>
      val n = g.length.toLong
      val sx = g.map(_._2).sum; val sxx = g.map(d => d._2 * d._2).sum
      val sd = r6(math.sqrt((sxx.toDouble - sx.toDouble * sx.toDouble / n)
        / (n - 1)))
      (src, n, sd, math.round(n * sd * 1e3))
    }.sortBy(_._1)
    val mm = strata.map(_._4).sum
    val nn = strata.map(_._2).sum
    val floors = strata.map { case (src, n, sd, m) =>
      val nm = BigInt(m) * 10000
      (src, n, sd, (nm / mm).toLong, (nm % mm).toLong,
        n * 10000L / nn)
    }
    val deficit = 10000L - floors.map(_._4).sum
    val bump = floors.sortBy(f => (-f._5, f._1)).take(deficit.toInt)
      .map(_._1).toSet
    assert(out.length == strata.length)
    for (((src, n, sd, prop, ney, w), f) <- out.zip(floors)) {
      assert(src == f._1 && n == f._2, s"$src stratum")
      assert(math.abs(sd - f._3) < 1e-9, s"$src sd")
      assert(prop == f._6, s"$src proportional")
      assert(ney == f._4 + (if (bump(src)) 1L else 0L), s"$src neyman")
      val m = strata.find(_._1 == src).get._4
      assert(math.abs(w - r6(m.toDouble / mm)) < 1e-9, s"$src weight")
    }
    assert(out.map(_._5).sum == 10000L, "budget exactly spent")
    // the optimal allocation must differ from proportional somewhere
    assert(out.exists(o => o._4 != o._5), "neyman vs proportional non-trivial")
  }

  test("downsample_lttb: BigInt re-derivation matches; structural invariants hold") {
    import graft.operators.TimeSeries2
    val out = TimeSeries2.downsampleLttb(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.length == 30, s"${out.length} points")
    // independent re-derivation with BigInt arithmetic and the same
    // selection rule — confirms the Long path never overflowed and the
    // argmax/tie logic is the one specified
    def q4(x: Double): BigDecimal =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val ev = sources.Tables.events(spark, sf)
      .select($"ts_ns", $"value").collect()
      .map(r => (Math.floorDiv(r.getLong(0), 3600000000000L), q4(r.getDouble(1))))
    val grid = ev.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (h, g) => (h, (g.map(_._2).sum * 10000).toBigIntExact.get) }
    val n = grid.length
    val mid = grid.slice(1, n - 1)
    val byB = mid.zipWithIndex.groupBy { case (_, k) => k * 28 / mid.length }
    var prev = (BigInt(grid.head._1), grid.head._2)
    val picks = (0 until 28).map { b =>
      val cand = byB(b).map(_._1)
      val (nxs, nys, nc) =
        if (b + 1 < 28) {
          val nb = byB(b + 1).map(_._1)
          (nb.map(c => BigInt(c._1)).sum, nb.map(_._2).sum, BigInt(nb.length))
        } else (BigInt(grid.last._1), grid.last._2, BigInt(1))
      def a2(c: (Long, BigInt)): BigInt =
        ((prev._1 * nc - nxs) * (c._2 - prev._2)
          - (prev._1 - c._1) * (nys - prev._2 * nc)).abs
      val best = cand.maxBy(c => (a2(c), BigInt(-c._1)))
      prev = (BigInt(best._1), best._2)
      best
    }
    val expected = (grid.head +: picks) :+ grid.last
    for (((hO, vO), (hE, vE)) <- out.zip(expected)) {
      assert(hO == hE, s"pick hour $hO vs $hE")
      val want = BigDecimal(BigDecimal(vE).toDouble / 10000.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(vO - want) < 1e-9, s"value at $hO")
    }
    // structural: endpoints kept, strictly increasing x
    assert(out.head._1 == grid.head._1 && out.last._1 == grid.last._1)
    assert(out.map(_._1).sliding(2).forall(p => p(0) < p(1)))
  }

  test("periodogram_topk: exact DFT powers and the spectral ranking replay") {
    import graft.operators.TimeSeries2
    val out = TimeSeries2.periodogramTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.length == 10)
    def r4(x: Double): Double = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def q4(x: Double): BigDecimal =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val ev = sources.Tables.events(spark, sf)
      .select($"ts_ns", $"value").collect()
      .map(r => (Math.floorDiv(r.getLong(0), 3600000000000L), q4(r.getDouble(1))))
    val xs = ev.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, g) => (g.map(_._2).sum * 10000).toLongExact }
    val n = xs.length.toLong
    val sx = xs.sum
    val ys = xs.map(x => BigInt(n * x - sx))
    val powers = (1L to n / 2).map { f =>
      var sc = BigInt(0); var ss = BigInt(0)
      for ((y, t) <- ys.zipWithIndex) {
        val ang = 2.0 * math.Pi * ((f * t) % n).toDouble / n
        sc += y * math.round(math.cos(ang) * 1e6)
        ss += y * math.round(math.sin(ang) * 1e6)
      }
      val p = (sc.toDouble * sc.toDouble + ss.toDouble * ss.toDouble) / 1e30
      (f, r4(p))
    }
    val top = powers.sortBy { case (f, p) => (-p, f) }.take(10)
    for (((fO, perO, pO), (fE, pE)) <- out.zip(top)) {
      assert(fO == fE, s"freq rank: $fO vs $fE")
      assert(math.abs(pO - pE) < 1e-6, s"power at f=$fO")
      assert(math.abs(perO - r4(n.toDouble / fO)) < 1e-9, s"period at f=$fO")
    }
    // the spectrum is non-flat: a genuine peak separates rank 1 from
    // rank 10 (the synthetic value series' dominant cycle is ~3.6h at
    // this SF, not the count series' daily pulse — the replay above
    // pins the exact ranking either way)
    assert(out.head._3 > out.last._3, "spectral peak exists")
  }

  test("token_burstiness: per-doc variance-to-mean ratios replay exactly") {
    import graft.operators.TextModel
    val out = TextModel.tokenBurstiness(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nDocs = docs.length.toLong
    val perTok = docs.flatMap { case (id, text) =>
      text.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (tok, g) => (tok, id, g.length.toLong) }
    }.groupBy(_._1).map { case (tok, g) =>
      val sc = g.map(_._3).sum; val scc = g.map(e => e._3 * e._3).sum
      (tok, g.length.toLong, sc, scc)
    }
    val expected = perTok.toSeq.sortBy { case (tok, _, sc, _) => (-sc, tok) }
      .take(50)
    assert(out.length == expected.length, "top-k size (vocab-capped)")
    for (((tok, dw, occ, nd, mean, vmr), (tokE, dwE, scE, sccE))
         <- out.zip(expected)) {
      assert(tok == tokE && dw == dwE && occ == scE && nd == nDocs, s"$tok row")
      assert(math.abs(mean - r6(scE.toDouble / nDocs)) < 1e-9, s"$tok mean")
      val want = r6(((sccE.toDouble - scE.toDouble * scE.toDouble / nDocs)
        / (nDocs - 1)) / (scE.toDouble / nDocs))
      assert(math.abs(vmr - want) < 1e-9, s"$tok vmr")
    }
    // over-dispersion exists: some token clusters beyond Poisson
    assert(out.exists(_._6 > 1.2), "some token is bursty")
  }

  test("source_jsd_matrix: the integer JSD composition replays; bounds hold") {
    import graft.operators.TextModel
    val out = TextModel.sourceJsdMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = sources.Tables.documents(spark, sf)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = docs.flatMap { case (s, t) =>
      t.split("\\s+").filter(_.nonEmpty).map(tok => (s, tok))
    }.groupBy(identity).map { case ((s, tok), g) => (s, tok, g.size.toLong) }
    val tots = counts.groupBy(_._1).map { case (s, g) => (s, g.map(_._3).sum) }
    val probs = counts.map { case (s, tok, n) =>
      ((s, tok), (BigInt(n) * 1000000000L / tots(s)).toLong)
    }.toMap
    val sp = probs.toSeq.groupBy(_._1._1).map { case (s, g) =>
      (s, g.map(_._2).sum)
    }
    val sources_ = tots.keys.toSeq.sorted
    val expected = (for {
      a <- sources_; b <- sources_ if a < b
    } yield {
      val toksA = probs.keySet.filter(_._1 == a).map(_._2)
      val toksB = probs.keySet.filter(_._1 == b).map(_._2)
      val sharedT = (toksA & toksB).toSeq
      var shSum = 0L; var shpa = 0L; var shpb = 0L
      for (tok <- sharedT) {
        val pa = probs((a, tok)); val pb = probs((b, tok))
        val la = math.round(math.log(2.0 * pa / (pa + pb).toDouble) * 1e6)
        val lb = math.round(math.log(2.0 * pb / (pa + pb).toDouble) * 1e6)
        shSum += Math.floorDiv(pa * la, 1000000L) + Math.floorDiv(pb * lb, 1000000L)
        shpa += pa; shpb += pb
      }
      val x = shSum + Math.floorDiv((sp(a) - shpa) * 693147L, 1000000L) +
        Math.floorDiv((sp(b) - shpb) * 693147L, 1000000L)
      (a, b, sharedT.length.toLong, r6(x.toDouble / 2e9))
    }).sortBy(e => (e._1, e._2))
    assert(out.length == expected.length, "pair count")
    for (((a, b, st, j), (aE, bE, stE, jE)) <- out.zip(expected)) {
      assert(a == aE && b == bE && st == stE, s"pair $a-$b")
      assert(math.abs(j - jE) < 1e-9, s"jsd $a-$b")
      assert(j >= -1e-9 && j <= 0.693148, s"jsd bounds $a-$b")
    }
  }

  test("shuffle budgets for the round-8 operator batch") {
    // textual counts are cache-state-dependent (InMemoryTableScan
    // re-prints its stored build plan): start from a clean cache
    spark.sharedState.cacheManager.clearCache()
    for ((name, df, budget) <- Seq(
        // corpus scan + one anchor-keyed agg exchange + presentation
        // sort; textual count doubles under AQE re-prints (executed: 2)
        ("contrastive_triplets", Similarity.contrastiveTriplets(spark, sf), 4),
        // one key window + one-row aggregate
        ("cdc_compact_audit", Cdc.cdcCompactAudit(spark, sf), 4),
        // one corpus (fp,source) agg feeds everything; the PERSISTED
        // sufficient-statistic table is referenced 4× (cls, corr,
        // perSrc, totals) and the post-collect textual plan re-prints
        // its build exchanges under every InMemoryTableScan (the
        // seq_patterns precedent) — executed shuffles ≈ 8
        ("loo_source_impact",
          graft.operators.Sampling.looSourceImpact(spark, sf), 33),
        // one corpus agg to the ≤300-value lag grid + target-keyed
        // window/agg + output sort (AQE re-prints inflate post-collect)
        ("cdc_lag_report", Cdc.cdcLagReport(spark, sf), 6),
        // edge pass + degree agg + grid window/agg; the PERSISTED grid
        // is referenced by both the α-totals and KS branches and the
        // post-collect textual plan re-prints its whole build (edge
        // pass included) under every InMemoryTableScan — executed
        // shuffles ≈ 8 (seq_patterns precedent)
        ("graph_powerlaw_fit",
          graft.operators.Graph.graphPowerlawFit(spark, sf), 45),
        // one user-keyed agg + one global 1-row agg
        ("ab_cuped", graft.operators.Behavior.abCuped(spark, sf), 3),
        // single conditional-pivot global agg: one partial/final pair
        ("diff_in_diff", graft.operators.Behavior.diffInDiff(spark, sf), 2),
        // key agg + bucket-grid agg + grid window + output sort
        ("cdc_key_churn", Cdc.cdcKeyChurn(spark, sf), 5),
        // edge pass + degree agg + decorate joins + grid windows; the
        // persisted edge frame re-prints its build under each
        // InMemoryTableScan post-collect (seq_patterns precedent)
        ("graph_richclub", graft.operators.Graph.graphRichclub(spark, sf), 68),
        // means agg + broadcast-joined z agg + 1-row global agg
        ("levene_test", graft.operators.Stats.leveneTest(spark, sf), 4),
        // (type, day) agg + per-type series agg + output sort (AQE
        // re-prints post-collect)
        ("holt_winters", graft.operators.TimeSeries2.holtWinters(spark, sf), 6),
        // replicate agg + point agg + 40-row grid windows/aggs
        ("bootstrap_ci", graft.operators.Stats.bootstrapCi(spark, sf), 10),
        // ONE bucket-count agg over the persisted sigs (5 configs
        // union) + config-grid agg + sort; persisted-sig re-prints
        ("minhash_band_sweep",
          graft.operators.Dedup.minhashBandSweep(spark, sf), 14),
        // user agg → stratum grid aggs (matched + unmatched branches)
        ("cem_att", graft.operators.Behavior.cemAtt(spark, sf), 8),
        // keyed-docs + distinct-text class persists: the class
        // subtree re-prints under each of the 4 caught branches × 2
        // block joins post-collect (textual inflation; executed
        // exchanges are the cached handful — seq_patterns precedent)
        // (persisted cross carries the classes subtree twice in its
        // stored build plan, re-printed under each scheme branch —
        // measured executed time 1.3s at sf1, the textual count is
        // pure print inflation)
        ("er_blocking_sweep",
          graft.operators.Dedup.erBlockingSweep(spark, sf), 170),
        // profile agg + moments agg + broadcast-scored scan + sort
        ("anomaly_seasonal",
          graft.operators.Profile.anomalySeasonal(spark, sf), 8),
        // one corpus agg to the source grid + grid windows + sort
        ("neyman_allocation",
          graft.operators.Sampling.neymanAllocation(spark, sf), 8),
        // hour-grid agg + grid×freq term agg + TakeOrdered
        ("periodogram_topk",
          graft.operators.TimeSeries2.periodogramTopk(spark, sf), 12),
        // token explode → (tok,doc) agg → vocab agg → TakeOrdered
        ("token_burstiness",
          graft.operators.TextModel.tokenBurstiness(spark, sf), 6),
        // eager op: the (source,tok) prob table persists once, the
        // pair join + grid aggs run inside the call, and the returned
        // frame is the materialized |S|² matrix (cache released)
        ("source_jsd_matrix",
          graft.operators.TextModel.sourceJsdMatrix(spark, sf), 0))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val n = "ShuffleExchange|Exchange hashpartitioning|Exchange rangepartitioning".r
        .findAllIn(plan).length
      info(s"$name shuffles = $n (budget $budget)")
      assert(n <= budget, s"$name exceeded its shuffle budget: $n > $budget")
    }
  }
}
