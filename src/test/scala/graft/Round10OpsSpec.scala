package graft

import org.apache.spark.sql.functions._

/** Driver-side exact replays and invariant checks for the round-10
  * additions. Each test recomputes the operator's answer brute-force
  * from the raw parquet (collect at sf0.001) and compares against the
  * distributed result, or asserts the operator's defining mathematical
  * property (CM never undercounts, bloom has no false negatives, no
  * PII pattern survives scrubbing, conformal coverage tracks target).
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  private def toks(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("pca_projection: scores replay from the model and are the true top-|score| set") {
    val m = graft.operators.Embeddings.pcaModel(spark, sf)
    val d = m.v7.length
    val s0 = (0 until d).map(j => BigInt(m.sJ(j)) * m.v7(j)).sum
    val embs = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val all = embs.map { case (id, e) =>
      val qv = e.map(x => math.round(x.toDouble * 10000d))
      val dot = (0 until d).map(j => BigInt(qv(j)) * m.v7(j)).sum
      (id, (BigInt(m.n) * dot - s0).toLong)
    }
    val expected = all.sortBy { case (id, s) => (-math.abs(s), id) }.take(50)
    val got = graft.operators.Embeddings.pcaProjection(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq === expected.toSeq)
    // the rounded unit-scale score matches its integer source
    val rows = graft.operators.Embeddings.pcaProjection(spark, sf).collect()
    for (r <- rows) {
      val exp = BigDecimal(r.getLong(2).toDouble / m.n.toDouble / 10000.0
        / math.sqrt(m.den.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) === exp, s"score mismatch for vec ${r.getLong(0)}")
    }
  }

  test("stl_decompose: additive identity and brute-force trend/seasonal replay") {
    val out = graft.operators.TimeSeries2.stlDecompose(spark, sf).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (v, t, s, res) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(math.abs(v - (t + s + res)) < 1e-9, s"additivity at ${r.get(0)}/${r.get(1)}")
    }
    // brute-force: rebuild the daily grid and the 7-day MA for one type
    val daily = graft.sources.Tables.events(spark, sf)
      .select($"event_type", floor(unix_timestamp($"ts") / 86400L).cast("long").as("d"),
        $"value")
      .groupBy($"event_type", $"d")
      .agg((sum(round($"value", 4).cast("decimal(18,4)")) * 10000)
        .cast("decimal(38,0)").cast("long").as("x"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val types = daily.keys.map(_._1).toSeq.distinct.sorted
    val expect = scala.collection.mutable.Map[(String, Long), (Long, Long)]()
    for (et <- types) {
      val days = daily.keys.filter(_._1 == et).map(_._2).toSeq.sorted
      val trends = for {
        (day, idx) <- days.zipWithIndex
        if idx >= 3 && idx + 3 < days.length
        win = days.slice(idx - 3, idx + 4)
        if win.last - win.head == 6
      } yield day -> win.map(dd => daily((et, dd))).sum / 7
      val tMap = trends.toMap
      val byDow = trends.groupBy(_._1 % 7)
      val sMap = byDow.map { case (dow, xs) =>
        dow -> xs.map { case (day, t) => daily((et, day)) - t }.sum / xs.length
      }
      trends.foreach { case (day, t) =>
        expect((et, day)) = (t, sMap(day % 7))
      }
    }
    assert(out.length == expect.size)
    for (r <- out) {
      val (t, s) = expect((r.getString(0), r.getLong(1)))
      assert(r.getDouble(3) == BigDecimal(t.toDouble / 10000)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getDouble(4) == BigDecimal(s.toDouble / 10000)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("conformal_calibration: threshold is the k-th smallest cal score; coverage tracks target") {
    val out = graft.operators.Sampling.conformalCalibration(spark, sf).collect()
    assert(out.length == 3)
    val scored = graft.operators.TextAnalysis.textQuality(spark, sf)
      .select($"doc_id", $"quality_score").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6)))
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (cal, eval) = scored.partition { case (id, _) =>
      md5hex(s"conf:$id:${docs(id)}").head < '4'
    }
    val calSorted = cal.map(_._2).sorted
    for (r <- out) {
      val alpha = r.getLong(0)
      val k = math.max(alpha * (cal.length + 1) / 100, 1L)
      assert(r.getLong(1) == k, s"k at alpha=$alpha")
      val tau = calSorted(k.toInt - 1)
      assert(math.round(r.getDouble(3) * 1e6) == tau, s"threshold at alpha=$alpha")
      val covered = eval.count(_._2 >= tau).toLong
      assert(r.getLong(5) == covered, s"covered at alpha=$alpha")
      // distribution-free guarantee holds up to finite-sample noise
      assert(r.getDouble(6) > r.getDouble(7) - 0.08,
        s"coverage ${r.getDouble(6)} far below target ${r.getDouble(7)}")
    }
  }

  test("gumbel_sample: exact brute-force replay and weight bias") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), toks(r.getString(1)).length.toLong max 1L))
    val keys = docs.map { case (id, w) =>
      val h48 = math.max(
        java.lang.Long.parseLong(md5hex(s"gum:$id").take(12), 16), 1L)
      val u = h48.toDouble / 281474976710656.0
      (id, w, math.round((math.log(w.toDouble) - math.log(-math.log(u))) * 1e6))
    }
    val expected = keys.sortBy { case (id, _, k) => (-k, id) }.take(64)
      .map { case (id, w, k) => (id, w, k) }
    val got = graft.operators.Sampling.gumbelSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected.toSeq)
    // weighting bias: the weighted sample's mean weight exceeds the corpus mean
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    val sampleMean = got.map(_._2).sum.toDouble / got.length
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("countmin_topk: estimates never undercount and replay from exact counters") {
    val counts = graft.sources.Tables.lineitem(spark, sf)
      .groupBy($"l_partkey").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def bucket(dep: Int, pk: Long): Long =
      java.lang.Long.parseLong(md5hex(s"cm$dep:$pk").take(2), 16)
    val counters = scala.collection.mutable.Map[(Int, Long), Long]().withDefaultValue(0L)
    for ((pk, n) <- counts; d <- 0 until 4) counters((d, bucket(d, pk))) += n
    val top = counts.sortBy { case (pk, n) => (-n, pk) }.take(20)
    val expected = top.map { case (pk, n) =>
      (pk, n, (0 until 4).map(d => counters((d, bucket(d, pk)))).min)
    }
    val got = graft.operators.Profile.countminTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === expected.toSeq)
    for ((_, n, est) <- got) assert(est >= n, "Count-Min must never undercount")
  }

  test("bloom_fp_audit: no false negatives, bit math replays, theory sane") {
    val out = graft.operators.RuntimeFilter.bloomFpAudit(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val keys = graft.sources.Tables.customer(spark, sf)
      .select($"c_custkey").distinct().collect().map(_.getLong(0))
    def bit(j: Int, k: Long): Long =
      java.lang.Long.parseLong(md5hex(s"bf$j:$k").take(4), 16) % 65536
    val bits = (for (k <- keys; j <- 0 until 3) yield (j, bit(j, k))).toSet
    assert(r.getLong(1) == bits.size.toLong, "bits_set replay")
    // no false negatives: every true key passes its own filter
    for (k <- keys.take(200))
      assert((0 until 3).forall(j => bits((j, bit(j, k)))))
    // measured FP replay over the same probe range
    val mx = keys.max
    val fp = (1L to 5000L).count { i =>
      (0 until 3).forall(j => bits((j, bit(j, mx + i))))
    }.toLong
    assert(r.getLong(3) == fp, "false_positives replay")
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) < 1.0)
  }

  test("ann_ndcg: brute-force ADC-ranking NDCG replay and bounds") {
    val corpus = graft.operators.Training.quantizedOf(
        graft.sources.Tables.embeddings(spark, sf)).filter($"vec_id" >= 8)
    val books = graft.operators.AnnExact.pqLloydL(corpus, "vq", 32, 3)
    val vq = graft.operators.Training.quantizedOf(
        graft.sources.Tables.embeddings(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val (qs, cs) = vq.partition(_._1 < 8)
    val subs = 8; val subDim = 8
    def encode(v: Array[Long]): Array[Int] = Array.tabulate(subs) { s =>
      var best = Long.MaxValue; var bi = 0
      for (c <- 0 until 32) {
        var d2 = 0L
        for (d <- 0 until subDim) {
          val diff = v(s * subDim + d) - books(s)(c)(d); d2 += diff * diff
        }
        if (d2 < best) { best = d2; bi = c }
      }
      bi
    }
    val codes = cs.map { case (id, v) => id -> encode(v) }
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val w = (1 to 10).map(p => p -> math.round(1e6 * math.log(2.0) / math.log(p + 1.0))).toMap
    val idcg = (1 to 10).map(p => (11 - p) * w(p)).sum
    val expected = qs.toSeq.sortBy(_._1).map { case (qid, qv) =>
      // distance table: per (sub, code) d2 of the query subvector
      val dtab = Array.tabulate(subs, 32)((s, c) =>
        d2(qv.slice(s * subDim, (s + 1) * subDim), books(s)(c)))
      val adcRank = codes.toSeq.map { case (nid, cd) =>
        (nid, (0 until subs).map(s => dtab(s)(cd(s))).sum)
      }.sortBy { case (nid, a) => (a, nid) }.take(10).map(_._1)
      val truthRel = cs.toSeq.map { case (nid, nv) => (nid, d2(qv, nv)) }
        .sortBy { case (nid, dd) => (dd, nid) }.take(10).zipWithIndex
        .map { case ((nid, _), i) => nid -> (10L - i) }.toMap
      val dcg = adcRank.zipWithIndex.map { case (nid, i) =>
        truthRel.getOrElse(nid, 0L) * w(i + 1)
      }.sum
      (qid, dcg, idcg, dcg * 1000000L / idcg)
    }
    val got = graft.operators.AnnExact.annNdcg(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected)
    for ((_, _, _, nd) <- got) assert(nd >= 0L && nd <= 1000000L, "NDCG in [0,1]")
  }

  test("dup_components: union-find replay over the minhash pair graph") {
    val pairs = graft.operators.Dedup.dedupMinhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((i, j) <- pairs) {
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val sizes = members.groupBy(find).map(_._2.length.toLong)
    val expected = sizes.groupBy(identity).map { case (sz, g) =>
      (sz, g.size.toLong, sz * g.size, (sz - 1) * g.size)
    }.toSeq.sortBy(_._1)
    val got = graft.operators.Dedup.dupComponents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    // conservation: docs in clusters = distinct docs in the pair graph
    assert(got.map(_._3).sum == members.length.toLong)
  }

  test("stream_pii_gate: streaming output equals the batch piiFlags") {
    val stream = graft.streaming.StreamQueries.streamPiiGate(spark, sf)
      .collect().toSeq
    val batch = graft.operators.TextAnalysis
      .piiFlags(graft.sources.Tables.documents(spark, sf))
      .orderBy($"doc_id").collect().toSeq
    assert(stream === batch)
    assert(stream.exists(_.getAs[Long]("n_email") > 0),
      "fixture must exercise the email path")
  }

  test("dedup_rate_curve: brute-force threshold replay; curve is monotone") {
    val pairs = graft.operators.Dedup.dedupMinhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    val expected = Seq(50L, 60L, 70L, 80L, 90L).map { t =>
      val hit = pairs.filter(_._3 >= t)
      (t, hit.length.toLong,
        hit.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong)
    }
    val got = graft.operators.Dedup.dedupRateCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // tightening the threshold can only shrink the surviving set
    assert(got.map(_._2) == got.map(_._2).sorted.reverse, "pairs monotone")
    assert(got.map(_._3) == got.map(_._3).sorted.reverse, "docs monotone")
  }

  test("stream_conformal_gate: streaming flags equal the batch threshold decision") {
    val out = graft.streaming.StreamQueries.streamConformalGate(spark, sf)
      .collect().toSeq
    val tau = graft.operators.Sampling.conformalCalibration(spark, sf)
      .filter($"alpha_pct" === 10L).collect().head.getDouble(3)
    val tauMicro = math.round(tau * 1e6)
    val batch = graft.operators.TextAnalysis.textQuality(spark, sf)
      .select($"doc_id", round($"quality_score" * 1000000d, 0).cast("long").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(1) >= tauMicro))
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
      === batch.toSeq.sortBy(_._1))
    // the gate keeps roughly 1-alpha of the corpus (finite-sample slack)
    val keepRate = out.count(_.getBoolean(2)).toDouble / out.length
    assert(keepRate > 0.8 && keepRate <= 1.0, s"keep rate $keepRate")
  }

  test("pii_scrub: no pattern survives scrubbing; per-source counts replay") {
    val out = graft.operators.TextAnalysis.piiScrub(spark, sf).collect()
    assert(out.map(_.getLong(2)).sum > 0, "fixture must plant emails")
    assert(out.map(_.getLong(3)).sum > 0, "fixture must plant IPs")
    assert(out.map(_.getLong(4)).sum > 0, "fixture must plant digit runs")
    // rebuild the planted corpus and scrub on the driver with
    // java.util.regex — counts and the checksum must match, and the
    // scrubbed text must be pattern-free
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val num = "\\b\\d{7,}\\b"
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val agg = scala.collection.mutable.Map[String, (Long, Long, Long, Long, Long, Long)]()
    for ((id, src, text) <- docs) {
      var raw = text
      if (id % 7 == 0) raw += s" contact user$id@mail${id % 5}.example.com"
      if (id % 11 == 0) raw += s" from 10.${id % 256}.${id % 100}.7"
      if (id % 13 == 0) raw += " ref " + "%09d".format(id % 1000000)
      val ne = email.r.findAllIn(raw).length.toLong
      val s1 = raw.replaceAll(email, "<EMAIL>")
      val ni = ip.r.findAllIn(s1).length.toLong
      val s2 = s1.replaceAll(ip, "<IP>")
      val nn = num.r.findAllIn(s2).length.toLong
      val s3 = s2.replaceAll(num, "<NUM>")
      assert(email.r.findFirstIn(s3).isEmpty && ip.r.findFirstIn(s3).isEmpty
        && num.r.findFirstIn(s3).isEmpty, s"PII survives scrub in doc $id")
      val ck = java.lang.Long.parseLong(md5hex(s3).take(4), 16)
      val (a, b, c, d, e, f) = agg.getOrElse(src, (0L, 0L, 0L, 0L, 0L, 0L))
      agg(src) = (a + 1, b + (if (ne > 0) 1L else 0L), c + (if (ni > 0) 1L else 0L),
        d + (if (nn > 0) 1L else 0L), e + ne + ni + nn, f + ck)
    }
    for (r <- out) {
      val e = agg(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)) === e, s"source ${r.getString(0)}")
    }
  }
}
