package graft

import graft.operators.{DataQuality, Filters, Sampling}
import org.apache.spark.sql.functions._

/** Driver-side brute-force replays for the round-7 selection/privacy
  * batch beyond the DuckDB hash gate: DSIR weights re-derived from
  * first principles (MessageDigest md5 + math.log), k-anonymity
  * invariants, and the sliding-window substring dedup replayed with a
  * plain Scala interval merge.
  */
class SelectionPrivacySpec extends SparkSpec {
  import spark.implicits._

  private def md5hex2(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(1).map(b => f"$b%02x").mkString

  test("dsir_weights: exact brute-force replay of the importance weights") {
    val rows = Sampling.dsirWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // bucket counts per doc
    val docBuckets = docs.map { case (id, lang, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      (id, lang, toks.groupBy(md5hex2).view.mapValues(_.length.toLong).toMap)
    }
    val raw = docBuckets.flatMap(_._3).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    val tgt = docBuckets.filter(_._2 == "en").flatMap(_._3).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    val rtot = raw.values.sum
    val ttot = tgt.values.sum
    val lnr = raw.keys.map { b =>
      b -> math.rint(math.log(
        ((tgt.getOrElse(b, 0L) + 1).toDouble * (rtot + 256).toDouble)
          / ((raw(b) + 1).toDouble * (ttot + 256).toDouble)) * 1e6).toLong
    }.toMap
    docBuckets.foreach { case (id, _, counts) =>
      val expected = counts.map { case (b, c) => c * lnr(b) }.sum
      assert(rows(id).getAs[Long]("dsir_micro") === expected, s"doc $id")
      val n = counts.values.sum
      assert(rows(id).getAs[Long]("n_tokens") === n, s"doc $id tokens")
      val perTok = Math.floorDiv(expected, n)
      assert(rows(id).getAs[Long]("dsir_per_token_micro") === perTok)
      assert(rows(id).getAs[Boolean]("selected") === (perTok > 0))
    }
    // the target language must skew positive relative to the rest —
    // otherwise the weights carry no signal and selection is vacuous
    val (en, rest) = rows.values.partition(_.getAs[String]("lang") == "en")
    def meanPt(rs: Iterable[org.apache.spark.sql.Row]): Double =
      rs.map(_.getAs[Long]("dsir_per_token_micro").toDouble).sum / rs.size
    assert(meanPt(en) > meanPt(rest),
      "mean per-token DSIR weight of target-language docs must exceed the rest")
    assert(en.exists(_.getAs[Boolean]("selected")), "some en doc selected")
  }

  test("dsir literal-model fold equals the distributed groupBy path bit-for-bit") {
    // operator interchangeability: the per-row scoring map the
    // streaming gate uses must equal the batch explode+groupBy result
    val docs = graft.sources.Tables.documents(spark, sf)
    val model = Sampling.dsirModelOf(docs)
    assert(model.nonEmpty && model.size <= 256)
    val folded = Sampling.dsirScore(docs, model)
      .orderBy($"doc_id").collect().map(_.toSeq)
    val grouped = Sampling.dsirWeights(spark, sf).collect().map(_.toSeq)
    assert(folded.toSeq === grouped.toSeq)
  }

  test("k_anonymity: class partition invariants and the global readout") {
    val rows = DataQuality.kAnonymity(spark, sf).collect()
    val cust = graft.sources.Tables.customer(spark, sf)
      .select($"c_nationkey", $"c_mktsegment", $"c_acctbal").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(rows.map(_.getAs[Long]("class_size")).sum === cust.length,
      "classes partition the table")
    assert(rows.length === cust.map(c => (c._1, c._2)).distinct.length)
    val k = rows.map(_.getAs[Long]("class_size")).min
    assert(rows.forall(_.getAs[Long]("k_anonymity") === k))
    val riskyRows = rows.filter(_.getAs[Boolean]("is_risky"))
      .map(_.getAs[Long]("class_size")).sum
    val shareMicro = Math.floorDiv(riskyRows * 1000000L, cust.length.toLong)
    assert(rows.forall(_.getAs[Long]("risky_share_micro") === shareMicro))
    // l-diversity: replay one class's distinct band count
    val (hn, hs) = (rows.head.getAs[Int]("c_nationkey"),
      rows.head.getAs[String]("c_mktsegment"))
    val bands = cust.filter(c => c._1 == hn && c._2 == hs)
      .map(c => Math.floorDiv(math.rint(c._3 * 100).toLong, 100000L)).distinct
    assert(rows.head.getAs[Int]("l_diversity") === bands.length)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_risky") === (r.getAs[Long]("class_size") < 10))
      assert(r.getAs[Int]("l_diversity") >= 1)
    }
  }

  test("dp_release: deterministic Laplace replay and exact released counts") {
    val rows = DataQuality.dpRelease(spark, sf).collect()
    val trueCounts = graft.sources.Tables.customer(spark, sf)
      .groupBy($"c_nationkey", $"c_mktsegment").count().collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val key = s"${r.getAs[Int]("c_nationkey")}:${r.getAs[String]("c_mktsegment")}"
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).take(6).map(b => f"$b%02x").mkString
      val h = java.lang.Long.parseLong(hex, 16)
      val u = (h.toDouble + 0.5) / math.pow(2, 48)
      val lnMicro = math.rint(math.log(1.0 - 2.0 * math.abs(u - 0.5)) * 1e6).toLong
      val noise = if (u >= 0.5) -lnMicro else lnMicro
      assert(r.getAs[Long]("noise_micro") === noise, s"class $key")
      val t = trueCounts((r.getAs[Int]("c_nationkey"), r.getAs[String]("c_mktsegment")))
      assert(r.getAs[Long]("true_count") === t)
      assert(r.getAs[Long]("released_micro") === t * 1000000L + noise)
    }
    // Laplace(1) noise: essentially all mass within ±14 micro-millions
    assert(rows.forall(r => math.abs(r.getAs[Long]("noise_micro")) < 14000000L))
    // both signs must occur or the mechanism is degenerate
    assert(rows.exists(_.getAs[Long]("noise_micro") > 0)
      && rows.exists(_.getAs[Long]("noise_micro") < 0))
  }

  test("curriculum_order: stage thresholds, budgets, and schedule monotonicity") {
    val rows = Sampling.curriculumOrder(spark, sf).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.length === nDocs)
    rows.foreach { r =>
      val st = r.getAs[Int]("stage")
      val n = r.getAs[Long]("n_tokens")
      assert(st === math.min(3L, n / 48).toInt, s"doc ${r.getLong(0)}")
    }
    // stage budgets are the exact per-stage sums
    val byStage = rows.groupBy(_.getAs[Int]("stage"))
    byStage.foreach { case (_, g) =>
      assert(g.forall(_.getAs[Long]("stage_docs") === g.length))
      assert(g.forall(_.getAs[Long]("stage_tokens") === g.map(_.getAs[Long]("n_tokens")).sum))
    }
    assert(byStage.size >= 2, "curriculum must have more than one populated stage")
    // the emitted order IS the schedule: stages ascend, keys ascend within
    val stages = rows.map(_.getAs[Int]("stage"))
    assert(stages.sameElements(stages.sorted))
    byStage.foreach { case (_, g) =>
      val keys = g.map(_.getAs[String]("order_key"))
      assert(keys.sameElements(keys.sorted))
    }
  }

  test("dedup_substring: brute-force sliding-window replay with interval merge") {
    val rows = Filters.dedupSubstring(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").filter(_.nonEmpty))
    // corpus-global first-occurrence keeper per window text
    val wins = docs.flatMap { case (id, toks) =>
      (0 to toks.length - 8).map(k => (toks.slice(k, k + 8).mkString(" "), id * 16384 + k, id, k))
    }
    val keeper = wins.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val dupByDoc = wins.filter(w => w._2 > keeper(w._1))
      .groupBy(_._3).view.mapValues(_.map(_._4).toSeq.sorted).toMap
    docs.foreach { case (id, toks) =>
      val r = rows(id)
      assert(r.getAs[Int]("n_tokens") === toks.length)
      assert(r.getAs[Int]("n_windows") === math.max(toks.length - 7, 0))
      val ks = dupByDoc.getOrElse(id, Seq.empty)
      assert(r.getAs[Long]("n_dup_windows") === ks.length, s"doc $id dup windows")
      // merge overlapping/adjacent [k, k+7] runs
      var mass = 0L
      var runStart = -100
      var prev = -100
      for (k <- ks) {
        if (k > prev + 8) { // new run
          if (runStart >= 0) mass += prev - runStart + 8
          runStart = k
        }
        prev = k
      }
      if (runStart >= 0) mass += prev - runStart + 8
      assert(r.getAs[Long]("dup_token_mass") === mass, s"doc $id mass")
      assert(mass <= toks.length, s"doc $id mass bounded by doc length")
    }
    // sliding must dominate the disjoint grid: any span the grid marks
    // duplicated is covered by sliding windows too, so corpus-wide
    // duplicated mass can only grow
    val grid = Filters.spanDedup(spark, sf).agg(sum($"tokens_lost")).collect().head.getLong(0)
    val slide = rows.values.map(_.getAs[Long]("dup_token_mass")).sum
    assert(slide >= grid, s"sliding dup mass $slide must dominate grid tokens_lost $grid")
  }
}
