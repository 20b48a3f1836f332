package graft

import org.apache.spark.sql.functions._

/** Author-side evidence for the round-13 changes, beyond the DuckDB
  * hash gate: the incremental-IVF lossless-merge equivalence (the
  * minhash old-∪-incremental ≡ full contract, vector edition) and the
  * watermark-eviction contract of the re-expressed streaming gates
  * (state bounded by ACTIVE windows, each window emitted exactly once).
  */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  test("ann_ivf_incr: frozen-centroid merge is lossless — old ∪ incr ≡ full") {
    import graft.operators.Training
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val cut = emb.agg(expr("max(vec_id) div 2")).first().getLong(0)
    val all = Training.quantizedOf(emb).filter($"vec_id" >= 8)
    val old = all.filter($"vec_id" <= cut).persist()
    val batch = all.filter($"vec_id" > cut)
    val cents = Training.lloydCentroids(old, 8, 3) // the op's frozen model
    def asg(df: org.apache.spark.sql.DataFrame) =
      Training.assign(df, cents)
        .select($"vec_id", $"cluster", $"d2")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // per-row assignment against frozen literals ⇒ assigning old and
    // batch separately and unioning is EXACTLY a single full-corpus
    // assignment pass — the inverted-index merge loses nothing
    assert((asg(old) union asg(batch)) === asg(all),
      "old ∪ incremental assignment must equal the one-pass full assignment")

    // the op's merge receipt agrees: n_old + n_new per cluster equals
    // the full one-pass occupancy, and its batch rows are exactly the
    // batch's frozen-centroid assignments
    val out = graft.operators.AnnExact.annIvfIncr(spark, sf).collect()
    assert(out.nonEmpty)
    val batchAsg = asg(batch)
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet === batchAsg,
      "output rows must be the batch's frozen-centroid assignments")
    val fullOcc = asg(all).groupBy(_._2).view.mapValues(_.size.toLong).toMap
    out.groupBy(_.getInt(1)).foreach { case (c, rows) =>
      val nOld = rows.head.getLong(3)
      val nNew = rows.head.getLong(4)
      assert(nNew === rows.length.toLong, "n_new must count the batch rows in the cluster")
      assert(nOld + nNew === fullOcc(c),
        s"cluster $c: merged occupancy $nOld+$nNew != full ${fullOcc(c)}")
    }
    old.unpersist()
  }

  test("append-mode gates: state is evicted mid-stream, each window emits exactly once") {
    // drive the re-expressed gates with a progress listener: the max
    // in-flight state must sit strictly below the total emitted window
    // count (the complete-mode shape held ALL windows in state), and
    // the sink must hold exactly one row per window — emit-once, no
    // per-batch re-emission
    final class Peak extends org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      @volatile var maxState = 0L
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        // suites share one session: scope to THIS op's query name so a
        // concurrently-running suite's stream can't pollute the peak
        if (Option(e.progress.name).exists(_.startsWith("sq_window_agg"))) {
          val s = e.progress.stateOperators.map(_.numRowsTotal).sum
          if (s > maxState) maxState = s
        }
    }
    val peak = new Peak
    spark.streams.addListener(peak)
    try {
      val out = graft.streaming.StreamQueries.streamWindowAgg(spark, sf).collect()
      val windows = out.map(r => (r.getString(0), r.getString(1))).toSet
      assert(windows.size === out.length,
        "append sink must hold exactly one row per (hour, type) window")
      assert(peak.maxState > 0, "listener saw no stateful progress")
      assert(peak.maxState < windows.size,
        s"max in-flight state ${peak.maxState} not below total windows " +
          s"${windows.size} — watermark eviction is not happening")
    } finally spark.streams.removeListener(peak)
  }

  test("semdedup_paragraph: catches a PERMUTED paragraph the lexical shingle pass misses") {
    import org.apache.spark.sql.functions._
    // plant: doc A carries a 32-token paragraph; doc B the SAME tokens
    // REVERSED. Reversal shares zero 3-gram shingles (dedup_paragraph's
    // signal) but has bag-of-terms cosine exactly 1.0 (this op's
    // signal) — the complementarity that motivates the operator.
    val toks = (0 until 32).map(i => f"zzperm$i%02d")
    val base = spark.read.parquet(s"$sf/documents.parquet")
    val hi = base.agg(max($"doc_id")).first().getLong(0)
    val planted = Seq(
      (hi + 10, toks.mkString(" ")),
      (hi + 20, toks.reverse.mkString(" ")))
      .toDF("doc_id", "text")
    val one = base.limit(1).collect()(0)
    val cols = base.columns
    val extra = planted.select(cols.map {
      case "doc_id" => $"doc_id"
      case "text"   => $"text"
      case c        => lit(one.get(base.schema.fieldIndex(c))).as(c)
    }.toIndexedSeq: _*)
    val d = java.nio.file.Files.createTempDirectory("spp_plant").toString
    base.select(cols.map(col).toIndexedSeq: _*).unionAll(extra)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val sem = graft.operators.Dedup.semdedupParagraph(spark, d)
      .filter($"doc_id" > hi).collect()
    val lex = graft.operators.Dedup.dedupParagraph(spark, d)
      .filter($"doc_id" > hi).collect()
    val semB = sem.find(_.getLong(0) == hi + 20).get
    assert(semB.getLong(2) >= 1L,
      "the permuted twin must be flagged as a semantic dup (cosine 1.0)")
    val lexB = lex.find(_.getLong(0) == hi + 20).get
    assert(lexB.getLong(2) === 0L,
      "the reversed paragraph shares no 3-gram shingles — the lexical " +
        "pass must NOT flag it (else this op adds nothing)")
    // sanity on the real corpus: non-degenerate and mass-consistent
    val all = graft.operators.Dedup.semdedupParagraph(spark, sf).collect()
    val flagged = all.map(_.getLong(2)).sum
    val paras = all.map(_.getInt(1).toLong).sum
    assert(flagged > 0 && flagged < paras,
      s"degenerate flag rate: $flagged of $paras")
    all.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3), "dup token mass exceeds total")
      assert(r.getLong(2) <= r.getInt(1), "dup paras exceed paras")
    }
  }

  test("drift_retrain_gate: breach rule, threshold only moves after a breach, initial tau") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.Sampling.driftRetrainGate(spark, sf)
      .orderBy($"w").collect()
    assert(out.length > 2, "need a multi-window trajectory")
    // breach rule is recomputable from the output alone
    val n = out.length.toLong
    val tot = out.map(_.getLong(3)).sum
    out.foreach { r =>
      assert(r.getBoolean(5) === (r.getLong(3) * 4 * n > tot * 5),
        s"window ${r.getLong(0)}: breached flag disagrees with the 1.25x-mean rule")
    }
    // the closed loop: the in-force threshold may CHANGE between w and
    // w+1 only when w breached (a breach re-derives the literal; quiet
    // windows must keep it)
    out.sliding(2).foreach { case Array(a, b) =>
      if (!a.getBoolean(5))
        assert(a.getLong(6) === b.getLong(6),
          s"threshold moved after quiet window ${a.getLong(0)}")
    }
    assert(out.exists(_.getBoolean(5)), "no breach — the retrain path never exercised")
    assert(out.map(_.getLong(6)).distinct.length > 1,
      "threshold never moved — the retrain path never exercised")
    // window 0 admits at the whole-corpus alpha=10% calibration
    val tau0 = graft.operators.Sampling.conformalCalibration(spark, sf)
      .filter($"alpha_pct" === 10L)
      .select(round($"threshold" * 1000000d, 0).cast("long")).first().getLong(0)
    assert(out.head.getLong(6) === tau0,
      "window 0 must run under the initial conformal calibration")
  }

  test("stream_quota_gate append mode: emit-once per window, quota arithmetic intact") {
    val out = graft.streaming.StreamQueries.streamQuotaGate(spark, sf).collect()
    val k = graft.streaming.StreamQueries.QuotaPerWindow
    val perWindow = out.groupBy(r => (r.getString(0), r.getString(1)))
    perWindow.foreach { case ((h, t), rows) =>
      assert(rows.length <= k, s"($h,$t): more than $k admit rows")
      assert(rows.map(_.getLong(4)).sorted.sameElements(1L to rows.length),
        s"($h,$t): admit ranks must be 1..n with no duplicates (emit-once)")
      assert(rows.map(_.getLong(2)).distinct.length === 1,
        s"($h,$t): n_total must be the window's FINAL count in every row")
    }
    assert(!out.exists(_.getString(1) == "__flush"),
      "sentinel windows must never reach the readback")
  }
}
