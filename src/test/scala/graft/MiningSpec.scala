package graft

import graft.operators.{Behavior, Similarity, Training}
import org.apache.spark.sql.functions._

/** Semantic checks for the round-7 mining batch (coreset_kcenter,
  * bitext_mine, seq_patterns) beyond the DuckDB hash gate: the greedy
  * k-center invariants, the margin-mining side/ordering contract, and
  * an INDEPENDENT recomputation of sequential-pattern support from raw
  * event pairs (the min/max-timestamp reduction must equal the
  * existential definition it replaces).
  */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------------
  // coreset_kcenter
  // ----------------------------------------------------------------

  test("coreset_kcenter: k distinct points, nonincreasing gaps, covering radius") {
    val sel = Training.coresetKcenter(spark, sf).collect()
    assert(sel.length === Training.CoresetK)
    assert(sel.map(_.getLong(1)).distinct.length === sel.length,
      "selected vec_ids must be distinct")
    val gaps = sel.sortBy(_.getInt(0)).map(_.getLong(2))
    assert(gaps.head === 0L, "seed gap is 0 by definition")
    // Gonzalez invariant: each pick is the farthest remaining point, so
    // the selection gaps are nonincreasing from rank 2 on
    for (i <- 2 until gaps.length)
      assert(gaps(i) <= gaps(i - 1),
        s"gap sequence must be nonincreasing, got ${gaps.mkString(",")}")
    // covering property: after k picks, EVERY corpus point lies within
    // the last gap of the selected set (else it would have been picked)
    val centers = graft.sources.Tables.embeddings(spark, sf)
      .filter($"vec_id".isin(sel.map(_.getLong(1)).toSeq: _*))
      .select(transform($"embedding",
        x => round(x.cast("double") * 1000000d, 0).cast("long")).as("cq"))
      .collect().map(_.getSeq[Long](0).toArray)
    val md = array_min(array(centers.map { cv =>
      aggregate(zip_with(
        transform($"embedding", x => round(x.cast("double") * 1000000d, 0).cast("long")),
        typedlit(cv.toSeq), (a, b) => (a - b) * (a - b)), lit(0L), (a, x) => a + x)
    }.toIndexedSeq: _*))
    val radius = graft.sources.Tables.embeddings(spark, sf)
      .select(md.as("md")).agg(max($"md")).head.getLong(0)
    info(s"covering radius $radius vs last gap ${gaps.last}")
    assert(radius <= gaps.last,
      "a point farther than the last selection gap should have been selected")
  }

  test("coreset_kcenter is bit-deterministic across runs") {
    val a = Training.coresetKcenter(spark, sf).collect().toSeq
    val b = Training.coresetKcenter(spark, sf).collect().toSeq
    assert(a === b)
  }

  // ----------------------------------------------------------------
  // bitext_mine
  // ----------------------------------------------------------------

  test("bitext_mine: sides honored, margins positive and sorted, batch bound") {
    val out = Similarity.bitextMine(spark, sf).collect()
    assert(out.nonEmpty && out.length <= Similarity.BitextTopPairs)
    val lab = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (r <- out) {
      assert(lab(r.getLong(0)) <= 4, "src side must come from labels 0-4")
      assert(lab(r.getLong(1)) >= 5, "tgt side must come from labels 5-9")
      assert(r.getLong(3) > 0, "emitted margins are positive")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000000L,
        "squared cosine in micro-units stays in [0, 1e6]")
    }
    val margins = out.map(_.getLong(3))
    assert(margins.sameElements(margins.sortBy(-_)),
      "output is sorted by margin descending")
    val srcIds = out.map(_.getLong(0)).distinct
    assert(srcIds.length <= Similarity.BitextBatch)
  }

  test("bitext_mine is bit-deterministic across runs") {
    val a = Similarity.bitextMine(spark, sf).collect().toSeq
    val b = Similarity.bitextMine(spark, sf).collect().toSeq
    assert(a === b)
  }

  // ----------------------------------------------------------------
  // seq_patterns
  // ----------------------------------------------------------------

  test("seq_patterns: support matches the existential definition on raw event pairs") {
    val out = Behavior.seqPatterns(spark, sf).collect()
    assert(out.nonEmpty)
    // independent recomputation from RAW events (quadratic per user —
    // test-only): a user supports (a, b) iff SOME a-event precedes
    // SOME b-event. Restricting to a user sample keeps the pair join
    // tiny while still exercising every (a, b) cell.
    val ev = graft.sources.Tables.events(spark, sf)
      .filter($"user_id" % 7 === 0)
      .select($"user_id", $"event_type", $"ts").persist()
    val brute = ev.select($"user_id", $"event_type".as("type_a"), $"ts".as("ts_a"))
      .join(ev.select($"user_id", $"event_type".as("type_b"), $"ts".as("ts_b")), "user_id")
      .filter($"type_a" =!= $"type_b" && $"ts_a" < $"ts_b")
      .select($"user_id", $"type_a", $"type_b").distinct()
      .groupBy($"type_a", $"type_b").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    ev.unpersist()
    // the operator's own formulation restricted to the same user sample
    val perSample = graft.sources.Tables.events(spark, sf)
      .filter($"user_id" % 7 === 0)
      .groupBy($"user_id", $"event_type")
      .agg(min($"ts").as("first_ts"), max($"ts").as("last_ts"))
    val reduced = perSample.select($"user_id", $"event_type".as("type_a"), $"first_ts")
      .join(perSample.select($"user_id", $"event_type".as("type_b"), $"last_ts"), "user_id")
      .filter($"type_a" =!= $"type_b" && $"first_ts" < $"last_ts")
      .groupBy($"type_a", $"type_b").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(reduced === brute,
      "min/max-timestamp reduction must equal the existential pair definition")
    // structural invariants on the full output
    val reach = out.map(r => r.getString(0) -> r.getLong(3)).toMap
    for (r <- out) {
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)),
        "support cannot exceed either type's user reach")
      assert(r.getLong(5) > 0, "lift of an observed pair is positive")
    }
    assert(reach.nonEmpty)
  }

  // ----------------------------------------------------------------
  // label_noise_detect
  // ----------------------------------------------------------------

  test("label_noise_detect: near-silent on clean labels, recovers planted flips") {
    import graft.operators.Similarity
    // 1) clean-corpus specificity: the testdata labels carry no
    //    neighborhood geometry (exact kNN label agreement ~= chance),
    //    so a high-precision detector must stay near-silent on them
    val e = graft.sources.Tables.embeddings(spark, sf)
    val n = e.count()
    val clean = Similarity.labelNoiseDetect(spark, sf).collect()
    assert(clean.length <= n / 50,
      s"clean labels must yield <=2% flags, got ${clean.length} of $n")
    // 2) planted-noise recovery on a clustered fixture (the IvfSpec
    //    convention): 3 tight clusters around orthogonal centers,
    //    labels = cluster id, 5 labels flipped — the detector must flag
    //    exactly the flipped vectors and suggest their true cluster
    val dim = Similarity.EmbeddingDim
    val rows = for (i <- 0 until 60) yield {
      val c = i % 3
      val v = Array.tabulate(dim) { d =>
        val jitter = (((i * 31 + d * 7) % 11) - 5) * 0.002f
        (if (d == c) 1.0f else 0.0f) + jitter
      }
      val flipped = i < 5 // vec_ids 0-4 carry a wrong label
      (i.toLong, v, if (flipped) (c + 1) % 3 else c)
    }
    val fixture = spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelNoiseDetectOf(fixture).collect()
    val flagged = out.map(r => r.getLong(0) -> r.getInt(2)).toMap
    info(s"fixture flags: ${out.map(_.getLong(0)).mkString(",")}")
    for (i <- 0L until 5L)
      assert(flagged.get(i).contains((i % 3).toInt),
        s"flipped vector $i must be flagged with its true cluster suggested")
    assert(out.length === 5,
      s"no false positives on the cohesive fixture, got ${out.length}")
  }
}
