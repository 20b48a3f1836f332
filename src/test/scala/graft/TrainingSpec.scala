package graft

import graft.operators.Training
import org.apache.spark.sql.functions._

/** Semantic checks for the exact-integer training loops (kmeans_train,
  * quality_classifier, quality_classifier_score) beyond the DuckDB hash
  * gate: Lloyd's must IMPROVE the objective, the classifier must BEAT
  * chance, and both must be bit-deterministic across runs — the
  * properties that make a training loop a training loop, which a
  * single-run hash compare can't express.
  */
class TrainingSpec extends SparkSpec {
  import spark.implicits._

  private def nVecs: Long =
    graft.sources.Tables.embeddings(spark, sf).count()

  test("kmeans_train: k*d centroid rows, assignment partitions the corpus") {
    val out = Training.kmeansTrain(spark, sf).cache()
    assert(out.count() === 4L * 64L, "one row per (cluster, dim)")
    val sizes = out.filter($"dim" === 0).select($"cluster", $"n")
    assert(sizes.agg(sum($"n")).head.getLong(0) === nVecs,
      "cluster sizes must sum to the corpus size (a partition, not a cover)")
    // centroid components stay inside the quantized data range
    val range = graft.sources.Tables.embeddings(spark, sf)
      .select(posexplode($"embedding").as(Seq("d", "v")))
      .agg(min(round($"v".cast("double") * 1000000d, 0).cast("long")),
        max(round($"v".cast("double") * 1000000d, 0).cast("long"))).head
    val (lo, hi) = (range.getLong(0), range.getLong(1))
    assert(out.filter($"centroid_micro" < lo || $"centroid_micro" > hi)
      .count() === 0, "centroids are convex combinations: inside data range")
    out.unpersist()
  }

  test("kmeans_train: Lloyd iterations strictly reduce total inertia on this data") {
    def inertia(iters: Int): Long =
      Training.kmeansTrainK(spark, sf, k = 4, iters = iters)
        .filter($"dim" === 0)
        .agg(sum($"inertia_kilo")).head.getLong(0)
    val before = inertia(0)
    val after = inertia(3)
    info(s"inertia_kilo: seeds=$before after-3-Lloyd=$after")
    assert(after < before, "3 Lloyd rounds must improve on the seed centroids")
  }

  test("kmeans_train is bit-deterministic across runs") {
    val a = Training.kmeansTrain(spark, sf).collect().toSeq
    val b = Training.kmeansTrain(spark, sf).collect().toSeq
    assert(a === b)
  }

  test("quality_classifier: beats the majority-class baseline on the weak label") {
    val r = Training.qualityClassifier(spark, sf).head
    val n = r.getAs[Long]("n")
    val nPos = r.getAs[Long]("n_pos")
    val acc = r.getAs[Long]("acc_micro").toDouble / 1e6
    val majority = math.max(nPos, n - nPos).toDouble / n
    info(f"n=$n pos=$nPos acc=$acc%.3f majority=$majority%.3f " +
      s"w=${(0 to 3).map(j => r.getAs[Long](s"w$j")).mkString(",")}")
    assert(acc >= majority,
      "4 GD rounds on these features must at least match always-majority")
    assert((0 to 3).exists(j => r.getAs[Long](s"w$j") != 0L),
      "training moved the weights")
  }

  test("cluster_sample: exactly ceil(n/4) per cluster, deterministic, a real subset") {
    val out = Training.clusterSample(spark, sf).cache()
    val km = Training.kmeansTrain(spark, sf).filter($"dim" === 0)
      .select($"cluster", $"n")
    val taken = out.groupBy($"cluster").agg(count(lit(1)).as("k"), max($"cluster_n").as("cn"))
    // per-cluster quota: k == ceil(n/4), and the reported size matches kmeans
    val j = taken.join(km, "cluster")
    assert(j.filter($"k" =!= (($"n" + 3L) / 4L).cast("long")).count() === 0,
      "per-cluster sample size must be exactly ceil(n/4)")
    assert(j.filter($"cn" =!= $"n").count() === 0,
      "reported cluster_n must match the kmeans cluster size")
    // the sample is a subset of the corpus vec_ids
    val ids = graft.sources.Tables.embeddings(spark, sf).select($"vec_id")
    assert(out.join(ids, "vec_id", "left_anti").count() === 0)
    assert(out.collect().toSeq === Training.clusterSample(spark, sf).collect().toSeq)
    out.unpersist()
  }

  test("embedding_classifier: the linear probe actually learns the label split") {
    val out = Training.embeddingClassifier(spark, sf).cache()
    assert(out.count() === 65, "64 dims + bias")
    val r = out.head
    val n = r.getAs[Long]("n")
    val acc = r.getAs[Long]("acc_micro").toDouble / 1e6
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val nPos = emb.filter($"label" <= 4).count()
    val majority = math.max(nPos, n - nPos).toDouble / n
    info(f"n=$n acc=$acc%.3f majority=$majority%.3f")
    // embeddings are linearly separable by construction; the GD probe
    // must beat always-majority, not just match it
    assert(acc > majority, "the supervised probe must learn, not memorize the prior")
    assert(out.filter($"w_micro" =!= 0L).count() > 10,
      "most dimensions carry signal")
    out.unpersist()
  }

  test("embedding_communities: LSH+LPA partitions the similarity graph and merges") {
    val out = Training.embeddingCommunities(spark, sf).cache()
    val members = out.agg(sum($"n_members")).head.getLong(0)
    val communities = out.count()
    val largest = out.agg(max($"n_members")).head.getLong(0)
    info(s"communities=$communities members=$members largest=$largest")
    // every node of the similarity graph lands in exactly one community
    assert(members > 0 && communities > 1)
    assert(largest >= 3, "3 LPA rounds must merge beyond pairs somewhere")
    assert(communities < members, "propagation must merge SOME labels")
    assert(out.collect().toSeq === Training.embeddingCommunities(spark, sf).collect().toSeq)
    out.unpersist()
  }

  test("embedding_communities: clone families inherit the representative's community") {
    // families A/B/D: ids 1-5 share u, ids 6-8 share 2u, ids 13-14
    // share 3u — three DISTINCT embeddings with identical LSH signs
    // and pairwise cosine exactly 1.0, so their representatives form a
    // triangle (a 2-clique would oscillate under synchronous LPA — the
    // graph_lpa family artifact — but a triangle converges to min id);
    // family C: ids 9-12 share -u (cosine -1, no edge anywhere)
    val u = Array.tabulate(64)(d => 0.01f * (d + 1))
    val rows = (1L to 5L).map(i => (i, u)) ++
      (6L to 8L).map(i => (i, u.map(_ * 2f))) ++
      (9L to 12L).map(i => (i, u.map(-_))) ++
      (13L to 14L).map(i => (i, u.map(_ * 3f)))
    val e = rows.toDF("vec_id", "embedding")
    val out = Training.embeddingCommunitiesOf(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // A+B+D merge under rep 1's label with every clone member counted
    // (5+3+2); C's representative finds no neighbor, so the mutually-
    // identical family is its own community under rep id 9
    assert(out === Set((1L, 10L), (9L, 4L)))
  }

  test("embedding_communities: candidate index bounded per bucket on adversarial pile-ups") {
    // 300 DISTINCT vectors with one shared sign pattern: every LSH
    // table hashes all of them into a single bucket — the occupancy²
    // blow-up shape. The md5-smallest sample must cut each (table,
    // bucket) to ≤ 64 entries, deterministically.
    val u = Array.tabulate(64)(d => 0.01f * (d + 1))
    val reps = (1L to 300L).map(i => (i, u.map(_ * i))).toDF("vec_id", "embedding")
    val idx = Training.communityCandidateIndex(reps).cache()
    val worst = idx.groupBy($"band", $"bucket").count()
      .agg(max($"count")).head.getLong(0)
    assert(worst <= 64L, s"bucket sample cap violated: $worst > 64")
    // identical sign pattern => exactly 8 occupied buckets, 64 each
    assert(idx.count() === 8L * 64L)
    assert(idx.collect().toSet === Training.communityCandidateIndex(reps).collect().toSet,
      "the md5-smallest sample must be deterministic")
    idx.unpersist()
  }

  test("quality_classifier_score: 20+20 audit sample, top scores dominate bottom") {
    val out = Training.qualityClassifierScore(spark, sf).cache()
    assert(out.filter($"side" === "top").count() === 20)
    assert(out.filter($"side" === "bottom").count() === 20)
    val minTop = out.filter($"side" === "top")
      .agg(min($"score_micro")).head.getLong(0)
    val maxBottom = out.filter($"side" === "bottom")
      .agg(max($"score_micro")).head.getLong(0)
    assert(minTop >= maxBottom, "every top-side score >= every bottom-side score")
    out.unpersist()
  }

  test("classifier_auc: exact O(n²) pairwise brute force and identities") {
    val row = Training.classifierAuc(spark, sf).collect().head
    val feats = Training.docFeatures(graft.sources.Tables.documents(spark, sf))
    val w = Training.trainWeights(feats)
    val scored = feats.select(col("y"), Training.scoreCol(w).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pos = scored.filter(_._1 == 1L).map(_._2)
    val neg = scored.filter(_._1 == 0L).map(_._2)
    assert(row.getAs[Long]("n_pos") === pos.length)
    assert(row.getAs[Long]("n_neg") === neg.length)
    var numer2 = BigInt(0)
    for (p <- pos; n <- neg)
      numer2 += (if (p > n) 2 else if (p == n) 1 else 0)
    val aucMicro = (numer2 * 1000000 /
      (BigInt(2) * pos.length * neg.length)).toLong
    assert(row.getAs[Long]("auc_micro") === aucMicro)
    assert(row.getAs[Long]("gini_micro") === 2 * aucMicro - 1000000L)
    val auc = row.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
  }
}
