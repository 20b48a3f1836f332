package graft

import graft.operators.{IvfIndex, Similarity}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF ANN returns topK ranked neighbors and decent recall vs brute force") {
    val ivf = IvfIndex.annIvf(spark, sf, k = 8, nprobe = 3)
    val perQuery = ivf.groupBy($"q_id").count().collect()
    assert(perQuery.forall(_.getLong(1) == 5))
    val bf = Similarity.annBruteforce(spark, sf)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val got = ivf.select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val recall = bf.intersect(got).size.toDouble / bf.size
    info(s"IVF recall = $recall")
    // nprobe/k = 3/8 of the corpus scanned; the testdata vectors are
    // ISOTROPIC (same-label and cross-label mean cosine are both ~0), so
    // recall is information-theoretically bounded near the scan fraction
    // (an exact driver-side k-means measures ~0.62 here) — demand
    // clearly-better-than-chance
    assert(recall >= 0.45, s"recall $recall too low")
  }

  test("finer quantization buys recall: >= 0.8 at k=16, nprobe=8") {
    // recall-per-scan improves with finer cells: half the corpus scanned
    // (8/16) reaches 0.8 where coarse k=8 needed ~0.75 of it
    val ivf = IvfIndex.annIvf(spark, sf, k = 16, nprobe = 8)
    val bf = Similarity.annBruteforce(spark, sf)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val got = ivf.select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val recall = bf.intersect(got).size.toDouble / bf.size
    info(s"IVF recall (k=16, nprobe=8) = $recall")
    assert(recall >= 0.8, s"recall $recall below 0.8")
  }

  test("adaptive nprobe varies probe width per query and holds recall") {
    val ivf = IvfIndex.annIvfAdaptive(spark, sf, k = 16, margin = 0.5, maxProbe = 8)
    val perQuery = ivf.groupBy($"q_id").count().collect()
    assert(perQuery.length == 8 && perQuery.forall(_.getLong(1) == 5))
    val bf = Similarity.annBruteforce(spark, sf)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val got = ivf.select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val recall = bf.intersect(got).size.toDouble / bf.size
    info(s"adaptive IVF recall = $recall")
    assert(recall >= 0.5, s"recall $recall too low")
    // the probe decision must actually adapt: with a mid-range margin,
    // boundary queries widen beyond the narrowest query's probe count
    val e = sources.Tables.embeddings(spark, sf)
    val corpus = e.filter($"vec_id" >= 8)
      .select($"vec_id".as("n_id"), $"embedding".as("n_vec"))
    val cents = IvfIndex.trainCentroids(corpus, "n_id", "n_vec", 16)
    val widths = e.filter($"vec_id" < 8).collect().map { r =>
      val v = r.getSeq[Float](1).toArray
      val scores = cents.map(c => c.zip(v).map { case (a, b) => a.toDouble * b }.sum)
      val best = scores.max; val worst = scores.min
      val sorted = scores.sortBy(-_)
      sorted.take(8).count(s => s == best || s >= best - 0.5 * (best - worst)).max(1)
    }
    info(s"probe widths = ${widths.mkString(",")}")
    assert(widths.min >= 1 && widths.max <= 8)
    assert(widths.distinct.length > 1, "probe width should vary across queries")
  }

  test("clustered corpus: recall beats the scan fraction (≥0.9 at ≤25% scan)") {
    // Real embedding corpora are ANISOTROPIC — vectors concentrate near
    // semantic clusters. The isotropic testdata bounds recall at the
    // scan fraction no matter how good training is, so this fixture
    // plants 16 well-separated clusters (unit centers + sigma=0.05
    // gaussian noise, seeded) and demands what IVF actually promises on
    // structured data: recall far ABOVE the fraction of corpus scanned.
    val dim = 64; val kClusters = 16; val perCluster = 64; val nQ = 32
    val rnd = new scala.util.Random(42)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val centers = Array.fill(kClusters)(unit(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    def jitter(c: Array[Float]): Array[Float] =
      c.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    val corpusVecs = (0 until kClusters * perCluster)
      .map(i => (i.toLong, jitter(centers(i % kClusters))))
    val queryVecs = (0 until nQ).map(i => (i.toLong, jitter(centers(i % kClusters))))
    val corpus = corpusVecs.toDF("n_id", "n_vec")
    val queries = queryVecs.toDF("q_id", "q_vec")

    val nprobe = 4 // 4 of 16 clusters → nominal 25% scan
    val got = IvfIndex.annIvfOn(corpus, queries, k = kClusters, nprobe = nprobe)
      .select($"q_id", $"n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // exact cosine top-5 ground truth (tiny fixture → driver-side)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val truth = queryVecs.map { case (qid, qv) =>
      qid -> corpusVecs.map { case (nid, nv) => (nid, cos(qv, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }.take(5).map(_._1).toSet
    }.toMap
    val recall = truth.map { case (qid, want) =>
      got.getOrElse(qid, Set.empty).intersect(want).size.toDouble / want.size
    }.sum / truth.size

    // measured scan fraction: probed-cluster mass over corpus × queries
    val cents = IvfIndex.trainCentroids(corpus, "n_id", "n_vec", kClusters)
    val sizes = IvfIndex.assignClusters(corpus, "n_vec", cents)
      .groupBy($"__cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val scanned = queryVecs.map { case (_, qv) =>
      val scores = cents.zipWithIndex
        .map { case (c, i) => (c.zip(qv).map { case (a, b) => a.toDouble * b }.sum, i) }
      scores.sortBy { case (s, i) => (-s, i) }.take(nprobe)
        .map { case (_, i) => sizes.getOrElse(i, 0L) }.sum
    }.sum.toDouble / (corpusVecs.size.toLong * nQ)

    info(f"clustered-fixture recall@5 = $recall%.3f at ${scanned * 100}%.1f%% scanned")
    assert(scanned <= 0.28, f"scan fraction $scanned%.3f above the 25%% budget")
    assert(recall >= 0.9, f"recall $recall%.3f under 0.9 on clustered data")
    assert(recall > 2 * scanned, "recall must clearly beat the scan fraction")
  }

  test("centroid training is deterministic") {
    val corpus = sources.Tables.embeddings(spark, sf)
      .select($"vec_id".as("n_id"), $"embedding".as("n_vec"))
    val c1 = IvfIndex.trainCentroids(corpus, "n_id", "n_vec", k = 4, iters = 2)
    val c2 = IvfIndex.trainCentroids(corpus, "n_id", "n_vec", k = 4, iters = 2)
    assert(c1.length == 4)
    c1.zip(c2).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("every corpus vector lands in exactly one cluster") {
    val corpus = sources.Tables.embeddings(spark, sf)
      .select($"vec_id".as("n_id"), $"embedding".as("n_vec"))
    val cents = IvfIndex.trainCentroids(corpus, "n_id", "n_vec", k = 4, iters = 1)
    val assigned = IvfIndex.assignClusters(corpus, "n_vec", cents)
    assert(assigned.count() == corpus.count())
    assert(assigned.filter($"__cluster" < 0 || $"__cluster" >= 4).count() == 0)
  }
}
