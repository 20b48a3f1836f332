package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.vec_dot
import graft.operators.Dedup.{cosinePre, norm}

/** IVF (inverted-file) ANN index — the coarse-quantization scale path
  * complementing multi-table LSH.
  *
  * Build: k-means-lite (deterministic seeding, a few Lloyd iterations —
  * per iteration only the k centroids cross the driver, never data
  * rows) → assign every vector to its nearest centroid → the
  * (cluster_id, vector) table IS the index, partitionable by cluster.
  * Query: rank centroids per query, probe the top `nprobe` clusters,
  * exact-rank inside them. Corpus scanned ≈ nprobe/k of total.
  */
object IvfIndex {

  /** Deterministic SPHERICAL k-means-lite over float-vector rows.
    * Returns unit-norm centroids (k × dim). Seeding: the k vectors with
    * the smallest xxhash64(id) — stable across runs and partitionings.
    * Spherical (centroids renormalized each Lloyd iteration, assignment
    * by dot product) because the index serves COSINE queries — L2
    * centroids on unnormalized data misalign with the query metric.
    *
    * Recall ceiling note: on isotropic (unstructured) vectors recall is
    * bounded by ≈ the scanned corpus fraction regardless of training
    * quality — measured on the synthetic testdata, an exact driver-side
    * k-means gains nothing over this implementation. Real embedding
    * corpora have cluster structure; this is where IVF earns its keep.
    */
  def trainCentroids(vectors: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int = 5): Array[Array[Float]] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n == 0) v else v.map(x => (x / n).toFloat)
    }
    var centroids: Array[Array[Float]] = vectors
      .withColumn("__h", xxhash64(col(idCol)))
      .orderBy($"__h")
      .limit(k)
      .select(col(vecCol))
      .collect()
      .map(r => unit(r.getSeq[Float](0).toArray))

    for (_ <- 1 to iters) {
      val assigned = assignClusters(vectors, vecCol, centroids)
      val means = assigned
        .select($"__cluster", posexplode(col(vecCol)).as(Seq("__pos", "__v")))
        .groupBy($"__cluster", $"__pos")
        .agg(avg($"__v").as("__mean"))
        .groupBy($"__cluster")
        .agg(array_sort(collect_list(struct($"__pos", $"__mean"))).as("__pm"))
        .select($"__cluster", transform($"__pm", p => p.getField("__mean").cast("float")).as("__c"))
        .collect()
        .map(r => r.getInt(0) -> unit(r.getSeq[Float](1).toArray))
        .toMap
      centroids = centroids.indices
        .map(i => means.getOrElse(i, centroids(i))).toArray
    }
    centroids
  }

  /** Nearest-centroid assignment via unrolled native dot products
    * (k literal plane vectors; squared L2 distance = |v|² − 2v·c + |c|²,
    * |v|² constant per row → argmax of (v·c − |c|²/2)).
    */
  def assignClusters(vectors: DataFrame, vecCol: String,
                     centroids: Array[Array[Float]]): DataFrame = {
    val scores = centroids.zipWithIndex.map { case (c, i) =>
      val half = c.map(x => x.toDouble * x).sum / 2.0
      struct((vec_dot(col(vecCol), typedLit(c)) - lit(half)).as("s"),
        lit(i).as("i"))
    }
    vectors.withColumn("__cluster",
      greatest(scores: _*).getField("i"))
  }

  /** IVF ANN over caller-supplied tables — the reusable library shape:
    * `corpus` carries (n_id: long, n_vec: array<float>), `queries`
    * (q_id: long, q_vec: array<float>). Build index, probe top-`nprobe`
    * clusters per query, exact cosine top-k within the probe set.
    */
  def annIvfOn(corpus: DataFrame, queries: DataFrame, k: Int = 8,
               nprobe: Int = 3, topK: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = trainCentroids(corpus, "n_id", "n_vec", k)
    val index = assignClusters(corpus, "n_vec", centroids)
      .select($"n_id", $"n_vec", $"__cluster".as("cluster"), norm($"n_vec").as("n_norm"))

    // per-query centroid ranking (k is tiny → unrolled literal scores)
    val probes = queries
      .select($"q_id", $"q_vec", norm($"q_vec").as("q_norm"),
        explode(array(centroids.zipWithIndex.map { case (c, i) =>
          struct(vec_dot($"q_vec", typedLit(c)).as("score"), lit(i).as("cluster"))
        }: _*)).as("cs"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"cs.score".desc, $"cs.cluster")))
      .filter($"rk" <= nprobe)
      .select($"q_id", $"q_vec", $"q_norm", $"cs.cluster".as("cluster"))

    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"n_id")
    index.join(broadcast(probes), "cluster")
      .withColumn("cos", cosinePre($"q_vec", $"n_vec", $"q_norm", $"n_norm"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= topK)
      .select($"q_id", $"rk", $"n_id", round($"cos", 6).as("cos_sim"))
      .orderBy($"q_id", $"rk")
  }

  /** End-to-end IVF ANN over the embeddings testdata table. */
  def annIvf(spark: SparkSession, dir: String, k: Int = 8, nprobe: Int = 3,
             topK: Int = 5): DataFrame = {
    import spark.implicits._
    val e = graft.sources.Tables.embeddings(spark, dir)
    annIvfOn(
      e.filter($"vec_id" >= 8).select($"vec_id".as("n_id"), $"embedding".as("n_vec")),
      e.filter($"vec_id" < 8).select($"vec_id".as("q_id"), $"embedding".as("q_vec")),
      k, nprobe, topK)
  }

  /** ADAPTIVE-nprobe IVF: instead of a fixed probe count, each query
    * probes every cluster whose centroid score sits within `margin` of
    * the spread between its best and worst centroid (capped at
    * `maxProbe`, floor 1). Queries that land squarely inside one
    * cluster scan little; queries on cluster boundaries — where fixed
    * nprobe loses its recall — automatically widen. The per-query probe
    * decision is a window over k centroid scores (k rows per query),
    * so the adaptivity costs nothing at corpus scale; the corpus-side
    * plan is identical to [[annIvf]].
    */
  def annIvfAdaptive(spark: SparkSession, dir: String, k: Int = 16,
                     margin: Double = 0.5, maxProbe: Int = 8,
                     topK: Int = 5): DataFrame = {
    import spark.implicits._
    val e = graft.sources.Tables.embeddings(spark, dir)
    val corpus = e.filter($"vec_id" >= 8)
      .select($"vec_id".as("n_id"), $"embedding".as("n_vec"))
    val centroids = trainCentroids(corpus, "n_id", "n_vec", k)
    val index = assignClusters(corpus, "n_vec", centroids)
      .select($"n_id", $"n_vec", $"__cluster".as("cluster"), norm($"n_vec").as("n_norm"))

    val queries = e.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"), norm($"embedding").as("q_norm"))
    val wq = Window.partitionBy($"q_id")
    val probes = queries.select($"q_id", $"q_vec", $"q_norm",
        explode(array(centroids.zipWithIndex.map { case (c, i) =>
          struct(vec_dot($"q_vec", typedLit(c)).as("score"), lit(i).as("cluster"))
        }: _*)).as("cs"))
      .withColumn("best", max($"cs.score").over(wq))
      .withColumn("worst", min($"cs.score").over(wq))
      .withColumn("rk", row_number().over(
        wq.orderBy($"cs.score".desc, $"cs.cluster")))
      .filter($"rk" === 1 || ($"rk" <= maxProbe &&
        $"cs.score" >= $"best" - lit(margin) * ($"best" - $"worst")))
      .select($"q_id", $"q_vec", $"q_norm", $"cs.cluster".as("cluster"))

    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"n_id")
    index.join(broadcast(probes), "cluster")
      .withColumn("cos", cosinePre($"q_vec", $"n_vec", $"q_norm", $"n_norm"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= topK)
      .select($"q_id", $"rk", $"n_id", round($"cos", 6).as("cos_sim"))
      .orderBy($"q_id", $"rk")
  }
}
