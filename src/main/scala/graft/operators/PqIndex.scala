package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.vec_dot
import graft.functions.PqFunctions.{pq_dist_table, pq_encode, vec_centroid_residual}

/** Product-quantization (PQ) ANN index — the vector-COMPRESSION scale
  * path (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", PAMI 2011) complementing IVF's partition pruning.
  *
  * The 64-dim float corpus (256 B/vector) is cut into M=8 subspaces of
  * 8 dims; each subspace gets its own K=32-centroid codebook, and every
  * vector is stored as 8 five-bit codes (5 B/vector, ~50× smaller). At
  * 100 TB that is the difference between scanning vectors from disk and
  * scanning codes from memory: queries never touch the original
  * embeddings — each query precomputes an M×K table of partial squared
  * distances to every codebook centroid, and a corpus vector's
  * approximate distance is M table lookups summed in fixed subspace
  * order (asymmetric distance computation, ADC).
  *
  * Distributed shape: training collects only M×K×(64/M) floats per
  * Lloyd iteration (all subspaces share one exchange per iteration —
  * never data rows); encoding is a map-only pass producing the narrow
  * code table; search broadcasts the per-query tables and scans ONLY
  * codes, with a WindowGroupLimit-pruned top-k. No oracle (iterative
  * training is not reasonably SQL-expressible) — recall and distortion
  * are spec-bounded against the exact scan instead.
  */
object PqIndex {

  val M = 8          // subspaces
  val K = 32         // centroids per subspace (5-bit codes)
  val Dim = 64
  val SubDim: Int = Dim / M

  /** Deterministic per-subspace L2 k-means codebooks, all M subspaces
    * trained in ONE distributed job per Lloyd iteration. Seeding: the K
    * vectors with smallest xxhash64(id) seed every subspace (stable
    * across runs and partitionings, like [[IvfIndex.trainCentroids]]).
    * Returns codebooks(s)(c) = centroid vector of length [[SubDim]].
    */
  def trainCodebooks(vectors: DataFrame, idCol: String, vecCol: String,
                     iters: Int = 5): Array[Array[Array[Float]]] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    var books: Array[Array[Array[Float]]] = {
      val seeds = vectors
        .withColumn("__h", xxhash64(col(idCol)))
        .orderBy($"__h")
        .limit(K)
        .select(col(vecCol))
        .collect()
        .map(_.getSeq[Float](0).toArray)
      Array.tabulate(M) { s =>
        seeds.map(v => v.slice(s * SubDim, (s + 1) * SubDim))
      }
    }
    for (_ <- 1 to iters) {
      // one job refits every subspace: explode to (sub, code, pos, v),
      // average per (sub, code, pos); only M*K*SubDim floats collect
      val coded = encode(vectors, vecCol, books)
      val means = coded
        .select(posexplode(col(vecCol)).as(Seq("__pos", "__v")), $"__codes")
        .withColumn("__sub", ($"__pos" / SubDim).cast("int"))
        .withColumn("__code", element_at($"__codes", ($"__sub" + 1)))
        .groupBy($"__sub", $"__code", $"__pos")
        .agg(avg($"__v").as("__mean"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3))
        .toMap
      books = Array.tabulate(M) { s =>
        Array.tabulate(K) { c =>
          Array.tabulate(SubDim) { d =>
            means.get((s, c, s * SubDim + d)).map(_.toFloat)
              .getOrElse(books(s)(c)(d)) // empty cluster keeps its seed
          }
        }
      }
    }
    books
  }

  /** Append `__codes`: per subspace the argmin-L2 codebook entry
    * (argmax of v·c − |c|²/2 — the |v|² term is constant per (row,
    * subspace)), computed by the native [[graft.functions.PqEncode]]
    * kernel. The earlier M×K literal `greatest(vec_dot…)` expansion
    * generated ~256 dot-product terms in one method and overflowed
    * janino's 64 KB limit, dropping the whole corpus-side encode map to
    * interpreted execution; the kernel is one static call, so the stage
    * stays inside whole-stage codegen. Map-only, no shuffle.
    */
  def encode(vectors: DataFrame, vecCol: String,
             books: Array[Array[Array[Float]]]): DataFrame =
    vectors.withColumn("__codes", pq_encode(col(vecCol), books))

  /** ADC lookup sum over bound `dtab`/`codes` attributes, added in fixed
    * subspace order. */
  private def adcScore: Column =
    (0 until M)
      .map(s => element_at(element_at(col("dtab"), s + 1), element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)

  /** Per-query ADC distance-table column over `books` for the (possibly
    * residual) query vector `qv`: dtab(s)(c) = |qv_s − books(s)(c)|².
    * Native kernel for the same 64 KB-overflow reason as [[encode]]. */
  private def distanceTable(qv: Column, books: Array[Array[Array[Float]]]): Column =
    pq_dist_table(qv, books)

  /** End-to-end PQ ANN with re-ranking (the production ADC+R shape):
    * train codebooks, encode the corpus once into the narrow code
    * table, ADC-score a per-query SHORTLIST of `topK × shortlistFactor`
    * candidates over codes alone, then exact-rank only the shortlist
    * against the real vectors. The full corpus is scanned as 5-byte
    * codes; original embeddings are touched for ~40 rows per query via
    * an id hash-join — at 100 TB the refine step is noise while the
    * scan shrinks 64×.
    */
  def annPq(spark: SparkSession, dir: String, topK: Int = 5,
            shortlistFactor: Int = 8, iters: Int = 5): DataFrame = {
    import spark.implicits._
    val e = graft.sources.Tables.embeddings(spark, dir)
    val corpus = e.filter($"vec_id" >= 8)
      .select($"vec_id".as("n_id"), $"embedding".as("n_vec"))
    val books = trainCodebooks(corpus, "n_id", "n_vec", iters)
    val codeTable = encode(corpus, "n_vec", books)
      .select($"n_id", $"__codes".as("codes"))

    // per-query ADC table: dtab(s)(c) = |q_s − books(s)(c)|², expanded
    // with literal centroids so the 8-row query side does all the float
    // work; |q_s|² folds in so spec'd distances are true squared-L2
    val queries = e.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val qTab = queries.select($"q_id", distanceTable($"q_vec", books).as("dtab"))

    // ADC score: M bound-attribute lookups added in fixed subspace order
    val adc = adcScore
    val shortlist = codeTable.crossJoin(broadcast(qTab))
      .withColumn("adc", adc)
      .withColumn("ark", row_number().over(
        Window.partitionBy($"q_id").orderBy($"adc".asc, $"n_id")))
      .filter($"ark" <= topK * shortlistFactor)
      .select($"q_id", $"n_id")

    // exact refine: only shortlist ids rejoin their vectors
    val exactD = aggregate(zip_with($"q_vec", $"n_vec",
      (a, b) => (a - b).cast("double") * (a - b)), lit(0.0d), (acc, x) => acc + x)
    shortlist
      .join(corpus, "n_id")
      .join(broadcast(queries), "q_id")
      .withColumn("d", exactD)
      .withColumn("rk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"d".asc, $"n_id")))
      .filter($"rk" <= topK)
      .select($"q_id", $"rk", $"n_id", round($"d", 6).as("l2_dist"))
      .orderBy($"q_id", $"rk")
  }

  /** IVF-PQ (FAISS "IVFADC"): the two scale dials composed — IVF's
    * coarse clusters prune WHICH codes are scanned (nprobe/k of the
    * corpus), PQ's residual codes shrink WHAT a scan reads (~50×).
    * Vectors are encoded as (cluster, residual codes) where residual =
    * v − centroid(cluster): residuals are far smaller in norm than raw
    * vectors, so the same codebook budget quantizes them with much less
    * distortion. Queries rank centroids, and for each probed cluster
    * build a distance table from THEIR residual against that centroid —
    * then ADC + exact re-rank exactly as [[annPq]].
    */
  def annIvfPq(spark: SparkSession, dir: String, kCoarse: Int = 8,
               nprobe: Int = 3, topK: Int = 5, shortlistFactor: Int = 8,
               iters: Int = 5): DataFrame = {
    import spark.implicits._
    val e = graft.sources.Tables.embeddings(spark, dir)
    val corpus = e.filter($"vec_id" >= 8)
      .select($"vec_id".as("n_id"), $"embedding".as("n_vec"))
    val coarse = IvfIndex.trainCentroids(corpus, "n_id", "n_vec", kCoarse)

    // residual = v − centroid(cluster); cluster from the shared IVF
    // assignment. Native kernel: the zip_with formulation is a
    // higher-order function evaluated interpreted per element — on the
    // corpus-side encode path that is the one map that touches every
    // row, so it must stay in codegen like pq_encode itself.
    def residual(vec: Column, cluster: Column): Column =
      vec_centroid_residual(vec, cluster, coarse)
    val assigned = IvfIndex.assignClusters(corpus, "n_vec", coarse)
      .select($"n_id", $"n_vec", $"__cluster".as("cluster"))
    val residuals = assigned
      .select($"n_id", $"cluster", residual($"n_vec", $"cluster").as("r_vec"))
    val books = trainCodebooks(residuals, "n_id", "r_vec", iters)
    val codeTable = encode(residuals, "r_vec", books)
      .select($"n_id", $"cluster", $"__codes".as("codes"))

    // per-query probe set with a residual distance table per probed
    // cluster (nprobe rows/query — all float work on the tiny side)
    val queries = e.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val probes = queries.select($"q_id", $"q_vec",
        explode(array(coarse.zipWithIndex.map { case (c, i) =>
          struct(vec_dot($"q_vec", typedLit(c)).as("score"), lit(i).as("cluster"))
        }: _*)).as("cs"))
      .withColumn("prk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"cs.score".desc, $"cs.cluster")))
      .filter($"prk" <= nprobe)
      .select($"q_id", $"cs.cluster".as("cluster"),
        distanceTable(residual($"q_vec", $"cs.cluster"), books).as("dtab"))

    val shortlist = codeTable.join(broadcast(probes), "cluster")
      .withColumn("adc", adcScore)
      .withColumn("ark", row_number().over(
        Window.partitionBy($"q_id").orderBy($"adc".asc, $"n_id")))
      .filter($"ark" <= topK * shortlistFactor)
      .select($"q_id", $"n_id")

    val exactD = aggregate(zip_with($"q_vec", $"n_vec",
      (a, b) => (a - b).cast("double") * (a - b)), lit(0.0d), (acc, x) => acc + x)
    shortlist
      .join(corpus, "n_id")
      .join(broadcast(queries), "q_id")
      .withColumn("d", exactD)
      .withColumn("rk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"d".asc, $"n_id")))
      .filter($"rk" <= topK)
      .select($"q_id", $"rk", $"n_id", round($"d", 6).as("l2_dist"))
      .orderBy($"q_id", $"rk")
  }
}
