package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the embeddings table.
  *
  * Scale design: the query set is small and broadcast; the corpus side
  * is only ever scanned, never shuffled — at 100 TB the brute-force
  * variant is a single pass (map + per-partition top-k via the
  * aggregate), and the LSH variant buckets the corpus once into an
  * index table that is reusable across query batches (bucket-key
  * equi-join instead of a cross product).
  */
object Similarity {

  import Dedup.cosine

  /** Exact cosine top-k: broadcast the query vectors against the corpus,
    * rank per query. The oracle recomputes in DuckDB with
    * list_cosine_similarity; similarity is rounded to 6dp (the two
    * engines' fold arithmetic differs in the last ulp) and rank ties are
    * broken by vec_id before rounding.
    */
  def annBruteforce(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val q = e.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        Dedup.norm($"embedding").as("q_norm"))
    val corpus = e.filter($"vec_id" >= 8)
      .select($"vec_id".as("n_id"), $"embedding".as("n_vec"),
        Dedup.norm($"embedding").as("n_norm"))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"n_id")
    corpus.crossJoin(broadcast(q))
      .withColumn("cos", Dedup.cosinePre($"q_vec", $"n_vec", $"q_norm", $"n_norm"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"q_id", $"rk", $"n_id", round($"cos", 6).as("cos_sim"))
      .orderBy($"q_id", $"rk")
  }

  val annBruteforceSql: String =
    """SELECT q_id, rk, n_id, round(cos, 6) AS cos_sim FROM (
      |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
      |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rk
      |  FROM (SELECT * FROM embeddings WHERE vec_id < 8) q,
      |       (SELECT * FROM embeddings WHERE vec_id >= 8) c) t
      |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  /** Same exact top-k as [[annBruteforce]], but the shortlist comes
    * from the bounded-state `top_k_by` aggregate instead of a window
    * rank. The window path sort-shuffles every scored row to its
    * query's partition; the aggregate path partial-aggregates map-side
    * (O(k) heap state per query per task), so the exchange carries at
    * most k rows per query per map task and the reduce is a buffer
    * merge, not a sort — the shape a deep re-rank shortlist (k in the
    * hundreds) wants at 100 TB. Tie-break (score DESC, payload ASC)
    * matches the window's (cos DESC, n_id), so the output — and the
    * DuckDB oracle — is bit-identical to the window variant's.
    */
  def annTopkAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val q = e.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        Dedup.norm($"embedding").as("q_norm"))
    val corpus = e.filter($"vec_id" >= 8)
      .select($"vec_id".as("n_id"), $"embedding".as("n_vec"),
        Dedup.norm($"embedding").as("n_norm"))
    corpus.crossJoin(broadcast(q))
      .withColumn("cos", Dedup.cosinePre($"q_vec", $"n_vec", $"q_norm", $"n_norm"))
      .groupBy($"q_id")
      .agg(graft.functions.AggFunctions.top_k_by($"cos", $"n_id", 5).as("top"))
      .select($"q_id", posexplode($"top"))
      .select($"q_id", ($"pos" + 1).as("rk"), $"col.payload".as("n_id"),
        round($"col.score", 6).as("cos_sim"))
      .orderBy($"q_id", $"rk")
  }

  /** Multi-table random-hyperplane LSH: L independent tables of K sign
    * bits. A candidate matches if it shares a bucket in ANY table —
    * the standard recall/cost dial (higher L → higher recall, K bounds
    * bucket size). Corpus is exploded L× (bounded, linear) and joined on
    * (table, bucket) — never a cross product.
    */
  val NumTables = 8
  val PlanesPerTable = 4

  /** Deterministic pseudo-random hyperplane components, precomputed on
    * the driver (hash of (plane, dim) mapped into [-1, 1]) and shipped
    * as array literals — no RNG state, reproducible across executors,
    * and the per-row work becomes a native DotProduct against a
    * constant vector instead of an interpreted per-element hash.
    */
  val EmbeddingDim = 64
  private def planeVector(plane: Int): Array[Float] =
    Array.tabulate(EmbeddingDim) { d =>
      // splitmix-style avalanche of (plane, dim) → [-1, 1]
      var h = plane.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xC2B2AE3D27D4EB4FL
      h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
      ((h % 10000L).toDouble / 10000.0).toFloat
    }

  /** Hard ceiling for [[adaptivePlanes]]: 12 planes = 4096 buckets per
    * table, occupancy ~32 up to a 128k-vector corpus per partition of
    * the id space — beyond that, shard the index. */
  val MaxPlanesPerTable = 12

  /** Corpus-size-scaled planes per table (the SCALE_PROBE-named lever):
    * the smallest k in [PlanesPerTable, MaxPlanesPerTable] with
    * 32·2^k ≥ n, so expected bucket occupancy stays ~32 at ANY corpus
    * size and the candidate set per query is bounded instead of
    * growing ∝ n/2^k. Pure integer thresholds — the oracle replays
    * them as a CASE chain, no float log2 on either engine. */
  def adaptivePlanes(n: Long): Int = {
    var k = PlanesPerTable
    while (k < MaxPlanesPerTable && n > (32L << k)) k += 1
    k
  }

  /** The CASE chain mirror of [[adaptivePlanes]] over `count(*)`, for
    * oracles that replay the adaptive bucketing. */
  private[graft] val adaptivePlanesCaseSql: String =
    (PlanesPerTable until MaxPlanesPerTable)
      .map(k => s"WHEN count(*) <= ${32L << k} THEN $k")
      .mkString("CASE ", " ", s" ELSE $MaxPlanesPerTable END")

  /** Plane-bank id for (table, plane-within-table). The first
    * PlanesPerTable planes of each table keep their original ids
    * (0..31) so every fixed-4-plane consumer's buckets — and the
    * pinned oracles replaying them — are byte-stable; the extension
    * planes draw fresh ids beyond the legacy bank. */
  private def planeId(table: Int, p: Int): Int =
    if (p < PlanesPerTable) table * PlanesPerTable + p
    else NumTables * PlanesPerTable +
      table * (MaxPlanesPerTable - PlanesPerTable) + (p - PlanesPerTable)

  /** Bucket key for one LSH table: k sign bits packed into a long, each
    * from a codegen'd dot product with a literal plane vector.
    */
  def lshBucketK(vec: org.apache.spark.sql.Column, table: Int,
                 k: Int): org.apache.spark.sql.Column = {
    val bits = (0 until k).map { p =>
      val plane = typedLit(planeVector(planeId(table, p)))
      when(graft.functions.VectorFunctions.vec_dot(vec, plane) > 0,
        shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  def lshBucket(vec: org.apache.spark.sql.Column, table: Int): org.apache.spark.sql.Column =
    lshBucketK(vec, table, PlanesPerTable)

  /** (table, bucket) index entries for a vector — the write-once index
    * shape: at scale this is persisted and reused across query batches.
    */
  def lshIndexEntries(vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lshIndexEntriesK(vec, PlanesPerTable)

  def lshIndexEntriesK(vec: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    array((0 until NumTables).map { t =>
      struct(lit(t).as("tbl"), lshBucketK(vec, t, k).as("bucket"))
    }: _*)

  /** Write-once LSH corpus index: (n_id, tbl, bucket) — narrow (3 longs
    * per row, vectors stay out of it). Persisted and memoized per
    * (session, dir) so repeated query batches reuse one computed copy,
    * the cross-batch reuse the index shape exists for.
    */
  private val corpusIndexCache =
    new scala.collection.concurrent.TrieMap[(SparkSession, String), (Int, DataFrame)]

  /** The live write-once session-index frames — the ONE documented
    * session-level cache contract in the library (a corpus index is
    * persisted per (session, dir) so repeated query batches reuse one
    * computed copy; that is the reuse the index shape exists for).
    * CacheContractSpec releases these after each sweep step so the
    * empty-cache invariant can be asserted around the contract. */
  private[graft] def sessionIndexFrames: Seq[DataFrame] =
    corpusIndexCache.values.map(_._2).toSeq

  /** (planesUsed, index): planesUsed = [[adaptivePlanes]] of the corpus
    * count (one metadata-cheap count job, paid once per (session, dir)
    * — the price of holding bucket occupancy ~constant at any corpus
    * size); the index is (n_id, tbl, bucket), narrow, persisted. */
  def lshCorpusIndex(spark: SparkSession, dir: String): (Int, DataFrame) =
    corpusIndexCache.getOrElseUpdate((spark, dir), {
      import spark.implicits._
      val corpus = Tables.embeddings(spark, dir).filter($"vec_id" >= 8)
      val k = adaptivePlanes(corpus.count())
      (k, corpus
        .select($"vec_id".as("n_id"), explode(lshIndexEntriesK($"embedding", k)).as("nk"))
        .select($"n_id", $"nk.tbl".as("tbl"), $"nk.bucket".as("bucket"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    })

  /** ANN via multi-table LSH bucketing: candidates from any shared
    * bucket, exact-ranked. Recall vs brute force is spec-verified.
    *
    * Scale shape: the (tbl, bucket) equi-join and the candidate
    * `distinct` carry only (q_id, n_id) ids — no vectors ride a shuffle;
    * vectors are rejoined by id afterwards (corpus side by hash join,
    * query side broadcast).
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val (planesUsed, corpusIdx) = lshCorpusIndex(spark, dir)
    val qIdx = e.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"),
        explode(lshIndexEntriesK($"embedding", planesUsed)).as("qk"))
      .select($"q_id", $"qk.tbl".as("tbl"), $"qk.bucket".as("bucket"))
    val cand = corpusIdx.join(broadcast(qIdx), Seq("tbl", "bucket"))
      .select($"q_id", $"n_id").distinct()
    val qVecs = e.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        Dedup.norm($"embedding").as("q_norm"))
    val nVecs = e.filter($"vec_id" >= 8)
      .select($"vec_id".as("n_id"), $"embedding".as("n_vec"),
        Dedup.norm($"embedding").as("n_norm"))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"n_id")
    cand.join(nVecs, "n_id").join(broadcast(qVecs), "q_id")
      .withColumn("cos", Dedup.cosinePre($"q_vec", $"n_vec", $"q_norm", $"n_norm"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"q_id", $"rk", $"n_id", round($"cos", 6).as("cos_sim"))
      .orderBy($"q_id", $"rk")
  }

  /** DuckDB oracle for the full LSH path. The plane vectors are
    * deterministic driver-side constants, so they are embedded as
    * literal DOUBLE[] rows (float→double is exact and Double.toString
    * round-trips); bucketing, candidate generation, and exact ranking
    * are then plain SQL. Bucket bits OR to a sum because the powers of
    * two are distinct.
    */
  /** The plane vectors as literal SQL VALUES rows — shared by every
    * oracle that replays the LSH bucketing (annLshSql, Training's
    * embedding_communities). float→double is exact and Double.toString
    * round-trips. */
  private[graft] val lshPlaneRowsSql: String = (for {
    t <- 0 until NumTables
    p <- 0 until PlanesPerTable
  } yield {
    val vec = planeVector(t * PlanesPerTable + p)
      .map(v => v.toDouble.toString).mkString("[", ", ", "]")
    s"($t, $p, CAST($vec AS DOUBLE[]))"
  }).mkString(",\n      ")

  /** The full MaxPlanesPerTable-deep plane bank as literal VALUES rows
    * — for oracles replaying the ADAPTIVE bucketing (annLshSql). The
    * first PlanesPerTable rows per table are byte-identical to
    * [[lshPlaneRowsSql]] (planeId keeps legacy ids), so fixed-4-plane
    * oracles and adaptive ones agree wherever the corpus is small. */
  private[graft] val lshPlaneRowsExtSql: String = (for {
    t <- 0 until NumTables
    p <- 0 until MaxPlanesPerTable
  } yield {
    val vec = planeVector(planeId(t, p))
      .map(v => v.toDouble.toString).mkString("[", ", ", "]")
    s"($t, $p, CAST($vec AS DOUBLE[]))"
  }).mkString(",\n      ")

  val annLshSql: String = {
    val planeRows = lshPlaneRowsExtSql
    s"""WITH planes(tbl, p, pv) AS (VALUES
      |      $planeRows),
      |np AS (SELECT $adaptivePlanesCaseSql AS k
      |  FROM embeddings WHERE vec_id >= 8),
      |corpus_b AS (
      |  SELECT e.vec_id AS n_id, pl.tbl,
      |    CAST(sum(CASE WHEN pl.p < np.k
      |      AND list_inner_product(CAST(e.embedding AS DOUBLE[]), pl.pv) > 0
      |      THEN (1 << pl.p) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM embeddings e, planes pl, np WHERE e.vec_id >= 8
      |  GROUP BY e.vec_id, pl.tbl),
      |query_b AS (
      |  SELECT e.vec_id AS q_id, pl.tbl,
      |    CAST(sum(CASE WHEN pl.p < np.k
      |      AND list_inner_product(CAST(e.embedding AS DOUBLE[]), pl.pv) > 0
      |      THEN (1 << pl.p) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM embeddings e, planes pl, np WHERE e.vec_id < 8
      |  GROUP BY e.vec_id, pl.tbl),
      |cand AS (
      |  SELECT DISTINCT q.q_id, c.n_id
      |  FROM corpus_b c JOIN query_b q ON c.tbl = q.tbl AND c.bucket = q.bucket),
      |scored AS (
      |  SELECT cand.q_id, cand.n_id,
      |    list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]), CAST(ne.embedding AS DOUBLE[])) AS cos
      |  FROM cand JOIN embeddings qe ON cand.q_id = qe.vec_id
      |            JOIN embeddings ne ON cand.n_id = ne.vec_id),
      |ranked AS (
      |  SELECT q_id, n_id, cos,
      |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
      |  FROM scored)
      |SELECT q_id, rk, n_id, round(cos, 6) AS cos_sim
      |FROM ranked WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin
  }

  /** Multi-probe LSH (Lv et al., VLDB 2007): each query probes its own
    * bucket PLUS the k buckets at Hamming distance 1 (every single sign
    * bit flipped) in every table — the recall of ~k extra tables for
    * the cost of k extra index LOOKUPS, with zero extra index build or
    * storage. The corpus index is untouched (same write-once
    * [[lshCorpusIndex]]); only the query side fans out (k+1)×, and the
    * probe set is deterministic (all 1-flips, no margin ordering), so
    * the oracle replays it as a bit_count(xor) ≤ 1 bucket join.
    *
    * Scale shape: identical to [[annLsh]] — the (tbl, bucket) equi-join
    * carries ids only, the query side stays broadcast-sized (queries ×
    * tables × (k+1) rows), and candidate mass per query is bounded by
    * (k+1)·tables·occupancy with the same adaptive-k occupancy bound.
    * Recall ≥ [[annLsh]]'s by construction (probe superset) —
    * spec-verified, with the exact-rank tail identical.
    */
  def annLshMultiprobe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val (planesUsed, corpusIdx) = lshCorpusIndex(spark, dir)
    val probes = array(($"bucket" +: (0 until planesUsed).map(p =>
      $"bucket".bitwiseXOR(lit(1L << p)))): _*)
    val qIdx = e.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"),
        explode(lshIndexEntriesK($"embedding", planesUsed)).as("qk"))
      .select($"q_id", $"qk.tbl".as("tbl"), $"qk.bucket".as("bucket"))
      .select($"q_id", $"tbl", explode(probes).as("bucket"))
    val cand = corpusIdx.join(broadcast(qIdx), Seq("tbl", "bucket"))
      .select($"q_id", $"n_id").distinct()
    val qVecs = e.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        Dedup.norm($"embedding").as("q_norm"))
    val nVecs = e.filter($"vec_id" >= 8)
      .select($"vec_id".as("n_id"), $"embedding".as("n_vec"),
        Dedup.norm($"embedding").as("n_norm"))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"n_id")
    cand.join(nVecs, "n_id").join(broadcast(qVecs), "q_id")
      .withColumn("cos", Dedup.cosinePre($"q_vec", $"n_vec", $"q_norm", $"n_norm"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"q_id", $"rk", $"n_id", round($"cos", 6).as("cos_sim"))
      .orderBy($"q_id", $"rk")
  }

  /** [[annLshSql]] with the candidate join widened from bucket equality
    * to Hamming distance ≤ 1 between query and corpus buckets — the
    * exact set the all-1-flips probe fan-out reaches. */
  val annLshMultiprobeSql: String = {
    val planeRows = lshPlaneRowsExtSql
    s"""WITH planes(tbl, p, pv) AS (VALUES
      |      $planeRows),
      |np AS (SELECT $adaptivePlanesCaseSql AS k
      |  FROM embeddings WHERE vec_id >= 8),
      |corpus_b AS (
      |  SELECT e.vec_id AS n_id, pl.tbl,
      |    CAST(sum(CASE WHEN pl.p < np.k
      |      AND list_inner_product(CAST(e.embedding AS DOUBLE[]), pl.pv) > 0
      |      THEN (1 << pl.p) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM embeddings e, planes pl, np WHERE e.vec_id >= 8
      |  GROUP BY e.vec_id, pl.tbl),
      |query_b AS (
      |  SELECT e.vec_id AS q_id, pl.tbl,
      |    CAST(sum(CASE WHEN pl.p < np.k
      |      AND list_inner_product(CAST(e.embedding AS DOUBLE[]), pl.pv) > 0
      |      THEN (1 << pl.p) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM embeddings e, planes pl, np WHERE e.vec_id < 8
      |  GROUP BY e.vec_id, pl.tbl),
      |cand AS (
      |  SELECT DISTINCT q.q_id, c.n_id
      |  FROM corpus_b c JOIN query_b q ON c.tbl = q.tbl
      |    AND bit_count(xor(c.bucket, q.bucket)) <= 1),
      |scored AS (
      |  SELECT cand.q_id, cand.n_id,
      |    list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]), CAST(ne.embedding AS DOUBLE[])) AS cos
      |  FROM cand JOIN embeddings qe ON cand.q_id = qe.vec_id
      |            JOIN embeddings ne ON cand.n_id = ne.vec_id),
      |ranked AS (
      |  SELECT q_id, n_id, cos,
      |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
      |  FROM scored)
      |SELECT q_id, rk, n_id, round(cos, 6) AS cos_sim
      |FROM ranked WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin
  }

  /** kNN label classification: each query vector takes the majority
    * label of its 5 nearest corpus neighbors (ties → smaller label) —
    * embedding-space inference for labeling/routing pipelines. Queries
    * broadcast with their labels; the corpus is scanned, never
    * shuffled; per-query neighbor ranks are WindowGroupLimit-pruned;
    * the vote is a tiny (query × label) aggregate. Deterministic
    * neighbor and vote ordering makes the prediction exact.
    */
  /** Hard-negative mining — for each query vector, the most similar
    * corpus vectors with a DIFFERENT label: the pairs a contrastive /
    * embedding-finetune pipeline trains against ("closest thing that
    * should be far"). Same broadcast-query/scan-only-corpus shape as
    * [[annBruteforce]] with a label-disagreement filter BEFORE the
    * rank, so negatives from dominant classes can't crowd the window.
    */
  def knnHardNegatives(spark: SparkSession, dir: String,
      topK: Int = 3, nQueries: Int = 8): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"label".as("q_label"),
        $"embedding".as("q_vec"), Dedup.norm($"embedding").as("q_norm"))
    val corpus = e.filter($"vec_id" >= nQueries)
      .select($"vec_id".as("n_id"), $"label".as("n_label"),
        $"embedding".as("n_vec"), Dedup.norm($"embedding").as("n_norm"))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"n_id")
    corpus.crossJoin(broadcast(q))
      .filter($"n_label" =!= $"q_label")
      .withColumn("cos", Dedup.cosinePre($"q_vec", $"n_vec", $"q_norm", $"n_norm"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= topK)
      .select($"q_id", $"q_label", $"rk", $"n_id", $"n_label",
        round($"cos", 6).as("cos_sim"))
      .orderBy($"q_id", $"rk")
  }

  val knnHardNegativesSql: String =
    """SELECT q_id, q_label, rk, n_id, n_label, round(cos, 6) AS cos_sim FROM (
      |  SELECT q.vec_id AS q_id, q.label AS q_label,
      |    c.vec_id AS n_id, c.label AS n_label,
      |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                           CAST(c.embedding AS DOUBLE[])) AS cos,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                 CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rk
      |  FROM (SELECT * FROM embeddings WHERE vec_id < 8) q,
      |       (SELECT * FROM embeddings WHERE vec_id >= 8) c
      |  WHERE c.label <> q.label) t
      |WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin

  def knnClassify(spark: SparkSession, dir: String,
                  k: Int = 5, nQueries: Int = 40): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"label".as("true_label"),
        $"embedding".as("q_vec"), Dedup.norm($"embedding").as("q_norm"))
    val corpus = e.filter($"vec_id" >= nQueries)
      .select($"vec_id".as("n_id"), $"label".as("n_label"),
        $"embedding".as("n_vec"), Dedup.norm($"embedding").as("n_norm"))
    val wN = Window.partitionBy($"q_id").orderBy($"cos".desc, $"n_id")
    val neighbors = corpus.crossJoin(broadcast(q))
      .withColumn("cos", Dedup.cosinePre($"q_vec", $"n_vec", $"q_norm", $"n_norm"))
      .withColumn("rk", row_number().over(wN))
      .filter($"rk" <= k)
    val wV = Window.partitionBy($"q_id").orderBy($"n_votes".desc, $"n_label")
    neighbors.groupBy($"q_id", $"true_label", $"n_label")
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("vrk", row_number().over(wV))
      .filter($"vrk" === 1)
      .select($"q_id", $"true_label", $"n_label".as("predicted_label"),
        $"n_votes", ($"n_label" === $"true_label").as("correct"))
      .orderBy($"q_id")
  }

  val knnClassifySql: String =
    """WITH q AS (SELECT vec_id AS q_id, label AS true_label, embedding
      |           FROM embeddings WHERE vec_id < 40),
      |c AS (SELECT vec_id AS n_id, label AS n_label, embedding
      |      FROM embeddings WHERE vec_id >= 40),
      |nb AS (
      |  SELECT q_id, true_label, n_label,
      |    row_number() OVER (PARTITION BY q_id ORDER BY
      |      list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                             CAST(c.embedding AS DOUBLE[])) DESC, n_id) AS rk
      |  FROM q, c),
      |votes AS (
      |  SELECT q_id, true_label, n_label, count(*) AS n_votes
      |  FROM nb WHERE rk <= 5 GROUP BY 1, 2, 3),
      |best AS (
      |  SELECT votes.*, row_number() OVER (PARTITION BY q_id
      |    ORDER BY n_votes DESC, n_label) AS vrk FROM votes)
      |SELECT q_id, true_label, n_label AS predicted_label, n_votes,
      |  n_label = true_label AS correct
      |FROM best WHERE vrk = 1 ORDER BY q_id""".stripMargin

  /** ANN by RANDOM-PROJECTION CASCADE: corpus and queries are
    * projected 64→16 dims by the hash-derived JL matrix
    * ([[Embeddings.embeddingRp]]'s `RpProject` kernel), a per-query
    * SHORTLIST of 50 candidates is ranked by exact integer squared-L2
    * between the micro-unit sketches, and only the shortlist is
    * re-ranked by exact micro-grid 64-dim distance — the codebook-free
    * sibling of [[PqIndex.annPq]]'s ADC+R shape (nothing to train or
    * ship; the projection is a pure function of (i, j)).
    *
    * A sketch SHORTLISTS, it must not fine-rank: within a tight
    * cluster the 16-dim distances cannot order candidates (measured
    * recall@5 0.24 even on well-separated planted clusters when
    * ranking in sketch space alone; 0.96 once the exact re-rank owns
    * the final order — RpHitsSpec pins both tiers' contracts).
    *
    * Unlike IVF/PQ this cascade is fully ORACLED: the sketch is
    * integer-exact, and the re-rank distance is an order-free INTEGER
    * sum of squared micro-unit diffs, so the DuckDB mirror replays
    * every tier bit-identically.
    *
    * Scale: projections fuse into each side's scan (native kernel,
    * zero shuffle); the sketch scan touches 16 longs instead of 64
    * floats per row; original vectors are read only for ~50 rows per
    * query via an id hash-join.
    */
  def annRp(spark: SparkSession, dir: String, topK: Int = 5): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    annRpOn(
      e.filter($"vec_id" >= 8).select($"vec_id".as("n_id"), $"embedding".as("n_vec")),
      e.filter($"vec_id" < 8).select($"vec_id".as("q_id"), $"embedding".as("q_vec")),
      topK)
  }

  private val RpShortlist = 50

  /** [[annRp]] over explicit corpus/queries frames (RpHitsSpec drives
    * it over a planted clustered fixture — on near-isotropic data even
    * the shortlist tier is contrast-bound, like every ANN tier here).
    */
  private[graft] def annRpOn(corpus: DataFrame, queries: DataFrame,
                             topK: Int): DataFrame = {
    import corpus.sparkSession.implicits._
    val q = queries.select($"q_id", $"q_vec",
      graft.functions.VectorFunctions.rp_project($"q_vec", 16).as("qp"))
    val c = corpus.select($"n_id",
      graft.functions.VectorFunctions.rp_project($"n_vec", 16).as("np"))
    val w = Window.partitionBy($"q_id").orderBy($"d".asc, $"n_id")
    val shortlist = c.crossJoin(broadcast(q.select($"q_id", $"qp")))
      .withColumn("d", expr(
        "aggregate(zip_with(qp, np, (a, b) -> (a - b) * (a - b)), " +
          "cast(0 as bigint), (acc, x) -> acc + x)"))
      .withColumn("ark", row_number().over(w))
      .filter($"ark" <= RpShortlist)
      .select($"q_id", $"n_id", $"d".as("rp_dist_u"))
    // exact re-rank on the ORIGINAL vectors, micro-grid integer sums —
    // order-free, so engine-exact without any float-accumulation care
    val wr = Window.partitionBy($"q_id").orderBy($"d_u".asc, $"n_id")
    shortlist
      .join(corpus, "n_id")
      .join(broadcast(q.select($"q_id", $"q_vec")), "q_id")
      .withColumn("d_u", expr(
        "aggregate(zip_with(" +
          "transform(q_vec, x -> cast(round(cast(x as double) * 1000000, 0) as bigint)), " +
          "transform(n_vec, x -> cast(round(cast(x as double) * 1000000, 0) as bigint)), " +
          "(a, b) -> (a - b) * (a - b)), cast(0 as bigint), (acc, x) -> acc + x)"))
      .withColumn("rk", row_number().over(wr))
      .filter($"rk" <= topK)
      .select($"q_id", $"rk", $"n_id", $"rp_dist_u", $"d_u")
      .orderBy($"q_id", $"rk")
  }

  val annRpSql: String =
    """WITH cells AS (
      |  SELECT e.vec_id, CAST(j AS INT) AS rp_dim,
      |    CAST(sum(CAST(round(CAST(e.embedding[i + 1] AS DOUBLE) * 1000000, 0)
      |        AS BIGINT)
      |      * (CASE WHEN (CAST(i AS BIGINT) * 16 + CAST(j AS BIGINT) + 17)
      |             * (CAST(i AS BIGINT) * 16 + CAST(j AS BIGINT) + 17)
      |             * (CAST(i AS BIGINT) * 16 + CAST(j AS BIGINT) + 17)
      |             % 1000003 % 2 = 0
      |         THEN 1 ELSE -1 END)) AS BIGINT) AS proj_u
      |  FROM embeddings e
      |  CROSS JOIN (SELECT unnest(range(0, 16)) AS j)
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i)
      |  GROUP BY e.vec_id, j),
      |v AS (
      |  SELECT vec_id, list(proj_u ORDER BY rp_dim) AS p FROM cells
      |  GROUP BY vec_id),
      |pairs AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
      |    CAST(list_sum(list_transform(range(1, 17),
      |      i -> (q.p[i] - c.p[i]) * (q.p[i] - c.p[i]))) AS BIGINT) AS d
      |  FROM (SELECT * FROM v WHERE vec_id < 8) q,
      |       (SELECT * FROM v WHERE vec_id >= 8) c),
      |short AS (
      |  SELECT q_id, n_id, d AS rp_dist_u,
      |    row_number() OVER (PARTITION BY q_id ORDER BY d, n_id) AS ark
      |  FROM pairs),
      |rer AS (
      |  SELECT s.q_id, s.n_id, s.rp_dist_u,
      |    CAST(list_sum(list_transform(range(1, 65), i ->
      |      (CAST(round(CAST(q.embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT)
      |        - CAST(round(CAST(c.embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT))
      |      * (CAST(round(CAST(q.embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT)
      |        - CAST(round(CAST(c.embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT))))
      |      AS BIGINT) AS d_u
      |  FROM short s
      |  JOIN embeddings q ON s.q_id = q.vec_id
      |  JOIN embeddings c ON s.n_id = c.vec_id
      |  WHERE s.ark <= 50),
      |r AS (
      |  SELECT q_id, n_id, rp_dist_u, d_u,
      |    row_number() OVER (PARTITION BY q_id ORDER BY d_u, n_id) AS rk
      |  FROM rer)
      |SELECT q_id, CAST(rk AS INT) AS rk, n_id, rp_dist_u, d_u
      |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  // ------------------------------------------------------------------
  // bitext_mine — margin-based cross-corpus pair mining
  // ------------------------------------------------------------------

  val BitextBatch = 64
  val BitextNbrK = 4
  val BitextTopPairs = 40

  /** Margin-criterion parallel-pair mining (the LASER/CCMatrix ratio
    * margin re-expressed in exact integers): mine high-confidence
    * aligned pairs between two halves of the embedding space (labels
    * 0-4 = "source side", 5-9 = "target side" — stand-ins for two
    * languages or two modalities). A pair scores by its similarity
    * RELATIVE to each endpoint's neighborhood:
    * margin = sim(x,y) / mean(top-k sims of x, top-k sims of y) —
    * global-threshold mining drowns in hubness; the margin is the
    * published fix.
    *
    * Exactness: components kilo-quantized; sim is squared cosine in
    * micro-units via DECIMAL(38,0) floor-division (dot² ≤ n2x·n2y by
    * Cauchy–Schwarz, so every intermediate is exact and the margin
    * numerator cos2·2e6 ≤ 2e12 stays a long). Only dot > 0 pairs
    * compete (squared cosine would otherwise rank anti-parallel pairs
    * high). Top-k neighborhood sums are tie-insensitive (equal scores
    * at the boundary contribute equally), so the bounded-state
    * `top_k_by` aggregate and the oracle's window rank agree exactly.
    *
    * Scale: the source side rides as a BROADCAST batch (BitextBatch
    * lowest vec_ids — production mines in batches); the corpus side is
    * scanned once, pairs are 3-long rows (batch×corpus, linear in the
    * corpus), per-target neighborhoods come from the map-side-partial
    * top_k_by aggregate (no corpus-keyed window sort), and the final
    * cut is a TakeOrdered. At full-corpus×corpus scale the batch loop
    * is embarrassingly parallel across batches, or the pair generation
    * swaps to the persisted LSH band index (ann_lsh) — the margin math
    * is unchanged either way.
    */
  def bitextMine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val kq = transform($"embedding", x => round(x.cast("double") * 1000d, 0).cast("long"))
    val e = Tables.embeddings(spark, dir).withColumn("kq", kq)
    val batch = e.filter($"label" <= 4)
      .select($"vec_id".as("src_id"), $"kq".as("s_kq"))
      .orderBy($"src_id").limit(BitextBatch)
      .withColumn("s_n2", n2_of($"s_kq"))
    val corpus = e.filter($"label" >= 5)
      .select($"vec_id".as("tgt_id"), $"kq".as("t_kq"))
      .withColumn("t_n2", n2_of($"t_kq"))
    val dot = aggregate(zip_with($"s_kq", $"t_kq", (a, b) => a * b),
      lit(0L), (a, x) => a + x)
    val cos2 = {
      val num = dec($"dot") * dec($"dot") * lit(1000000L).cast("decimal(38,0)")
      val den = dec($"s_n2") * dec($"t_n2")
      ((num - (num % den)) / den).cast("long")
    }
    val pairs = corpus.crossJoin(broadcast(batch))
      .withColumn("dot", dot).filter($"dot" > 0)
      .withColumn("cos2_micro", cos2)
      .select($"src_id", $"tgt_id", $"cos2_micro")
      .persist()
    def nbrOf(df: DataFrame, key: String, payload: String): DataFrame = {
      val sumTop = aggregate($"top", lit(0L), (a, s) => a + s.getField("score").cast("long"))
      df.groupBy(col(key))
        .agg(graft.functions.AggFunctions
          .top_k_by($"cos2_micro".cast("double"), col(payload), BitextNbrK).as("top"))
        .select(col(key), fdivL(sumTop, size($"top").cast("long")).as(s"nbr_$key"))
    }
    val nq = nbrOf(pairs, "src_id", "tgt_id")
    val nc = nbrOf(pairs, "tgt_id", "src_id")
    val out = pairs
      .join(broadcast(nq), "src_id")
      .join(nc, "tgt_id")
      .filter($"nbr_src_id" + $"nbr_tgt_id" > 0)
      .withColumn("margin_micro",
        fdivL($"cos2_micro" * lit(2000000L), $"nbr_src_id" + $"nbr_tgt_id"))
      .select($"src_id", $"tgt_id", $"cos2_micro", $"margin_micro")
      .orderBy($"margin_micro".desc, $"src_id", $"tgt_id")
      .limit(BitextTopPairs)
    Release.grid(out, pairs) // ≤ BitextTopPairs rows
  }

  /** Σ kq² of a kilo-quantized component array. */
  private def n2_of(kqCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(transform(kqCol, x => x * x), lit(0L), (a, x) => a + x)

  /** Exact long floor division, non-negative operands (Dedup/Training
    * convention): a − a%b is an exact multiple of b. */
  private def fdivL(a: org.apache.spark.sql.Column,
                    b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ((a - (a % b)) / b).cast("long")

  val bitextMineSql: String =
    s"""WITH comp AS (
      |  SELECT e.vec_id, e.label, CAST(i AS INT) AS dim,
      |    CAST(round(CAST(e.embedding[i + 1] AS DOUBLE) * 1000, 0) AS BIGINT) AS kq
      |  FROM embeddings e CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
      |n2 AS (SELECT vec_id, CAST(sum(kq * kq) AS BIGINT) AS n2 FROM comp GROUP BY 1),
      |batch AS (SELECT vec_id FROM embeddings WHERE label <= 4
      |  ORDER BY vec_id LIMIT $BitextBatch),
      |dots AS (
      |  SELECT q.vec_id AS src_id, c.vec_id AS tgt_id,
      |    CAST(sum(q.kq * c.kq) AS BIGINT) AS dot
      |  FROM comp q JOIN batch b ON q.vec_id = b.vec_id
      |  JOIN comp c ON c.dim = q.dim AND c.label >= 5
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT d.src_id, d.tgt_id,
      |    CAST((CAST(d.dot AS HUGEINT) * d.dot * 1000000)
      |      // (CAST(nq.n2 AS HUGEINT) * nc.n2) AS BIGINT) AS cos2_micro
      |  FROM dots d
      |  JOIN n2 nq ON nq.vec_id = d.src_id
      |  JOIN n2 nc ON nc.vec_id = d.tgt_id
      |  WHERE d.dot > 0),
      |nbrq AS (
      |  SELECT src_id,
      |    CAST(sum(cos2_micro) - sum(cos2_micro) % count(*) AS BIGINT) // count(*) AS nbr
      |  FROM (SELECT src_id, cos2_micro, row_number() OVER (
      |          PARTITION BY src_id ORDER BY cos2_micro DESC, tgt_id) AS rk
      |        FROM pairs) t WHERE rk <= $BitextNbrK GROUP BY src_id),
      |nbrc AS (
      |  SELECT tgt_id,
      |    CAST(sum(cos2_micro) - sum(cos2_micro) % count(*) AS BIGINT) // count(*) AS nbr
      |  FROM (SELECT tgt_id, cos2_micro, row_number() OVER (
      |          PARTITION BY tgt_id ORDER BY cos2_micro DESC, src_id) AS rk
      |        FROM pairs) t WHERE rk <= $BitextNbrK GROUP BY tgt_id)
      |SELECT p.src_id, p.tgt_id, p.cos2_micro,
      |  CAST((p.cos2_micro * 2000000 - (p.cos2_micro * 2000000) % (q.nbr + c.nbr))
      |    // (q.nbr + c.nbr) AS BIGINT) AS margin_micro
      |FROM pairs p
      |JOIN nbrq q ON q.src_id = p.src_id
      |JOIN nbrc c ON c.tgt_id = p.tgt_id
      |WHERE q.nbr + c.nbr > 0
      |ORDER BY margin_micro DESC, p.src_id, p.tgt_id
      |LIMIT $BitextTopPairs""".stripMargin

  // ------------------------------------------------------------------
  // rbm_pairs — reciprocal-best-match alignment filter
  // ------------------------------------------------------------------

  /** Reciprocal best match over the [[bitextMine]] bipartite split: a
    * (src, tgt) pair survives only when tgt is src's single best
    * match AND src is tgt's single best match — the classic mutual-
    * nearest-neighbor alignment filter (the precision-first
    * complement of bitext_mine's margin RANKING: margin scores every
    * pair, RBM keeps only the pairs no competitor beats from either
    * side, which is what an alignment pipeline promotes to training
    * data without human review).
    *
    * Exactness: matches are ranked by the same exact integer
    * cos²-micro as bitext_mine (quantized components, HUGEINT-exact
    * ratio), ties broken on the partner id, so best-match identity is
    * bit-stable cross-engine.
    *
    * Scale: the batch side broadcasts (BitextBatch rows); pairs are
    * batch×corpus linear rows; both argmax sides are map-side
    * max_by-style aggregates on ids+scores — the corpus is never
    * self-joined and nothing downstream of the pair stream exceeds
    * id-cardinality.
    */
  def rbmPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val kq = transform($"embedding", x => round(x.cast("double") * 1000d, 0).cast("long"))
    val e = Tables.embeddings(spark, dir).withColumn("kq", kq)
    val batch = e.filter($"label" <= 4)
      .select($"vec_id".as("src_id"), $"kq".as("s_kq"))
      .orderBy($"src_id").limit(BitextBatch)
      .withColumn("s_n2", n2_of($"s_kq"))
    val corpus = e.filter($"label" >= 5)
      .select($"vec_id".as("tgt_id"), $"kq".as("t_kq"))
      .withColumn("t_n2", n2_of($"t_kq"))
    val dot = aggregate(zip_with($"s_kq", $"t_kq", (a, b) => a * b),
      lit(0L), (a, x) => a + x)
    val cos2 = {
      val num = dec($"dot") * dec($"dot") * lit(1000000L).cast("decimal(38,0)")
      val den = dec($"s_n2") * dec($"t_n2")
      ((num - (num % den)) / den).cast("long")
    }
    val pairs = corpus.crossJoin(broadcast(batch))
      .withColumn("dot", dot).filter($"dot" > 0)
      .withColumn("cos2_micro", cos2)
      .select($"src_id", $"tgt_id", $"cos2_micro")
    val fwd = pairs
      .groupBy($"src_id")
      .agg(max(struct($"cos2_micro".as("s"), (-$"tgt_id").as("nid"))).as("m"))
      .select($"src_id", (-$"m.nid").as("tgt_id"))
    val bwd = pairs
      .groupBy($"tgt_id")
      .agg(max(struct($"cos2_micro".as("s"), (-$"src_id").as("nid"))).as("m"))
      .select($"tgt_id", (-$"m.nid").as("src_id"))
    fwd.join(bwd, Seq("src_id", "tgt_id"))
      .join(pairs, Seq("src_id", "tgt_id"))
      .select($"src_id", $"tgt_id", $"cos2_micro",
        round($"cos2_micro".cast("double") / 1e6, 6).as("cos2"))
      .orderBy($"src_id")
  }

  val rbmPairsSql: String =
    s"""WITH comp AS (
      |  SELECT e.vec_id, e.label, CAST(i AS INT) AS dim,
      |    CAST(round(CAST(e.embedding[i + 1] AS DOUBLE) * 1000, 0) AS BIGINT) AS kq
      |  FROM embeddings e CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
      |n2 AS (SELECT vec_id, CAST(sum(kq * kq) AS BIGINT) AS n2 FROM comp GROUP BY 1),
      |batch AS (SELECT vec_id FROM embeddings WHERE label <= 4
      |  ORDER BY vec_id LIMIT $BitextBatch),
      |dots AS (
      |  SELECT q.vec_id AS src_id, c.vec_id AS tgt_id,
      |    CAST(sum(q.kq * c.kq) AS BIGINT) AS dot
      |  FROM comp q JOIN batch b ON q.vec_id = b.vec_id
      |  JOIN comp c ON c.dim = q.dim AND c.label >= 5
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT d.src_id, d.tgt_id,
      |    CAST((CAST(d.dot AS HUGEINT) * d.dot * 1000000)
      |      // (CAST(nq.n2 AS HUGEINT) * nc.n2) AS BIGINT) AS cos2_micro
      |  FROM dots d
      |  JOIN n2 nq ON nq.vec_id = d.src_id
      |  JOIN n2 nc ON nc.vec_id = d.tgt_id
      |  WHERE d.dot > 0),
      |fwd AS (
      |  SELECT src_id, tgt_id FROM (
      |    SELECT src_id, tgt_id, row_number() OVER (
      |      PARTITION BY src_id ORDER BY cos2_micro DESC, tgt_id) AS rk
      |    FROM pairs) t WHERE rk = 1),
      |bwd AS (
      |  SELECT src_id, tgt_id FROM (
      |    SELECT src_id, tgt_id, row_number() OVER (
      |      PARTITION BY tgt_id ORDER BY cos2_micro DESC, src_id) AS rk
      |    FROM pairs) t WHERE rk = 1)
      |SELECT f.src_id, f.tgt_id, p.cos2_micro,
      |  round(CAST(p.cos2_micro AS DOUBLE) / 1e6, 6) AS cos2
      |FROM fwd f
      |JOIN bwd b ON b.src_id = f.src_id AND b.tgt_id = f.tgt_id
      |JOIN pairs p ON p.src_id = f.src_id AND p.tgt_id = f.tgt_id
      |ORDER BY f.src_id""".stripMargin

  // ------------------------------------------------------------------
  // label_noise_detect — kNN-disagreement label-error detection
  // ------------------------------------------------------------------

  val NoiseK = 5
  val NoiseMinVotes = 4
  /** LSH buckets larger than this contribute only a deterministic
    * md5-smallest sample of their occupants as pair candidates — the
    * embedding_communities discipline (Training.CommunityBucketCap):
    * sign-LSH has only 2^PlanesPerTable = 16 buckets per table, so
    * occupancy grows LINEARLY with the distinct corpus and an uncapped
    * bucket self-join pays occupancy². The cap bounds the candidate
    * budget at cap²/2 per (table, bucket) at ANY corpus size. */
  val NoiseBucketCap = 64

  /** Deterministic md5-smallest sample of ≤ cap vectors per LSH
    * (tbl, bucket), as a map-side bounded top-k aggregate (top_k_by on
    * the 52-bit md5 prefix — no skewed per-bucket window sort). The
    * `prefix` salts the md5 so each operator draws an independent
    * sample. 52-bit hex prefix is exact in a double; ties (impossible
    * for distinct ids) break to the smaller id. Factored so specs can
    * assert the bound on adversarial bucket pile-ups. */
  private[graft] def cappedLshIndex(reps: DataFrame, prefix: String,
                                    cap: Int): DataFrame = {
    val spark = reps.sparkSession
    import spark.implicits._
    cappedLshKeeps(reps, prefix, cap)
      .select($"tbl", $"bucket", explode($"keep").as("t"))
      .select($"t.payload".as("vec_id"), $"tbl", $"bucket")
  }

  /** The bounded per-(tbl, bucket) keep arrays behind [[cappedLshIndex]]
    * and [[cappedLshPairs]]: one (tbl, bucket, keep) row per occupied
    * bucket, keep = the ≤ cap md5-smallest occupants. */
  private def cappedLshKeeps(reps: DataFrame, prefix: String,
                             cap: Int): DataFrame = {
    val spark = reps.sparkSession
    import spark.implicits._
    val entries = reps
      .select($"vec_id", explode(lshIndexEntries($"embedding")).as("k"))
      .select($"vec_id", $"k.tbl".as("tbl"), $"k.bucket".as("bucket"))
    val u = conv(substring(
      md5(concat(lit(prefix), $"vec_id".cast("string"))), 1, 13), 16, 10)
      .cast("double")
    entries
      .withColumn("negu", -u)
      .groupBy($"tbl", $"bucket")
      .agg(graft.functions.AggFunctions.top_k_by($"negu", $"vec_id", cap).as("keep"))
  }

  /** Distinct candidate pairs (i < j) from the capped LSH buckets —
    * C(n,2) enumerated DIRECTLY from each bucket's keep array with the
    * pair_pack kernel instead of exploding the index and self-joining it
    * back on (tbl, bucket) (guide §2.4: the top-k aggregate's output
    * already holds every bucket's occupants together, so the join
    * exchange bought nothing), and distinct-ed on ONE packed long
    * instead of a two-long pair (§2.3 fewer key bytes). Bit-identical
    * to the self-join formulation (CappedLshPairsSpec pins it); bucket
    * budget still ≤ cap²/2 pairs. pair_pack's [0, 2³¹) range guard
    * throws rather than mis-packs on oversized vec_ids.
    */
  private[graft] def cappedLshPairs(reps: DataFrame, prefix: String,
                                    cap: Int): DataFrame = {
    val spark = reps.sparkSession
    import spark.implicits._
    cappedLshKeeps(reps, prefix, cap)
      .select(explode(graft.functions.HashFunctions.pair_pack(
        sort_array(transform($"keep", t => t.getField("payload"))))).as("pp"))
      .distinct()
      .select(shiftright($"pp", 32).as("i"),
        $"pp".bitwiseAND(lit(0xFFFFFFFFL)).as("j"))
  }

  /** Label-noise detection by k-NN disagreement (the confident-learning
    * screen a labeled training set gets before the labels are trusted):
    * every vector is checked against its NoiseK nearest LSH-candidate
    * neighbors; a vector whose neighborhood votes ≥ NoiseMinVotes for a
    * DIFFERENT label than its own is flagged with the suggested
    * relabel. Full-corpus coverage without a corpus² scan: candidates
    * come from the multi-table LSH band index (bucket-bounded — the
    * embedding_communities discipline), only (id, id, w) rows ride the
    * pair shuffles, and the per-vector top-k is the bounded-state
    * top_k_by aggregate (map-side partial, no corpus-keyed window
    * sort). Majority vote ties break to the smaller label id; cosine
    * rounds to 6dp before micro-quantization so both engines rank
    * identically.
    */
  def labelNoiseDetect(spark: SparkSession, dir: String): DataFrame =
    labelNoiseDetectOf(Tables.embeddings(spark, dir))

  /** Core on any (vec_id, embedding, label) frame — factored so specs
    * can plant label noise and assert recovery. */
  private[graft] def labelNoiseDetectOf(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    labelNoiseVotesOf(e)
      .filter($"suggested_label" =!= $"label" && $"n_votes" >= NoiseMinVotes)
      .select($"vec_id", $"label", $"suggested_label", $"n_votes")
      .orderBy($"vec_id")
  }

  /** Every vector's neighborhood-majority verdict (the table the
    * detector filters): vec_id, label, suggested_label (majority of
    * the NoiseK nearest LSH candidates, ties to smaller label),
    * n_votes. */
  private[graft] def labelNoiseVotesOf(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    // EXACT-DUPLICATE COLLAPSE (the dedup_jaccard_full lesson applied
    // to kNN): cosine and LSH buckets depend only on the vector VALUES,
    // so identical embeddings form one class — candidates, bucket
    // joins, and the d-dimensional cosine kernel all run on class
    // REPRESENTATIVES (work ∝ distinct vectors, immune to clone-heavy
    // corpora), and members re-enter only as bounded id lists. Bit-
    // exactness of the expansion: all members of a neighbor class
    // share one weight, and top_k_by breaks ties by payload ASC, so
    // only a class's k smallest member ids can ever reach any top-k —
    // the slice below drops provably-unreachable rows only. Intra-
    // class neighbors carry w = 10⁶ exactly: cosine(x, x) errs from 1
    // by ≪ 5e-7, so the 6dp round pins it in both engines (the oracle
    // keeps computing per-pair cosines and lands on the same values).
    val classes = e.groupBy($"embedding").agg(
      min($"vec_id").as("rep"),
      sort_array(collect_list($"vec_id")).as("members"))
      .withColumn("nn", slice($"members", 1, NoiseK + 1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val repVecs = classes.select($"rep".as("vec_id"), $"embedding")
    // BUCKET SAMPLE CAP (the embedding_communities discipline): each
    // oversize (tbl, bucket) contributes only a deterministic
    // md5-smallest sample of NoiseBucketCap classes as pair
    // candidates, so the self-join's candidate budget is bounded at
    // cap²/2 per bucket at ANY corpus size — 16 buckets per table
    // means occupancy grows linearly with the distinct corpus, and an
    // uncapped join pays occupancy² (measured 7.4× wall for 10× data
    // before the cap). Dropping oversize buckets outright (the minhash
    // band convention) cannot transfer: every bucket oversizes once
    // the corpus passes ~1k vectors and the verdict table goes
    // vacuous. Dense neighborhoods still surface: every vector keeps
    // all NumTables draws, and a kNN verdict needs any k collisions,
    // not all of them. The join stays NARROW (3 longs per side) and
    // the pair stream is distinct-ed before the cosine kernel.
    // r14: pairs enumerate directly from the capped keep arrays
    // (pair_pack) — the former explode + (tbl, bucket) self-join paid
    // an exchange to reunite rows the aggregate already held together
    val cand = cappedLshPairs(repVecs, "ln:", NoiseBucketCap)
    val vecs = repVecs.select($"vec_id", $"embedding", Dedup.norm($"embedding").as("nrm"))
    val sim = cand
      .join(vecs.select($"vec_id".as("i"), $"embedding".as("ea"), $"nrm".as("na")), "i")
      .join(vecs.select($"vec_id".as("j"), $"embedding".as("eb"), $"nrm".as("nb")), "j")
      .select($"i", $"j",
        round(round(Dedup.cosinePre($"ea", $"eb", $"na", $"nb"), 6) * 1000000d, 0)
          .cast("long").as("w"))
    val mi = classes.select($"rep".as("i"), $"members".as("mi"), $"nn".as("ni"))
    val mj = classes.select($"rep".as("j"), $"members".as("mj"), $"nn".as("nj"))
    val simM = sim.join(mi, "i").join(mj, "j")
    val nbrIJ = simM.select(explode($"mi").as("v"), $"nj".as("ns"), $"w")
      .select($"v", explode($"ns").as("n"), $"w")
    val nbrJI = simM.select(explode($"mj").as("v"), $"ni".as("ns"), $"w")
      .select($"v", explode($"ns").as("n"), $"w")
    val intra = classes.filter(size($"members") >= 2)
      .select(explode($"members").as("v"), $"nn")
      .select($"v", explode($"nn").as("n"))
      .filter($"n" =!= $"v")
      .withColumn("w", lit(1000000L))
    val nbr = nbrIJ.unionByName(nbrJI).unionByName(intra)
    val top = nbr.groupBy($"v")
      .agg(graft.functions.AggFunctions.top_k_by($"w".cast("double"), $"n", NoiseK).as("top"))
      .select($"v", explode($"top").as("t"))
      .select($"v", $"t.payload".as("n"))
    val wV = Window.partitionBy($"v").orderBy($"n_votes".desc, $"cand_label")
    // per-vector verdicts (corpus-cardinality): one eager
    // materialization, then the class cache is released
    Release.checkpointed(
      top.join(e.select($"vec_id".as("n"), $"label".as("cand_label")), "n")
        .groupBy($"v", $"cand_label").agg(count(lit(1)).as("n_votes"))
        .withColumn("vrk", row_number().over(wV)).filter($"vrk" === 1)
        .join(e.select($"vec_id".as("v"), $"label"), "v")
        .select($"v".as("vec_id"), $"label", $"cand_label".as("suggested_label"),
          $"n_votes"),
      classes)
  }

  /** The oracle replays the exact-duplicate collapse, the literal
    * plane bank, the md5-smallest bucket cap, the capped candidate
    * join, and the class expansion. The expansion is deliberately
    * SIMPLER than the engine's (all member pairs instead of the k+1
    * smallest `nn` slice): all members of a neighbor class share one
    * weight and ties break to the smaller id, so only a class's k
    * smallest member ids can ever reach any top-k — the two
    * formulations produce identical verdict tables by construction. */
  val labelNoiseDetectSql: String =
    s"""WITH planes(tbl, p, pv) AS (VALUES
      |      $lshPlaneRowsSql),
      |cls AS MATERIALIZED (
      |  SELECT embedding, min(vec_id) AS rep FROM embeddings GROUP BY embedding),
      |rep AS MATERIALIZED (
      |  SELECT e.vec_id, c.rep FROM embeddings e JOIN cls c ON c.embedding = e.embedding),
      |all_b AS MATERIALIZED (
      |  SELECT c.rep AS vec_id, pl.tbl,
      |    CAST(sum(CASE WHEN list_inner_product(CAST(c.embedding AS DOUBLE[]), pl.pv) > 0
      |      THEN (1 << pl.p) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM cls c, planes pl
      |  GROUP BY c.rep, pl.tbl),
      |idx AS (
      |  SELECT vec_id, tbl, bucket FROM (
      |    SELECT vec_id, tbl, bucket, row_number() OVER (
      |      PARTITION BY tbl, bucket
      |      ORDER BY substr(md5('ln:' || CAST(vec_id AS VARCHAR)), 1, 13), vec_id) AS rk
      |    FROM all_b) t WHERE rk <= $NoiseBucketCap),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
      |  FROM idx a JOIN idx b
      |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
      |sim AS (
      |  SELECT i, j,
      |    CAST(round(round(list_cosine_similarity(
      |      CAST(x.embedding AS DOUBLE[]), CAST(y.embedding AS DOUBLE[])), 6)
      |      * 1000000, 0) AS BIGINT) AS w
      |  FROM cand JOIN cls x ON x.rep = i
      |  JOIN cls y ON y.rep = j),
      |cross1 AS (
      |  SELECT ra.vec_id AS v, rb.vec_id AS n, s.w
      |  FROM sim s JOIN rep ra ON ra.rep = s.i JOIN rep rb ON rb.rep = s.j),
      |nbr AS (
      |  SELECT v, n, w FROM cross1
      |  UNION ALL SELECT n, v, w FROM cross1
      |  UNION ALL
      |  SELECT a.vec_id, b.vec_id, CAST(1000000 AS BIGINT)
      |  FROM rep a JOIN rep b ON a.rep = b.rep AND a.vec_id <> b.vec_id),
      |top AS (
      |  SELECT v, n FROM (
      |    SELECT v, n, row_number() OVER (PARTITION BY v ORDER BY w DESC, n) AS rk
      |    FROM nbr) t WHERE rk <= $NoiseK),
      |votes AS (
      |  SELECT t.v, e.label AS cand_label, CAST(count(*) AS BIGINT) AS n_votes
      |  FROM top t JOIN embeddings e ON e.vec_id = t.n GROUP BY 1, 2),
      |best AS (
      |  SELECT votes.*, row_number() OVER (PARTITION BY v
      |    ORDER BY n_votes DESC, cand_label) AS vrk FROM votes)
      |SELECT b.v AS vec_id, e.label AS label, b.cand_label AS suggested_label,
      |  b.n_votes
      |FROM best b JOIN embeddings e ON e.vec_id = b.v
      |WHERE b.vrk = 1 AND b.cand_label <> e.label AND b.n_votes >= $NoiseMinVotes
      |ORDER BY vec_id""".stripMargin

  // ------------------------------------------------------------------
  // ann_eval — recall@k of the LSH index vs exact brute force
  // ------------------------------------------------------------------

  /** Recall@5 of [[annLsh]] against [[annBruteforce]] as a DRIVER-
    * VISIBLE oracled query (the recall evidence previously lived only
    * in specs): per query the top-5 set intersection over the exact
    * ground truth, as an exact micro fraction, plus the query-macro
    * mean carried on every row — the accept/reject readout an ANN
    * index gets before it replaces the exact path in a pipeline.
    * Both inputs are themselves fully oracled operators, so the eval
    * composes their SQL verbatim and stays hash-exact end to end —
    * unlike the IVF/PQ rows-only bounds, this recall number is
    * bit-checked in both engines.
    *
    * Scale: inherits the two parents' shapes; the eval itself joins
    * two (queries×5)-row frames — query-batch cardinality, nothing
    * corpus-sized. */
  def annEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bf = annBruteforce(spark, dir).select($"q_id", $"n_id")
    val lsh = annLsh(spark, dir).select($"q_id", $"n_id")
    val base = bf.groupBy($"q_id").agg(count(lit(1)).as("k"))
    val hits = bf.join(lsh, Seq("q_id", "n_id"))
      .groupBy($"q_id").agg(count(lit(1)).as("n_hits"))
    def fdiv(a: org.apache.spark.sql.Column,
             b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      ((a - ((a % b + b) % b)) / b).cast("long")
    val perQ = base.join(hits, Seq("q_id"), "left")
      .withColumn("n_hits", coalesce($"n_hits", lit(0L)))
      .withColumn("recall_micro", fdiv($"n_hits" * 1000000L, $"k"))
    val overall = perQ.agg(
      fdiv(sum($"recall_micro"), count(lit(1))).as("mean_recall_micro"))
    perQ.crossJoin(broadcast(overall))
      .select($"q_id", $"k".cast("int").as("k"), $"n_hits",
        $"recall_micro", $"mean_recall_micro")
      .orderBy($"q_id")
  }

  val annEvalSql: String =
    s"""WITH bf AS ($annBruteforceSql),
      |lsh AS ($annLshSql),
      |base AS (SELECT q_id, CAST(count(*) AS BIGINT) AS k FROM bf GROUP BY q_id),
      |hits AS (
      |  SELECT bf.q_id, CAST(count(*) AS BIGINT) AS n_hits
      |  FROM bf JOIN lsh ON bf.q_id = lsh.q_id AND bf.n_id = lsh.n_id
      |  GROUP BY bf.q_id),
      |perq AS (
      |  SELECT base.q_id, base.k, COALESCE(hits.n_hits, 0) AS n_hits,
      |    CAST((COALESCE(hits.n_hits, 0) * 1000000
      |      - ((COALESCE(hits.n_hits, 0) * 1000000 % base.k + base.k) % base.k))
      |      / base.k AS BIGINT) AS recall_micro
      |  FROM base LEFT JOIN hits ON base.q_id = hits.q_id),
      |o AS (
      |  SELECT CAST((sum(recall_micro)
      |    - ((sum(recall_micro) % count(*) + count(*)) % count(*)))
      |    / count(*) AS BIGINT) AS mean_recall_micro
      |  FROM perq)
      |SELECT q_id, CAST(k AS INT) AS k, n_hits, recall_micro, mean_recall_micro
      |FROM perq CROSS JOIN o ORDER BY q_id""".stripMargin

  // ------------------------------------------------------------------
  // contrastive_triplets — (anchor, positive, hard-negative) mining
  // ------------------------------------------------------------------

  /** Contrastive-training triplet mining over the labeled embedding
    * corpus: for each anchor (query vector), the POSITIVE is its
    * nearest same-label corpus neighbor and the HARD NEGATIVE its
    * nearest other-label neighbor — the "hardest negative" that
    * dominates contrastive-loss gradients (the standard triplet-mining
    * recipe for embedding/bi-encoder training; [[knnHardNegatives]]
    * mines the negative pool, this emits ready training triplets with
    * their margin pos_cos − neg_cos, the curriculum-ordering signal).
    *
    * Engine-exactness: the AnnExact doctrine — components on the micro
    * integer grid, exact Long dots/norms via the vec_dot_l kernel, the
    * cosine one fixed double tree, margins a difference of those
    * identical doubles, rounded 6dp for display only (ranking uses the
    * unrounded values, bit-equal across engines; ties break on n_id).
    *
    * Scale: anchors broadcast; the corpus is SCANNED once and never
    * shuffled — the positive and the negative are CONDITIONAL
    * struct-maxes of the SAME aggregation (max over (cos, −n_id)
    * structs guarded by the label predicate), so one anchor-keyed
    * exchange carries 2 partial structs per anchor per task, there is
    * no pos/neg self-join, and the whole triplet emerges from a single
    * pass. At 100 TB this is the annTopkAgg aggregate shape with k=1
    * and the class split folded into the aggregate expressions.
    */
  def contrastiveTriplets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.PqFunctions.vec_dot_l
    val q = Tables.embeddings(spark, dir).select($"vec_id", $"label",
      transform($"embedding",
        x => round(x.cast("double") * 1000000d, 0).cast("long")).as("vq"))
    val anchors = q.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"label".as("q_label"), $"vq".as("qv"),
        vec_dot_l($"vq", $"vq").as("qq"))
    val corpus = q.filter($"vec_id" >= 8)
      .select($"vec_id".as("n_id"), $"label".as("n_label"), $"vq".as("nv"),
        vec_dot_l($"vq", $"vq").as("nn"))
    corpus.crossJoin(broadcast(anchors))
      .withColumn("cos", vec_dot_l($"qv", $"nv").cast("double")
        / (sqrt($"qq".cast("double")) * sqrt($"nn".cast("double"))))
      .groupBy($"q_id", $"q_label")
      .agg(
        max(when($"n_label" === $"q_label",
          struct($"cos", (-$"n_id").as("negid")))).as("p"),
        max(when($"n_label" =!= $"q_label",
          struct($"cos", (-$"n_id").as("negid")))).as("ng"))
      // degenerate label splits: an anchor with no same-label (or no
      // other-label) corpus neighbor has no triplet — drop it, matching
      // the oracle's inner rk=1 joins on both sides
      .filter($"p".isNotNull && $"ng".isNotNull)
      .select($"q_id", $"q_label".as("anchor_label"),
        (-$"p.negid").as("pos_id"), round($"p.cos", 6).as("pos_cos"),
        (-$"ng.negid").as("neg_id"), round($"ng.cos", 6).as("neg_cos"),
        round($"p.cos" - $"ng.cos", 6).as("margin"))
      .orderBy($"q_id")
  }

  val contrastiveTripletsSql: String =
    """WITH comp AS MATERIALIZED (
      |  SELECT vec_id, CAST(i AS INT) AS dim,
      |    CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000000, 0) AS BIGINT) AS vq
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
      |nrm AS MATERIALIZED (
      |  SELECT vec_id, CAST(sum(vq * vq) AS BIGINT) AS s2 FROM comp GROUP BY 1),
      |lab AS (SELECT vec_id, label FROM embeddings),
      |dots AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS n_id, CAST(sum(q.vq * c.vq) AS BIGINT) AS dot
      |  FROM comp q JOIN comp c ON q.dim = c.dim AND q.vec_id < 8 AND c.vec_id >= 8
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT d.q_id, d.n_id, lq.label AS q_label,
      |    (lc.label = lq.label) AS same,
      |    CAST(d.dot AS DOUBLE)
      |      / (sqrt(CAST(nq.s2 AS DOUBLE)) * sqrt(CAST(nc.s2 AS DOUBLE))) AS cos
      |  FROM dots d
      |  JOIN nrm nq ON nq.vec_id = d.q_id JOIN nrm nc ON nc.vec_id = d.n_id
      |  JOIN lab lq ON lq.vec_id = d.q_id JOIN lab lc ON lc.vec_id = d.n_id),
      |best AS (
      |  SELECT q_id, q_label, n_id, cos, same,
      |    row_number() OVER (PARTITION BY q_id, same ORDER BY cos DESC, n_id) AS rk
      |  FROM scored)
      |SELECT p.q_id, p.q_label AS anchor_label, p.n_id AS pos_id,
      |  round(p.cos, 6) AS pos_cos, n.n_id AS neg_id, round(n.cos, 6) AS neg_cos,
      |  round(p.cos - n.cos, 6) AS margin
      |FROM best p JOIN best n
      |  ON p.q_id = n.q_id AND p.same AND NOT n.same AND p.rk = 1 AND n.rk = 1
      |ORDER BY p.q_id""".stripMargin

  // ------------------------------------------------------------------
  // rp_band_sweep — measured random-hyperplane LSH planning table
  // ------------------------------------------------------------------

  private val RpBandConfigs = Seq((16, 1), (8, 2), (4, 4), (2, 8))

  /** MEASURED banded random-hyperplane (SimHash-for-cosine) LSH
    * planning table over the embedding corpus — the [[minhash_band_
    * sweep]] twin for vectors (Charikar, STOC 2002): 16 hash-derived
    * hyperplane sign bits per vector, every (bands × bits) split of
    * the signature bucketed, and per config the ACTUAL paired-bucket
    * count, worst bucket, and candidate-pair mass this corpus would
    * generate — read next to the analytic 50%-collision angle
    * (1 − (1 − 2^(−1/b))^(1/r) of π) before sizing an [[annLsh]]
    * deployment. The sweep answers "what does each dial position cost
    * HERE" with measurements, not curves.
    *
    * Exactness: projections are exact integer dot products against the
    * ±1 hash-derived planes ([[annRp]]'s matrix), sign bits pack into
    * ONE long signature (no array keys cross any exchange — band keys
    * are shift/mask integers), bucket math is exact counts; only the
    * analytic threshold column touches doubles (two pows, the minhash
    * sweep precedent). Scale: the signature table computes once
    * (persisted), each config adds one (config, band, key)-grid
    * aggregate over packed longs; candidate mass is counted from
    * bucket sizes — no pair is ever materialized.
    */
  def rpBandSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val proj = Tables.embeddings(spark, dir)
      .select($"vec_id",
        graft.functions.VectorFunctions.rp_project($"embedding", 16).as("p"))
    val sig = proj.select($"vec_id",
        (0 until 16).map(j =>
          when(element_at($"p", j + 1) >= 0L, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exploded = RpBandConfigs.map { case (b, r) =>
      sig.select(
        lit(b.toLong).as("bands"), lit(r.toLong).as("bits_per_band"),
        explode(expr(s"transform(sequence(0, ${b - 1}), g -> named_struct(" +
          s"'band', g, 'key', shiftright(sig, g * $r) & ${(1L << r) - 1}L))"))
          .as("bk"))
        .select($"bands", $"bits_per_band", $"bk.band".as("band"),
          $"bk.key".as("key"))
    }.reduce(_.unionByName(_))
    val out = exploded
      .groupBy($"bands", $"bits_per_band", $"band", $"key")
      .agg(count(lit(1)).as("n"))
      .groupBy($"bands", $"bits_per_band")
      .agg(count(when($"n" >= 2, lit(1))).as("n_buckets_paired"),
        max($"n").as("max_bucket"),
        sum(expr("n * (n - 1) div 2")).as("candidate_pairs"))
      .select($"bands", $"bits_per_band", $"n_buckets_paired",
        $"max_bucket", $"candidate_pairs",
        round(lit(1.0) - pow(lit(1.0) - pow(lit(0.5), lit(1.0) / $"bands"),
          lit(1.0) / $"bits_per_band"), 6).as("est_angle_frac"))
      .orderBy($"bands".desc)
    // |configs| rows at any corpus scale: materialize and release the
    // signature cache (the source_jsd_matrix eager-grid convention)
    val rows = out.collect().toSeq
    sig.unpersist()
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), out.schema)
  }

  val rpBandSweepSql: String =
    """WITH cells AS (
      |  SELECT e.vec_id, CAST(j AS INT) AS rp_dim,
      |    CAST(sum(CAST(round(CAST(e.embedding[i + 1] AS DOUBLE) * 1000000, 0)
      |        AS BIGINT)
      |      * (CASE WHEN (CAST(i AS BIGINT) * 16 + CAST(j AS BIGINT) + 17)
      |             * (CAST(i AS BIGINT) * 16 + CAST(j AS BIGINT) + 17)
      |             * (CAST(i AS BIGINT) * 16 + CAST(j AS BIGINT) + 17)
      |             % 1000003 % 2 = 0
      |         THEN 1 ELSE -1 END)) AS BIGINT) AS proj_u
      |  FROM embeddings e
      |  CROSS JOIN (SELECT unnest(range(0, 16)) AS j)
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i)
      |  GROUP BY e.vec_id, j),
      |sig AS (
      |  SELECT vec_id,
      |    CAST(sum(CASE WHEN proj_u >= 0
      |      THEN CAST(1 AS BIGINT) << rp_dim ELSE 0 END) AS BIGINT) AS sig
      |  FROM cells GROUP BY vec_id),
      |cfg AS (SELECT * FROM (VALUES (CAST(16 AS BIGINT), CAST(1 AS BIGINT)),
      |  (8, 2), (4, 4), (2, 8)) AS t(bands, bits_per_band)),
      |expl AS (
      |  SELECT c.bands, c.bits_per_band, g.g AS band,
      |    (sig >> (g.g * c.bits_per_band))
      |      & ((CAST(1 AS BIGINT) << c.bits_per_band) - 1) AS key
      |  FROM sig CROSS JOIN cfg c
      |  CROSS JOIN LATERAL unnest(range(0, c.bands)) AS g(g)),
      |buckets AS (
      |  SELECT bands, bits_per_band, band, key, CAST(count(*) AS BIGINT) AS n
      |  FROM expl GROUP BY bands, bits_per_band, band, key)
      |SELECT bands, bits_per_band,
      |  CAST(count(CASE WHEN n >= 2 THEN 1 END) AS BIGINT) AS n_buckets_paired,
      |  max(n) AS max_bucket,
      |  CAST(sum((n * (n - 1)) // 2) AS BIGINT) AS candidate_pairs,
      |  round(1.0 - pow(1.0 - pow(0.5, 1.0 / bands), 1.0 / bits_per_band), 6)
      |    AS est_angle_frac
      |FROM buckets GROUP BY bands, bits_per_band ORDER BY bands DESC""".stripMargin

  // ------------------------------------------------------------------
  // ann_rptree — random-projection tree ANN (annoy-style), oracle-exact
  // ------------------------------------------------------------------

  /** Random-projection TREE ANN (the Annoy/Dasgupta–Freund family):
    * a depth-3 binary tree whose internal node k splits on the sign of
    * the hash-derived hyperplane p_k — note each PATH sees different
    * planes (node 2 and node 3 split differently), which is what makes
    * it a tree and not 3-bit hashing — routing every vector to one of
    * 8 leaves; a query probes its own leaf plus the three
    * one-bit-backtrack leaves (flip the level-ℓ decision, re-route
    * below it — defeatist search with single-step spill), and the
    * probed candidates are exact-integer re-ranked. Completes the ANN
    * family's fourth index shape: partition (IVF), hash (LSH/RP),
    * compression (PQ), and now tree.
    *
    * Exactness: projections are the exact ±1 integer dots of
    * [[annRp]], every routing decision is an integer sign test, and
    * the re-rank is the micro-grid integer L2² — the DuckDB oracle
    * replays routing AND backtracking bit-for-bit. Scale: leaf
    * assignment is map-only over a write-once 7-plane model; queries
    * broadcast (4 probe rows each); candidates come from a leaf
    * equi-join — the corpus is never crossed or shuffled; at real
    * scale the forest grows more trees (independent plane banks), each
    * an independent leaf column on the same index table.
    */
  def annRptree(spark: SparkSession, dir: String, topK: Int = 5): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    def quant(v: org.apache.spark.sql.Column) = transform(v,
      x => round(x.cast("double") * 1000000d, 0).cast("long"))
    def withLeafBits(df: DataFrame): DataFrame = {
      val p = graft.functions.VectorFunctions.rp_project($"vec", 16)
      def s(j: org.apache.spark.sql.Column) = when(element_at($"p", j + 1) >= 0L, 1L).otherwise(0L)
      df.withColumn("p", p)
        .withColumn("b0", s(lit(0)))
        .withColumn("b1", s(lit(1) + $"b0".cast("int")))
        .withColumn("b2", s(lit(3) + (lit(2) * $"b0" + $"b1").cast("int")))
    }
    val corpus = withLeafBits(
        e.filter($"vec_id" >= 8).select($"vec_id".as("n_id"), $"embedding".as("vec")))
      .select($"n_id", quant($"vec").as("nv"),
        ($"b0" * 4 + $"b1" * 2 + $"b2").as("leaf"))
    // query probes: own leaf + one-bit backtracks at each level
    // (flipping level 0/1 re-routes the levels BELOW with their planes)
    val qb = withLeafBits(
      e.filter($"vec_id" < 8).select($"vec_id".as("q_id"), $"embedding".as("vec")))
    def sq(j: org.apache.spark.sql.Column) = when(element_at($"p", j + 1) >= 0L, 1L).otherwise(0L)
    val probes = qb
      .withColumn("f0b1", sq(lit(1) + (lit(1) - $"b0").cast("int")))
      .withColumn("f0b2",
        sq(lit(3) + (lit(2) * (lit(1) - $"b0") + $"f0b1").cast("int")))
      .withColumn("f1b2", sq(lit(3) + (lit(2) * $"b0" + (lit(1) - $"b1")).cast("int")))
      .select($"q_id", quant($"vec").as("qv"),
        array(
          ($"b0" * 4 + $"b1" * 2 + $"b2").as("own"),
          ($"b0" * 4 + $"b1" * 2 + (lit(1L) - $"b2")),
          ($"b0" * 4 + (lit(1L) - $"b1") * 2 + $"f1b2"),
          ((lit(1L) - $"b0") * 4 + $"f0b1" * 2 + $"f0b2")).as("pl"))
      .select($"q_id", $"qv", explode(array_distinct($"pl")).as("leaf"))
    val w = Window.partitionBy($"q_id").orderBy($"d2", $"n_id")
    corpus.join(broadcast(probes), "leaf")
      .withColumn("d2", expr(
        "aggregate(zip_with(qv, nv, (a, b) -> (a - b) * (a - b)), " +
          "cast(0 as bigint), (acc, x) -> acc + x)"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= topK)
      .select($"q_id", $"rk", $"n_id",
        round($"d2".cast("double") / 1e12, 6).as("l2_dist"))
      .orderBy($"q_id", $"rk")
  }

  val annRptreeSql: String =
    """WITH cells AS (
      |  SELECT e.vec_id, CAST(j AS INT) AS rp_dim,
      |    CAST(sum(CAST(round(CAST(e.embedding[i + 1] AS DOUBLE) * 1000000, 0)
      |        AS BIGINT)
      |      * (CASE WHEN (CAST(i AS BIGINT) * 16 + CAST(j AS BIGINT) + 17)
      |             * (CAST(i AS BIGINT) * 16 + CAST(j AS BIGINT) + 17)
      |             * (CAST(i AS BIGINT) * 16 + CAST(j AS BIGINT) + 17)
      |             % 1000003 % 2 = 0
      |         THEN 1 ELSE -1 END)) AS BIGINT) AS proj_u
      |  FROM embeddings e
      |  CROSS JOIN (SELECT unnest(range(0, 16)) AS j)
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i)
      |  GROUP BY e.vec_id, j),
      |s AS (
      |  SELECT vec_id,
      |    list(CASE WHEN proj_u >= 0 THEN 1 ELSE 0 END ORDER BY rp_dim) AS sb
      |  FROM cells GROUP BY vec_id),
      |bits AS (
      |  SELECT vec_id, sb,
      |    CAST(sb[1] AS BIGINT) AS b0,
      |    CAST(sb[2 + sb[1]] AS BIGINT) AS b1,
      |    CAST(sb[4 + 2 * sb[1] + sb[2 + sb[1]]] AS BIGINT) AS b2
      |  FROM s),
      |corp AS (
      |  SELECT vec_id AS n_id, b0 * 4 + b1 * 2 + b2 AS leaf
      |  FROM bits WHERE vec_id >= 8),
      |qprobe AS (
      |  SELECT vec_id AS q_id, unnest(list_distinct([
      |    b0 * 4 + b1 * 2 + b2,
      |    b0 * 4 + b1 * 2 + (1 - b2),
      |    b0 * 4 + (1 - b1) * 2 + CAST(sb[4 + 2 * b0 + (1 - b1)] AS BIGINT),
      |    (1 - b0) * 4 + CAST(sb[2 + (1 - b0)] AS BIGINT) * 2
      |      + CAST(sb[4 + 2 * (1 - b0) + sb[2 + (1 - b0)]] AS BIGINT)
      |  ])) AS leaf
      |  FROM bits WHERE vec_id < 8),
      |comp AS (
      |  SELECT vec_id, CAST(i AS INT) AS dim,
      |    CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000000, 0) AS BIGINT) AS vq
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
      |cand AS (
      |  SELECT q.q_id, c.n_id,
      |    CAST(sum((qc.vq - cc.vq) * (qc.vq - cc.vq)) AS BIGINT) AS d2
      |  FROM qprobe q JOIN corp c ON c.leaf = q.leaf
      |  JOIN comp qc ON qc.vec_id = q.q_id
      |  JOIN comp cc ON cc.vec_id = c.n_id AND cc.dim = qc.dim
      |  GROUP BY 1, 2)
      |SELECT q_id, rk, n_id,
      |  round(CAST(d2 AS DOUBLE) / 1000000000000, 6) AS l2_dist FROM (
      |  SELECT q_id, n_id, d2,
      |    row_number() OVER (PARTITION BY q_id ORDER BY d2, n_id) AS rk
      |  FROM cand) t WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin
}
