package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PqFunctions.{pq_dist_table_l, pq_encode_l, vec_centroid_residual_l, vec_dot_l}
import graft.sources.Tables

/** ORACLE-EXACT ANN family: IVF, adaptive-nprobe IVF, PQ, and IVF-PQ
  * re-expressed over the micro-unit integer grid so the ENTIRE
  * pipeline — k-means training, cluster assignment, probe selection,
  * ADC scoring, final ranking — is bit-deterministic and replayable by
  * the DuckDB oracle as one (large, generated) SQL statement per
  * operator. These are the registered `ann_ivf` / `ann_ivf_adaptive` /
  * `ann_pq` / `ann_ivf_pq` queries; the float-kernel library shapes in
  * [[IvfIndex]] / [[PqIndex]] remain as the raw-speed generic path
  * (`annIvfOn`, `annPqAuto`) with their approximation specs.
  *
  * Exactness doctrine (the kmeans_train precedent, Training.scala):
  * components quantize once to round(x·10⁶) longs; every distance /
  * dot / centroid-mean is exact Long or floorDiv arithmetic; the only
  * doubles are the final display expressions (cosine = one fixed tree
  * over three exact integers; l2 = one exact integer scaled by 10¹²),
  * evaluated identically by both engines. Seeding is smallest-id
  * (deterministic under any partitioning); argmin ties break to the
  * smallest cluster/code id (`row_number ORDER BY d2, id`).
  *
  * Scale: training collects only the MODEL per Lloyd iteration
  * (k·64 / M·K·8 longs — never data rows); corpus-side assignment and
  * encode are single static-call codegen kernels fused into the scan
  * ([[graft.functions.PqImpl]]); queries/probe tables/codebooks ride
  * broadcasts; the corpus never shuffles for the model side. The IVF
  * probe scans ≈ nprobe/k of the corpus; PQ scans 5-byte codes and
  * touches original vectors only for the ~topK·factor shortlist.
  *
  * Reference anchor: the reference POC stops at ingest
  * (spark/scripts/consumer.py:68-81); ANN search is part of the
  * training-data-pipeline surface the brief layers on top (Jégou et
  * al., PAMI 2011 for PQ/IVFADC).
  */
object AnnExact {

  private val M = 1000000L // micro-unit grid scale
  private val Dim = 64
  private val TopK = 5

  // IVF dials
  private val IvfK = 8
  private val IvfIters = 3
  private val IvfNprobe = 3
  // adaptive-IVF dials
  private val AdK = 16
  private val AdMaxProbe = 8
  // PQ dials
  private val PqM = 8             // subspaces
  private val PqK = 32            // codes per subspace
  private val PqSubDim = Dim / PqM
  private val PqIters = 3
  private val PqShortFactor = 8

  import Training.fdivSql

  // ------------------------------------------------------------------
  // shared Spark-side machinery
  // ------------------------------------------------------------------

  /** (vec_id, vq: array<long>) corpus/query split on the micro grid. */
  private def quantSplit(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val q = Training.quantizedOf(Tables.embeddings(spark, dir))
    (q.filter($"vec_id" >= 8), q.filter($"vec_id" < 8))
  }

  /** Exact integer squared L2 of a vector column against a literal
    * centroid: d2 = v·v − 2·v·c + c·c via [[vec_dot_l]] (algebraically
    * identical to Σ(v−c)² in exact integers). */
  private def d2Lit(v: Column, c: Array[Long]): Column = {
    val cc = c.map(x => x * x).sum
    vec_dot_l(v, v) - lit(2L) * vec_dot_l(v, typedlit(c.toSeq)) + lit(cc)
  }

  /** Per-query (d2, cluster) rows against every centroid literal. */
  private def centroidScores(q: DataFrame, idCol: String, vecCol: String,
                             cents: Array[Array[Long]]): DataFrame = {
    val spark = q.sparkSession
    import spark.implicits._
    q.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
        explode(array(cents.zipWithIndex.map { case (cv, j) =>
          struct(d2Lit(col(vecCol), cv).as("d2"), lit(j).as("cluster"))
        }.toIndexedSeq: _*)).as("cs"))
      .select($"q_id", $"qv", $"cs.d2".as("d2"), $"cs.cluster".as("cluster"))
  }

  /** Exact-integer per-subspace Lloyd's: the [[Training.lloydCentroids]]
    * discipline applied to [[PqIndex]]'s subspace decomposition — all
    * `subs` subspaces refit in ONE distributed job per iteration
    * (explode to (sub, code, pos) partial sums; only subs·k·subDim
    * longs collect), smallest-id seeds, floorDiv means, empty codes
    * keep their previous centroid. */
  private[graft] def pqLloydL(quant: DataFrame, vecCol: String,
                              k: Int, iters: Int): Array[Array[Array[Long]]] = {
    val spark = quant.sparkSession
    import spark.implicits._
    val subs = PqM
    val subDim = PqSubDim
    var books: Array[Array[Array[Long]]] = {
      val seeds = quant.orderBy($"vec_id").limit(k)
        .select(col(vecCol)).collect().map(_.getSeq[Long](0).toArray)
      Array.tabulate(subs)(s => seeds.map(v => v.slice(s * subDim, (s + 1) * subDim)))
    }
    for (_ <- 1 to iters) {
      val sums = quant
        .withColumn("__codes", pq_encode_l(col(vecCol), books))
        .select(posexplode(col(vecCol)).as(Seq("__pos", "__v")), $"__codes")
        .withColumn("__sub", ($"__pos" / subDim).cast("int"))
        .withColumn("__code", element_at($"__codes", $"__sub" + 1))
        .groupBy($"__sub", $"__code", $"__pos")
        .agg(sum($"__v").as("s"), count(lit(1)).as("n"))
        .collect()
      val upd = sums.map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        java.lang.Math.floorDiv(r.getLong(3), r.getLong(4))).toMap
      books = Array.tabulate(subs)(s => Array.tabulate(k)(c =>
        Array.tabulate(subDim)(d =>
          upd.getOrElse((s, c, s * subDim + d), books(s)(c)(d)))))
    }
    books
  }

  /** ADC lookup sum over bound dtab/codes attributes, exact Long. */
  private def adcL: Column =
    (0 until PqM)
      .map(s => element_at(element_at(col("dtab"), s + 1),
        element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)

  /** Exact integer squared L2 between two bound long-vector columns,
    * via three [[vec_dot_l]] calls (qq − 2·qn + nn ≡ Σ(q−n)²). */
  private def d2Cols(q: Column, n: Column): Column =
    vec_dot_l(q, q) - lit(2L) * vec_dot_l(q, n) + vec_dot_l(n, n)

  // ------------------------------------------------------------------
  // shared SQL generators
  // ------------------------------------------------------------------

  /** Force every CTE in the generated chain to MATERIALIZE: the Lloyd
    * chains reference comp/corp/rcomp/centN many times, and DuckDB's
    * default inlining re-expands each reference — the IVF-PQ oracle
    * re-derives the whole coarse chain inside every residual reference
    * (measured 359 s plain vs 0.7 s materialized at sf0.01, identical
    * results). CTE names are plain identifiers, so `name AS (` only
    * matches definitions. */
  private def mat(sql: String): String =
    sql.replaceAll("""(\w+) AS \(""", "$1 AS MATERIALIZED (")

  /** comp/corp/qry/nrm base CTEs (micro-grid components). */
  private val baseCtes: String =
    s"""WITH comp AS (
      |  SELECT vec_id, CAST(i AS INT) AS dim,
      |    CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000000, 0) AS BIGINT) AS vq
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, $Dim)) AS i)),
      |corp AS (SELECT * FROM comp WHERE vec_id >= 8),
      |qry AS (SELECT * FROM comp WHERE vec_id < 8),
      |nrm AS (SELECT vec_id, CAST(sum(vq * vq) AS BIGINT) AS s2 FROM comp GROUP BY 1)""".stripMargin

  /** Coarse Lloyd chain over `corp`: emits {p}cent0..{p}cent{iters},
    * mirroring [[Training.lloydCentroids]] exactly. */
  private def lloydSql(p: String, k: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s""",
      |${p}seeds AS (
      |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster
      |  FROM (SELECT DISTINCT vec_id FROM corp ORDER BY vec_id LIMIT $k)),
      |${p}cent0 AS (
      |  SELECT s.cluster, c.dim, c.vq AS cq FROM ${p}seeds s JOIN corp c USING (vec_id))""".stripMargin
    for (t <- 1 to iters) {
      sb ++= s""",
      |${p}dist$t AS (
      |  SELECT c.vec_id, k.cluster, sum((c.vq - k.cq) * (c.vq - k.cq)) AS d2
      |  FROM corp c JOIN ${p}cent${t - 1} k USING (dim) GROUP BY 1, 2),
      |${p}asg$t AS (
      |  SELECT vec_id, cluster FROM (
      |    SELECT vec_id, cluster,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rk
      |    FROM ${p}dist$t) WHERE rk = 1),
      |${p}upd$t AS (
      |  SELECT a.cluster, c.dim, ${fdivSql("sum(c.vq)", "count(*)")} AS cq
      |  FROM ${p}asg$t a JOIN corp c USING (vec_id) GROUP BY 1, 2),
      |${p}cent$t AS (
      |  SELECT p0.cluster, p0.dim, COALESCE(u.cq, p0.cq) AS cq
      |  FROM ${p}cent${t - 1} p0 LEFT JOIN ${p}upd$t u
      |    ON p0.cluster = u.cluster AND p0.dim = u.dim)""".stripMargin
    }
    sb.toString
  }

  /** Final corpus assignment + query-centroid distances against
    * {p}cent{iters}: emits {p}casg (n_id, cluster) and {p}qd
    * (q_id, cluster, d2). */
  private def assignProbeSql(p: String, iters: Int): String =
    s""",
      |${p}cdist AS (
      |  SELECT c.vec_id, k.cluster, sum((c.vq - k.cq) * (c.vq - k.cq)) AS d2
      |  FROM corp c JOIN ${p}cent$iters k USING (dim) GROUP BY 1, 2),
      |${p}casg AS (
      |  SELECT vec_id AS n_id, cluster FROM (
      |    SELECT vec_id, cluster,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rk
      |    FROM ${p}cdist) WHERE rk = 1),
      |${p}qd AS (
      |  SELECT q.vec_id AS q_id, k.cluster, sum((q.vq - k.cq) * (q.vq - k.cq)) AS d2
      |  FROM qry q JOIN ${p}cent$iters k USING (dim) GROUP BY 1, 2)""".stripMargin

  /** Per-subspace Lloyd chain over `src` (vec_id, dim, {v}): emits
    * {p}cent0..{p}cent{iters} keyed (code, sub, dim), mirroring
    * [[pqLloydL]]. */
  private def pqChainSql(p: String, src: String, v: String,
                         k: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s""",
      |${p}seeds AS (
      |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
      |  FROM (SELECT DISTINCT vec_id FROM $src ORDER BY vec_id LIMIT $k)),
      |${p}cent0 AS (
      |  SELECT s.code, CAST(c.dim // $PqSubDim AS INT) AS sub, c.dim, c.$v AS cq
      |  FROM ${p}seeds s JOIN $src c USING (vec_id))""".stripMargin
    for (t <- 1 to iters) {
      sb ++= s""",
      |${p}dist$t AS (
      |  SELECT c.vec_id, k.sub, k.code, sum((c.$v - k.cq) * (c.$v - k.cq)) AS d2
      |  FROM $src c JOIN ${p}cent${t - 1} k ON k.dim = c.dim GROUP BY 1, 2, 3),
      |${p}asg$t AS (
      |  SELECT vec_id, sub, code FROM (
      |    SELECT vec_id, sub, code,
      |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rk
      |    FROM ${p}dist$t) WHERE rk = 1),
      |${p}upd$t AS (
      |  SELECT a.sub, a.code, c.dim, ${fdivSql(s"sum(c.$v)", "count(*)")} AS cq
      |  FROM ${p}asg$t a JOIN $src c
      |    ON c.vec_id = a.vec_id AND c.dim // $PqSubDim = a.sub
      |  GROUP BY 1, 2, 3),
      |${p}cent$t AS (
      |  SELECT p0.code, p0.sub, p0.dim, COALESCE(u.cq, p0.cq) AS cq
      |  FROM ${p}cent${t - 1} p0 LEFT JOIN ${p}upd$t u
      |    ON p0.sub = u.sub AND p0.code = u.code AND p0.dim = u.dim)""".stripMargin
    }
    sb.toString
  }

  /** Per-vector final encode against {p}cent{iters} over `src`: emits
    * {p}enc (n_id, [cluster,] sub, code). `extraKey` carries the IVF
    * cluster through for the IVF-PQ composition. */
  private def pqEncodeSql(p: String, src: String, v: String, iters: Int,
                          extraKey: String): String = {
    val ek = if (extraKey.isEmpty) "" else s"c.$extraKey, "
    val ekOut = if (extraKey.isEmpty) "" else s"$extraKey, "
    val ekPart = if (extraKey.isEmpty) "" else s", $extraKey"
    val grp = if (extraKey.isEmpty) "1, 2, 3" else "1, 2, 3, 4"
    s""",
      |${p}edist AS (
      |  SELECT c.vec_id, ${ek}k.sub, k.code, sum((c.$v - k.cq) * (c.$v - k.cq)) AS d2
      |  FROM $src c JOIN ${p}cent$iters k ON k.dim = c.dim GROUP BY $grp),
      |${p}enc AS (
      |  SELECT vec_id AS n_id, ${ekOut}sub, code FROM (
      |    SELECT *,
      |      row_number() OVER (PARTITION BY vec_id, sub$ekPart ORDER BY d2, code) AS rk
      |    FROM ${p}edist) t WHERE rk = 1)""".stripMargin
  }

  // ------------------------------------------------------------------
  // ann_ivf — exact-integer IVF with hash oracle
  // ------------------------------------------------------------------

  /** IVF ANN, oracle-exact end to end: train k=8 integer centroids
    * (3 Lloyd rounds), assign the corpus, probe each query's top-3
    * cells by integer d2, exact-integer cosine top-5 inside the probe
    * set. Output (q_id, rk, n_id, cos_sim) matches [[Similarity.
    * annBruteforce]]'s shape; `ann_eval`-style recall is spec-checked
    * in AnnExactSpec against the brute-force truth. */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (corpus, queries) = quantSplit(spark, dir)
    val corpusC = corpus.persist()
    val cents = Training.lloydCentroids(corpusC, IvfK, IvfIters)
    val index = Training.assign(corpusC, cents)
      .select($"vec_id".as("n_id"), $"vq".as("nv"), $"cluster",
        vec_dot_l($"vq", $"vq").as("nn"))
    val probes = centroidScores(queries, "vec_id", "vq", cents)
      .withColumn("prk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"d2", $"cluster")))
      .filter($"prk" <= IvfNprobe)
      .select($"q_id", $"qv", vec_dot_l($"qv", $"qv").as("qq"), $"cluster")
    index.join(broadcast(probes), "cluster")
      .withColumn("cos", vec_dot_l($"qv", $"nv").cast("double")
        / (sqrt($"qq".cast("double")) * sqrt($"nn".cast("double"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"cos".desc, $"n_id")))
      .filter($"rk" <= TopK)
      .select($"q_id", $"rk", $"n_id", round($"cos", 6).as("cos_sim"))
      .orderBy($"q_id", $"rk")
      .transform(out => Release.grid(out, corpusC)) // nq·topK rows
  }

  val annIvfSql: String = mat(
    baseCtes + lloydSql("iv", IvfK, IvfIters) + assignProbeSql("iv", IvfIters) +
      s""",
      |ivprobe AS (
      |  SELECT q_id, cluster FROM (
      |    SELECT q_id, cluster,
      |      row_number() OVER (PARTITION BY q_id ORDER BY d2, cluster) AS rk
      |    FROM ivqd) WHERE rk <= $IvfNprobe),
      |cand AS (
      |  SELECT p.q_id, a.n_id, CAST(sum(q.vq * c.vq) AS BIGINT) AS dot
      |  FROM ivprobe p
      |  JOIN ivcasg a USING (cluster)
      |  JOIN qry q ON q.vec_id = p.q_id
      |  JOIN corp c ON c.vec_id = a.n_id AND c.dim = q.dim
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT cand.q_id, cand.n_id,
      |    CAST(cand.dot AS DOUBLE)
      |      / (sqrt(CAST(qn.s2 AS DOUBLE)) * sqrt(CAST(nn.s2 AS DOUBLE))) AS cos
      |  FROM cand JOIN nrm qn ON qn.vec_id = cand.q_id
      |            JOIN nrm nn ON nn.vec_id = cand.n_id)
      |SELECT q_id, rk, n_id, round(cos, 6) AS cos_sim FROM (
      |  SELECT q_id, n_id, cos,
      |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
      |  FROM scored) t WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin)

  // ------------------------------------------------------------------
  // ann_ivf_sweep — the nprobe recall/cost tuning curve, oracle-exact
  // ------------------------------------------------------------------

  /** IVF nprobe SWEEP: recall@5 against the exact full-scan truth and
    * fraction-of-corpus-scanned, at every probe width 1..[[IvfNprobe]]
    * over the SAME trained index as [[annIvf]] — the tuning curve an
    * operator reads before pinning nprobe (the IVF sibling of
    * `minhash_band_sweep` / `rp_band_sweep`, completing the
    * per-index-family audit symmetry). One probe-set scan at the
    * widest width serves every sweep point: each candidate carries its
    * cluster's probe rank, so narrower widths are FILTERS over the one
    * scored table, never rescans. The exact reference is one
    * integer-cosine full scan — paid once, the same honest-calibration
    * cost hll_audit pays.
    *
    * Exactness: integer Lloyd/assignment/probe ranks as [[annIvf]];
    * recall and scan fraction are floor-div micro-units of exact
    * counts, so the 3-row output hash-matches the generated oracle.
    * Scale: output is |sweep| rows; the full scan is corpus-linear and
    * the swept candidate table is ≤ nprobe/k of (corpus × queries).
    */
  def annIvfSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (corpus, queries) = quantSplit(spark, dir)
    val corpusC = corpus.persist()
    val cents = Training.lloydCentroids(corpusC, IvfK, IvfIters)
    val index = Training.assign(corpusC, cents)
      .select($"vec_id".as("n_id"), $"vq".as("nv"), $"cluster",
        vec_dot_l($"vq", $"vq").as("nn"))
    val qprobes = centroidScores(queries, "vec_id", "vq", cents)
      .withColumn("prk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"d2", $"cluster")).cast("long"))
      .filter($"prk" <= IvfNprobe)
      .select($"q_id", $"qv", vec_dot_l($"qv", $"qv").as("qq"),
        $"cluster", $"prk")
    val cand = index.join(broadcast(qprobes), "cluster")
      .withColumn("cos", vec_dot_l($"qv", $"nv").cast("double")
        / (sqrt($"qq".cast("double")) * sqrt($"nn".cast("double"))))
      .select($"q_id", $"n_id", $"prk", $"cos")
      .persist()
    val qb = queries.select($"vec_id".as("q_id"), $"vq".as("qv"))
      .withColumn("qq", vec_dot_l($"qv", $"qv"))
    val exact = index.crossJoin(broadcast(qb))
      .withColumn("cos", vec_dot_l($"qv", $"nv").cast("double")
        / (sqrt($"qq".cast("double")) * sqrt($"nn".cast("double"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"cos".desc, $"n_id")))
      .filter($"rk" <= TopK)
      .select($"q_id", $"n_id")
    val grid = (1 to IvfNprobe).map(_.toLong).toDF("nprobe")
    val swept = cand.crossJoin(broadcast(grid)).filter($"prk" <= $"nprobe")
    val top = swept
      .withColumn("rk", row_number().over(
        Window.partitionBy($"nprobe", $"q_id").orderBy($"cos".desc, $"n_id")))
      .filter($"rk" <= TopK)
      .select($"nprobe", $"q_id", $"n_id")
    val hits = top.join(exact, Seq("q_id", "n_id"))
      .groupBy($"nprobe").agg(count(lit(1)).as("n_hits"))
    val scanned = swept.groupBy($"nprobe")
      .agg(count(lit(1)).as("n_scanned"))
    val sizes = qb.agg(count(lit(1)).as("n_q"))
      .crossJoin(index.agg(count(lit(1)).as("n_corpus")))
    val out = grid.join(hits, Seq("nprobe"), "left")
      .join(scanned, Seq("nprobe"))
      .crossJoin(broadcast(sizes))
      .withColumn("n_hits", coalesce($"n_hits", lit(0L)))
      .select($"nprobe", $"n_hits", $"n_scanned",
        expr(s"n_hits * 1000000L div (n_q * $TopK)").as("mean_recall_micro"),
        expr("n_scanned * 1000000L div (n_q * n_corpus)").as("scan_frac_micro"))
      .orderBy($"nprobe")
    out.transform(o => Release.grid(o, corpusC, cand)) // |sweep| rows
  }

  val annIvfSweepSql: String = mat(
    baseCtes + lloydSql("iv", IvfK, IvfIters) + assignProbeSql("iv", IvfIters) +
      s""",
      |ivprk AS (
      |  SELECT q_id, cluster,
      |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY d2, cluster)
      |      AS BIGINT) AS prk
      |  FROM ivqd),
      |dots AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
      |    CAST(sum(q.vq * c.vq) AS BIGINT) AS dot
      |  FROM qry q JOIN corp c ON c.dim = q.dim GROUP BY 1, 2),
      |scoredall AS (
      |  SELECT d.q_id, d.n_id,
      |    CAST(d.dot AS DOUBLE)
      |      / (sqrt(CAST(qn.s2 AS DOUBLE)) * sqrt(CAST(nn.s2 AS DOUBLE))) AS cos
      |  FROM dots d JOIN nrm qn ON qn.vec_id = d.q_id
      |              JOIN nrm nn ON nn.vec_id = d.n_id),
      |exact AS (
      |  SELECT q_id, n_id FROM (
      |    SELECT q_id, n_id,
      |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
      |    FROM scoredall) t WHERE rk <= $TopK),
      |grid(nprobe) AS (VALUES ${
        // generated from IvfNprobe so operator and oracle can't diverge
        // if the sweep width changes (they sweep the SAME 1..nprobe grid)
        (1 to IvfNprobe).map(i => s"(CAST($i AS BIGINT))").mkString(", ")}),
      |cand AS (
      |  SELECT p.q_id, a.n_id, p.prk, s.cos
      |  FROM ivprk p JOIN ivcasg a USING (cluster)
      |  JOIN scoredall s ON s.q_id = p.q_id AND s.n_id = a.n_id
      |  WHERE p.prk <= $IvfNprobe),
      |swept AS (
      |  SELECT g.nprobe, c.q_id, c.n_id, c.cos
      |  FROM grid g JOIN cand c ON c.prk <= g.nprobe),
      |topp AS (
      |  SELECT nprobe, q_id, n_id FROM (
      |    SELECT nprobe, q_id, n_id,
      |      row_number() OVER (PARTITION BY nprobe, q_id
      |        ORDER BY cos DESC, n_id) AS rk
      |    FROM swept) t WHERE rk <= $TopK),
      |hits AS (
      |  SELECT t.nprobe, CAST(count(*) AS BIGINT) AS n_hits
      |  FROM topp t JOIN exact e USING (q_id, n_id) GROUP BY 1),
      |scanned AS (
      |  SELECT nprobe, CAST(count(*) AS BIGINT) AS n_scanned
      |  FROM swept GROUP BY 1),
      |sizes AS (
      |  SELECT (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) FROM qry) AS n_q,
      |         (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) FROM corp)
      |           AS n_corpus)
      |SELECT g.nprobe, COALESCE(h.n_hits, 0) AS n_hits, s.n_scanned,
      |  ${fdivSql(s"COALESCE(h.n_hits, 0) * 1000000", s"z.n_q * $TopK")}
      |    AS mean_recall_micro,
      |  ${fdivSql("s.n_scanned * 1000000", "z.n_q * z.n_corpus")}
      |    AS scan_frac_micro
      |FROM grid g LEFT JOIN hits h ON h.nprobe = g.nprobe
      |JOIN scanned s ON s.nprobe = g.nprobe, sizes z
      |ORDER BY g.nprobe""".stripMargin)

  // ------------------------------------------------------------------
  // ann_ivf_incr — incremental index maintenance, oracle-exact
  // ------------------------------------------------------------------

  /** INCREMENTAL IVF index maintenance — the `dedup_minhash_incr`
    * sibling for the vector family (the r12 verdict's named ask): a new
    * batch of vectors (vec_id above the corpus midpoint) is assigned to
    * the FROZEN centroids trained on the EXISTING corpus and merged
    * into the existing inverted index. Work is ∝ |batch| (one
    * codegen'd assignment scan of the batch against k literal
    * centroids), never ∝ |corpus| — the old side contributes only its
    * (write-once) centroid model and per-cluster occupancy counts;
    * re-clustering on drift is a separate explicit op (`ann_ivf`
    * retrains from scratch). Output: one row per batch vector — its
    * cluster, exact integer d2 to the frozen centroid, and the
    * cluster's occupancy before (n_old) and after-merge contribution
    * (n_new), i.e. the inverted-index merge receipt.
    *
    * Because assignment is per-row against frozen literals,
    * assign(old) ∪ assign(batch) ≡ assign(old ∪ batch) — the lossless-
    * merge equivalence Round13OpsSpec pins, exactly the
    * old-∪-incremental ≡ full contract DedupSpec pins for minhash.
    *
    * Exactness: micro-grid integer Lloyd over the OLD side only
    * (smallest-id seeds, floorDiv means — [[Training.lloydCentroids]]),
    * integer d2, smallest-cluster tie-break; the oracle replays the
    * identical chain with `corp` bound to the old half. Scale: the
    * Lloyd collects are model-sized (k·64 longs/iter); batch rows
    * never shuffle for the model side; output is batch-mass →
    * Release.checkpointed.
    */
  def annIvfIncr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = Training.quantizedOf(Tables.embeddings(spark, dir))
    val cut = Tables.embeddings(spark, dir)
      .agg(expr("max(vec_id) div 2").as("cut"))
    val corpus = all.filter($"vec_id" >= 8)
    val old = corpus.crossJoin(broadcast(cut)).filter($"vec_id" <= $"cut")
      .select($"vec_id", $"vq").persist()
    val cents = Training.lloydCentroids(old, IvfK, IvfIters) // FROZEN
    val oldOcc = Training.assign(old, cents)
      .groupBy($"cluster").agg(count(lit(1)).as("n_old"))
    val batch = corpus.crossJoin(broadcast(cut)).filter($"vec_id" > $"cut")
      .select($"vec_id", $"vq")
    // r14: persisted — basg feeds BOTH the occupancy broadcast and the
    // output join, and it is a map-only subtree (no exchange for
    // ReusedExchange to dedupe), so without the cache the whole
    // batch scan + quantize + 16-centroid assignment ran twice
    val basg = Training.assign(batch, cents) // the incremental work: ∝ batch
      .select($"vec_id".as("n_id"), $"cluster", $"d2".as("d2_micro2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bocc = basg.groupBy($"cluster").agg(count(lit(1)).as("n_new"))
    val out = basg
      .join(broadcast(oldOcc), Seq("cluster"), "left")
      .join(broadcast(bocc), Seq("cluster"))
      .select($"n_id", $"cluster", $"d2_micro2",
        coalesce($"n_old", lit(0L)).as("cluster_n_old"),
        $"n_new".as("cluster_n_new"))
      .orderBy($"n_id")
    Release.checkpointed(out, old, basg)
  }

  /** Oracle: the identical frozen-centroid pipeline with the Lloyd
    * chain's `corp` CTE bound to the OLD half of the corpus. */
  val annIvfIncrSql: String = mat(
    s"""WITH comp AS (
      |  SELECT vec_id, CAST(i AS INT) AS dim,
      |    CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000000, 0) AS BIGINT) AS vq
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, $Dim)) AS i)),
      |cutv AS (SELECT max(vec_id) // 2 AS cut FROM embeddings),
      |corp AS (SELECT c.* FROM comp c, cutv
      |         WHERE c.vec_id >= 8 AND c.vec_id <= cutv.cut),
      |newc AS (SELECT c.* FROM comp c, cutv WHERE c.vec_id > cutv.cut)""".stripMargin +
      lloydSql("ii", IvfK, IvfIters) +
      s""",
      |odist AS (
      |  SELECT c.vec_id, k.cluster, sum((c.vq - k.cq) * (c.vq - k.cq)) AS d2
      |  FROM corp c JOIN iicent$IvfIters k USING (dim) GROUP BY 1, 2),
      |oasg AS (
      |  SELECT vec_id, cluster FROM (
      |    SELECT vec_id, cluster,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rk
      |    FROM odist) t WHERE rk = 1),
      |oocc AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_old
      |         FROM oasg GROUP BY 1),
      |bdist AS (
      |  SELECT c.vec_id, k.cluster, sum((c.vq - k.cq) * (c.vq - k.cq)) AS d2
      |  FROM newc c JOIN iicent$IvfIters k USING (dim) GROUP BY 1, 2),
      |basg AS (
      |  SELECT vec_id AS n_id, cluster, d2 FROM (
      |    SELECT vec_id, cluster, d2,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rk
      |    FROM bdist) t WHERE rk = 1),
      |bocc AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_new
      |         FROM basg GROUP BY 1)
      |SELECT b.n_id, b.cluster, CAST(b.d2 AS BIGINT) AS d2_micro2,
      |  COALESCE(o.n_old, 0) AS cluster_n_old,
      |  bo.n_new AS cluster_n_new
      |FROM basg b LEFT JOIN oocc o USING (cluster)
      |JOIN bocc bo USING (cluster)
      |ORDER BY n_id""".stripMargin)

  // ------------------------------------------------------------------
  // ann_ivf_adaptive — margin-rule probe width, oracle-exact
  // ------------------------------------------------------------------

  /** Adaptive-nprobe IVF (k=16): each query probes every cell whose
    * integer d2 sits within HALF the best-to-worst spread —
    * 2·(d2 − best) ≤ (worst − best), a pure integer predicate — capped
    * at 8 cells (floor 1: the best cell always qualifies at d2=best).
    * Queries inside one cell scan little; boundary queries widen. */
  def annIvfAdaptive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (corpus, queries) = quantSplit(spark, dir)
    val corpusC = corpus.persist()
    val cents = Training.lloydCentroids(corpusC, AdK, IvfIters)
    val index = Training.assign(corpusC, cents)
      .select($"vec_id".as("n_id"), $"vq".as("nv"), $"cluster",
        vec_dot_l($"vq", $"vq").as("nn"))
    val wq = Window.partitionBy($"q_id")
    val probes = centroidScores(queries, "vec_id", "vq", cents)
      .withColumn("best", min($"d2").over(wq))
      .withColumn("worst", max($"d2").over(wq))
      .withColumn("prk", row_number().over(wq.orderBy($"d2", $"cluster")))
      .filter($"prk" <= AdMaxProbe &&
        ($"prk" === 1 || lit(2L) * ($"d2" - $"best") <= ($"worst" - $"best")))
      .select($"q_id", $"qv", vec_dot_l($"qv", $"qv").as("qq"), $"cluster")
    index.join(broadcast(probes), "cluster")
      .withColumn("cos", vec_dot_l($"qv", $"nv").cast("double")
        / (sqrt($"qq".cast("double")) * sqrt($"nn".cast("double"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"cos".desc, $"n_id")))
      .filter($"rk" <= TopK)
      .select($"q_id", $"rk", $"n_id", round($"cos", 6).as("cos_sim"))
      .orderBy($"q_id", $"rk")
      .transform(out => Release.grid(out, corpusC)) // nq·topK rows
  }

  val annIvfAdaptiveSql: String = mat(
    baseCtes + lloydSql("ad", AdK, IvfIters) + assignProbeSql("ad", IvfIters) +
      s""",
      |adspan AS (SELECT q_id, min(d2) AS best, max(d2) AS worst FROM adqd GROUP BY 1),
      |adprobe AS (
      |  SELECT q_id, cluster FROM (
      |    SELECT d.q_id, d.cluster,
      |      row_number() OVER (PARTITION BY d.q_id ORDER BY d.d2, d.cluster) AS rk,
      |      2 * (d.d2 - s.best) <= (s.worst - s.best) AS inmargin
      |    FROM adqd d JOIN adspan s USING (q_id)) t
      |  WHERE rk <= $AdMaxProbe AND (rk = 1 OR inmargin)),
      |cand AS (
      |  SELECT p.q_id, a.n_id, CAST(sum(q.vq * c.vq) AS BIGINT) AS dot
      |  FROM adprobe p
      |  JOIN adcasg a USING (cluster)
      |  JOIN qry q ON q.vec_id = p.q_id
      |  JOIN corp c ON c.vec_id = a.n_id AND c.dim = q.dim
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT cand.q_id, cand.n_id,
      |    CAST(cand.dot AS DOUBLE)
      |      / (sqrt(CAST(qn.s2 AS DOUBLE)) * sqrt(CAST(nn.s2 AS DOUBLE))) AS cos
      |  FROM cand JOIN nrm qn ON qn.vec_id = cand.q_id
      |            JOIN nrm nn ON nn.vec_id = cand.n_id)
      |SELECT q_id, rk, n_id, round(cos, 6) AS cos_sim FROM (
      |  SELECT q_id, n_id, cos,
      |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
      |  FROM scored) t WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin)

  // ------------------------------------------------------------------
  // ann_pq — exact-integer product quantization with hash oracle
  // ------------------------------------------------------------------

  /** PQ ANN with re-ranking, oracle-exact: 8 subspaces × 32 integer
    * codewords (3 Lloyd rounds), corpus encoded to 8 codes/vector by
    * the [[graft.functions.PqImpl.encodeL]] kernel, per-query integer
    * ADC table, shortlist of topK·8 by ADC, exact-integer squared-L2
    * re-rank of the shortlist only. l2_dist is the exact integer d2
    * scaled back to vector units (÷10¹², one deterministic double). */
  def annPq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (corpus, queries) = quantSplit(spark, dir)
    val corpusC = corpus.persist()
    val books = pqLloydL(corpusC, "vq", PqK, PqIters)
    val codeTable = corpusC
      .select($"vec_id".as("n_id"), $"vq".as("nv"),
        pq_encode_l($"vq", books).as("codes"))
    val qTab = queries.select($"vec_id".as("q_id"), $"vq".as("qv"),
      pq_dist_table_l($"vq", books).as("dtab"))
    val shortlist = codeTable.crossJoin(broadcast(qTab))
      .withColumn("adc", adcL)
      .withColumn("ark", row_number().over(
        Window.partitionBy($"q_id").orderBy($"adc", $"n_id")))
      .filter($"ark" <= TopK * PqShortFactor)
      .select($"q_id", $"qv", $"n_id", $"nv")
    shortlist
      .withColumn("d2", d2Cols($"qv", $"nv"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"d2", $"n_id")))
      .filter($"rk" <= TopK)
      .select($"q_id", $"rk", $"n_id",
        round($"d2".cast("double") / 1e12, 6).as("l2_dist"))
      .orderBy($"q_id", $"rk")
      .transform(out => Release.grid(out, corpusC)) // nq·topK rows
  }

  val annPqSql: String = mat(
    baseCtes + pqChainSql("pq", "corp", "vq", PqK, PqIters) +
      pqEncodeSql("pq", "corp", "vq", PqIters, "") +
      s""",
      |qtab AS (
      |  SELECT q.vec_id AS q_id, k.sub, k.code, sum((q.vq - k.cq) * (q.vq - k.cq)) AS d2
      |  FROM qry q JOIN pqcent$PqIters k ON k.dim = q.dim GROUP BY 1, 2, 3),
      |adc AS (
      |  SELECT t.q_id, e.n_id, CAST(sum(t.d2) AS BIGINT) AS adc
      |  FROM pqenc e JOIN qtab t ON t.sub = e.sub AND t.code = e.code
      |  GROUP BY 1, 2),
      |short AS (
      |  SELECT q_id, n_id FROM (
      |    SELECT q_id, n_id,
      |      row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS ark
      |    FROM adc) t WHERE ark <= ${TopK * PqShortFactor}),
      |refine AS (
      |  SELECT s.q_id, s.n_id, CAST(sum((q.vq - c.vq) * (q.vq - c.vq)) AS BIGINT) AS d2
      |  FROM short s JOIN qry q ON q.vec_id = s.q_id
      |    JOIN corp c ON c.vec_id = s.n_id AND c.dim = q.dim
      |  GROUP BY 1, 2)
      |SELECT q_id, rk, n_id,
      |  round(CAST(d2 AS DOUBLE) / 1000000000000, 6) AS l2_dist FROM (
      |  SELECT q_id, n_id, d2,
      |    row_number() OVER (PARTITION BY q_id ORDER BY d2, n_id) AS rk
      |  FROM refine) t WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin)

  // ------------------------------------------------------------------
  // ann_ivf_pq — IVFADC composed from the two exact parts
  // ------------------------------------------------------------------

  /** IVF-PQ (FAISS IVFADC), oracle-exact: the k=8 coarse quantizer of
    * [[annIvf]] prunes WHICH cells are scanned; integer RESIDUAL codes
    * (v − centroid, exact Long subtraction) shrink WHAT a scan reads.
    * Per probed cell the query builds its residual's integer ADC
    * table; shortlist and exact-integer re-rank as [[annPq]] (re-rank
    * on ORIGINAL vectors, not residuals). */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (corpus, queries) = quantSplit(spark, dir)
    val corpusC = corpus.persist()
    val coarse = Training.lloydCentroids(corpusC, IvfK, IvfIters)
    val residuals = Training.assign(corpusC, coarse)
      .select($"vec_id", $"vq", $"cluster",
        vec_centroid_residual_l($"vq", $"cluster", coarse).as("rv"))
      .persist()
    val books = pqLloydL(residuals, "rv", PqK, PqIters)
    val codeTable = residuals
      .select($"vec_id".as("n_id"), $"vq".as("nv"), $"cluster",
        pq_encode_l($"rv", books).as("codes"))
    val probes = centroidScores(queries, "vec_id", "vq", coarse)
      .withColumn("prk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"d2", $"cluster")))
      .filter($"prk" <= IvfNprobe)
      .select($"q_id", $"qv", $"cluster",
        pq_dist_table_l(
          vec_centroid_residual_l($"qv", $"cluster", coarse), books).as("dtab"))
    val shortlist = codeTable.join(broadcast(probes), "cluster")
      .withColumn("adc", adcL)
      .withColumn("ark", row_number().over(
        Window.partitionBy($"q_id").orderBy($"adc", $"n_id")))
      .filter($"ark" <= TopK * PqShortFactor)
      .select($"q_id", $"qv", $"n_id", $"nv")
    shortlist
      .withColumn("d2", d2Cols($"qv", $"nv"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"d2", $"n_id")))
      .filter($"rk" <= TopK)
      .select($"q_id", $"rk", $"n_id",
        round($"d2".cast("double") / 1e12, 6).as("l2_dist"))
      .orderBy($"q_id", $"rk")
      .transform(out => Release.grid(out, corpusC, residuals)) // nq·topK rows
  }

  val annIvfPqSql: String = mat(
    baseCtes + lloydSql("cv", IvfK, IvfIters) + assignProbeSql("cv", IvfIters) +
      s""",
      |rcomp AS (
      |  SELECT c.vec_id, a.cluster, c.dim, CAST(c.vq - k.cq AS BIGINT) AS rq
      |  FROM corp c JOIN cvcasg a ON a.n_id = c.vec_id
      |    JOIN cvcent$IvfIters k ON k.cluster = a.cluster AND k.dim = c.dim)""".stripMargin +
      pqChainSql("bk", "rcomp", "rq", PqK, PqIters) +
      pqEncodeSql("bk", "rcomp", "rq", PqIters, "cluster") +
      s""",
      |qprobe AS (
      |  SELECT q_id, cluster FROM (
      |    SELECT q_id, cluster,
      |      row_number() OVER (PARTITION BY q_id ORDER BY d2, cluster) AS rk
      |    FROM cvqd) t WHERE rk <= $IvfNprobe),
      |qrcomp AS (
      |  SELECT q.vec_id AS q_id, p.cluster, q.dim, CAST(q.vq - k.cq AS BIGINT) AS rq
      |  FROM qry q JOIN qprobe p ON p.q_id = q.vec_id
      |    JOIN cvcent$IvfIters k ON k.cluster = p.cluster AND k.dim = q.dim),
      |qtab AS (
      |  SELECT r.q_id, r.cluster, k.sub, k.code,
      |    sum((r.rq - k.cq) * (r.rq - k.cq)) AS d2
      |  FROM qrcomp r JOIN bkcent$PqIters k ON k.dim = r.dim GROUP BY 1, 2, 3, 4),
      |adc AS (
      |  SELECT t.q_id, e.n_id, CAST(sum(t.d2) AS BIGINT) AS adc
      |  FROM bkenc e JOIN qtab t
      |    ON t.cluster = e.cluster AND t.sub = e.sub AND t.code = e.code
      |  GROUP BY 1, 2),
      |short AS (
      |  SELECT q_id, n_id FROM (
      |    SELECT q_id, n_id,
      |      row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS ark
      |    FROM adc) t WHERE ark <= ${TopK * PqShortFactor}),
      |refine AS (
      |  SELECT s.q_id, s.n_id, CAST(sum((q.vq - c.vq) * (q.vq - c.vq)) AS BIGINT) AS d2
      |  FROM short s JOIN qry q ON q.vec_id = s.q_id
      |    JOIN corp c ON c.vec_id = s.n_id AND c.dim = q.dim
      |  GROUP BY 1, 2)
      |SELECT q_id, rk, n_id,
      |  round(CAST(d2 AS DOUBLE) / 1000000000000, 6) AS l2_dist FROM (
      |  SELECT q_id, n_id, d2,
      |    row_number() OVER (PARTITION BY q_id ORDER BY d2, n_id) AS rk
      |  FROM refine) t WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin)

  // ------------------------------------------------------------------
  // ann_pq_auto — cost-based shortlist-factor dial, oracle-exact
  // ------------------------------------------------------------------

  private val AutoFactors = Seq(1, 2, 4, 8, 16, 32)
  private val AutoTargetPct = 90 // recall target as an integer percent

  /** COST-BASED shortlist-factor chooser, ORACLE-EXACT end to end: the
    * [[annPq]] recall/cost dial measured on the calibration query
    * sample, picking the smallest shortlist factor meeting the recall
    * target (deepest if none does) — the tuning answer ("how deep must
    * the ADC shortlist go HERE?") promoted to a first-class operator,
    * because the right factor is a property of the dataset (codebook
    * distortion vs corpus geometry), not a universal constant.
    *
    * One exact-integer codebook training ([[pqLloydL]]) + ONE
    * deepest-factor ADC pass serve every measured factor: candidates
    * are exact-d2-scored once and each shallower factor is a filter
    * over the same ranked table (never a retrain, never a rescan); the
    * exact ground truth costs one brute-force pass over the
    * calibration sample only. The met-target test is the integer
    * comparison hits·100 ≥ pct·nq·topK (no 0.9·40 float ceil trap),
    * and recall's display division k/(nq·topK) terminates within 6
    * decimals for the 2³·5-shaped denominators here, so the single
    * rounded double matches DuckDB bit for bit. The |factors|-row
    * report is assembled on the driver (model-sized, the
    * contamination_sweep precedent) and the candidate cache released.
    */
  def annPqAuto(spark: SparkSession, dir: String, topK: Int = TopK,
                targetPct: Int = AutoTargetPct): DataFrame = {
    import spark.implicits._
    val (corpus0, queries) = quantSplit(spark, dir)
    val corpus = corpus0.persist()
    val books = pqLloydL(corpus, "vq", PqK, PqIters)
    val codeTable = corpus.select($"vec_id".as("n_id"), $"vq".as("nv"),
      pq_encode_l($"vq", books).as("codes"))
    val qTab = queries.select($"vec_id".as("q_id"), $"vq".as("qv"),
      pq_dist_table_l($"vq", books).as("dtab"))
    val maxF = AutoFactors.max
    // deepest-factor shortlist, exact-rescored ONCE; every factor
    // below reads this cache
    val cands = codeTable.crossJoin(broadcast(qTab))
      .withColumn("adc", adcL)
      .withColumn("ark", row_number().over(
        Window.partitionBy($"q_id").orderBy($"adc", $"n_id")))
      .filter($"ark" <= topK * maxF)
      .withColumn("d2", d2Cols($"qv", $"nv"))
      .select($"q_id", $"n_id", $"ark", $"d2")
      .persist()
    cands.count()
    val truth = corpus.select($"vec_id".as("n_id"), $"vq".as("nv"))
      .crossJoin(broadcast(queries.select($"vec_id".as("q_id"), $"vq".as("qv"))))
      .withColumn("d2", d2Cols($"qv", $"nv"))
      .withColumn("trk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"d2", $"n_id")))
      .filter($"trk" <= topK).select($"q_id", $"n_id")
    val nq = queries.count()
    // recall's display division h/(nq·topK) must TERMINATE within 6
    // decimals for Spark's BigDecimal HALF_UP and DuckDB's round() to
    // agree on the last digit — guaranteed iff the denominator has only
    // 2/5 prime factors (currently 8·5 = 40 = 2³·5). Fail loudly if a
    // calibration-split or topK change silently breaks that.
    locally {
      val den0 = nq * topK
      var den = den0
      for (p <- Seq(2L, 5L)) while (den % p == 0) den /= p
      require(den == 1L,
        s"ann_pq_auto: nq*topK = $den0 has a prime factor other than 2/5 — " +
          "the recall division would not terminate and the oracle hash would flake")
    }
    val perFactor = AutoFactors.map { f =>
      cands.filter($"ark" <= topK * f)
        .withColumn("rk", row_number().over(
          Window.partitionBy($"q_id").orderBy($"d2", $"n_id")))
        .filter($"rk" <= topK)
        .join(truth, Seq("q_id", "n_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(lit(f).as("factor"), $"hits")
    }.reduce(_.unionByName(_))
    val rows = perFactor.collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    cands.unpersist(); corpus.unpersist()
    val chosen = rows
      .find { case (_, h) => h * 100L >= targetPct.toLong * nq * topK }
      .map(_._1).getOrElse(maxF)
    val out = rows.map { case (f, h) =>
      (f, nq,
        BigDecimal(h.toDouble / (nq * topK).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        f * topK, f == chosen)
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(out.toIndexedSeq, 1))
      .toDF("factor", "n_queries", "recall", "shortlist_rows", "chosen")
      .orderBy($"factor")
  }

  val annPqAutoSql: String = mat(
    baseCtes + pqChainSql("pq", "corp", "vq", PqK, PqIters) +
      pqEncodeSql("pq", "corp", "vq", PqIters, "") +
      s""",
      |qtab AS (
      |  SELECT q.vec_id AS q_id, k.sub, k.code, sum((q.vq - k.cq) * (q.vq - k.cq)) AS d2
      |  FROM qry q JOIN pqcent$PqIters k ON k.dim = q.dim GROUP BY 1, 2, 3),
      |adc AS (
      |  SELECT t.q_id, e.n_id, CAST(sum(t.d2) AS BIGINT) AS adc
      |  FROM pqenc e JOIN qtab t ON t.sub = e.sub AND t.code = e.code
      |  GROUP BY 1, 2),
      |shortq AS (
      |  SELECT q_id, n_id, ark FROM (
      |    SELECT q_id, n_id,
      |      row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS ark
      |    FROM adc) t WHERE ark <= ${TopK * AutoFactors.max}),
      |refine AS (
      |  SELECT s.q_id, s.n_id, s.ark,
      |    CAST(sum((q.vq - c.vq) * (q.vq - c.vq)) AS BIGINT) AS d2
      |  FROM shortq s JOIN qry q ON q.vec_id = s.q_id
      |    JOIN corp c ON c.vec_id = s.n_id AND c.dim = q.dim
      |  GROUP BY 1, 2, 3),
      |truthd AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
      |    sum((q.vq - c.vq) * (q.vq - c.vq)) AS d2
      |  FROM qry q JOIN corp c ON c.dim = q.dim GROUP BY 1, 2),
      |truth AS (
      |  SELECT q_id, n_id FROM (
      |    SELECT q_id, n_id,
      |      row_number() OVER (PARTITION BY q_id ORDER BY d2, n_id) AS trk
      |    FROM truthd) t WHERE trk <= $TopK),
      |fac AS (SELECT CAST(unnest([${AutoFactors.mkString(", ")}]) AS INT) AS factor),
      |nqv AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS nq FROM qry),
      |ranked AS (
      |  SELECT f.factor, r.q_id, r.n_id,
      |    row_number() OVER (PARTITION BY f.factor, r.q_id
      |      ORDER BY r.d2, r.n_id) AS rk
      |  FROM fac f JOIN refine r ON r.ark <= f.factor * $TopK),
      |hitsf AS (
      |  SELECT f.factor, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits
      |  FROM fac f LEFT JOIN (
      |    SELECT factor, count(*) AS hits
      |    FROM ranked JOIN truth USING (q_id, n_id)
      |    WHERE rk <= $TopK GROUP BY 1) h ON h.factor = f.factor),
      |chos AS (
      |  SELECT coalesce(
      |    min(CASE WHEN h.hits * 100 >= $AutoTargetPct * nqv.nq * $TopK
      |      THEN h.factor END), ${AutoFactors.max}) AS cf
      |  FROM hitsf h CROSS JOIN nqv)
      |SELECT h.factor, nqv.nq AS n_queries,
      |  round(CAST(h.hits AS DOUBLE) / (nqv.nq * $TopK), 6) AS recall,
      |  h.factor * $TopK AS shortlist_rows,
      |  (h.factor = chos.cf) AS chosen
      |FROM hitsf h CROSS JOIN nqv CROSS JOIN chos
      |ORDER BY factor""".stripMargin)

  // ------------------------------------------------------------------
  // ann_hubness — k-occurrence distribution of the vector space
  // ------------------------------------------------------------------

  private val HubProbes = 32 // fixed-COUNT probe sample (SF-independent)

  /** k-occurrence hubness audit (Radovanović, Nanopoulos & Ivanović,
    * JMLR 2010): over a deterministic probe sample of the corpus, how
    * many probes retrieve each corpus vector into their exact top-k —
    * the N_k(x) distribution whose right tail ("hubs": N_k ≫ k) is THE
    * high-dimensional pathology that silently degrades every ANN
    * index and kNN classifier built on the space. Read before trusting
    * [[annIvf]]/[[annPq]] recall numbers: a hubby space concentrates
    * retrievals on few vectors, so average recall hides per-query
    * variance. Output: the k-occurrence histogram (k_occurrences →
    * n_vectors), including the never-retrieved 0 row.
    *
    * Exactness: distances are exact integer micro-grid L2², ranks are
    * deterministic (d2, id) row_numbers, the histogram is exact
    * counts. Scale: probes are a fixed-COUNT md5-smallest sample (the
    * sample_per_group idiom compiled to TakeOrderedAndProject —
    * per-partition top-k, no global sort, probe count CONSTANT in SF)
    * and broadcast; the corpus is scanned once against them and never
    * shuffled; everything after the rank lives on the probe×k grid.
    */
  def annHubness(spark: SparkSession, dir: String, topK: Int = TopK): DataFrame = {
    import spark.implicits._
    val (corpus, _) = quantSplit(spark, dir)
    val probes = corpus
      .select($"vec_id".as("q_id"), $"vq".as("qv"),
        md5(concat(lit("hub:"), $"vec_id".cast("string"))).as("h"))
      .orderBy($"h", $"q_id").limit(HubProbes)
      .select($"q_id", $"qv")
    val nCorpus = corpus.count()
    val occ = corpus.select($"vec_id".as("n_id"), $"vq".as("nv"))
      .crossJoin(broadcast(probes))
      .filter($"n_id" =!= $"q_id") // a probe is not its own neighbor
      .withColumn("d2", d2Cols($"qv", $"nv"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"d2", $"n_id")))
      .filter($"rk" <= topK)
      .groupBy($"n_id").agg(count(lit(1)).as("k_occ"))
    val hist = occ.groupBy($"k_occ".as("k_occurrences"))
      .agg(count(lit(1)).as("n_vectors"))
    val retrieved = occ.agg(count(lit(1)).as("r"))
    hist.unionByName(
        retrieved.select(lit(0L).as("k_occurrences"),
          (lit(nCorpus) - $"r").as("n_vectors")))
      .orderBy($"k_occurrences")
  }

  val annHubnessSql: String = mat(
    baseCtes +
      s""",
      |pr AS (SELECT vec_id AS q_id FROM corp GROUP BY 1
      |       ORDER BY md5('hub:' || CAST(vec_id AS VARCHAR)), q_id
      |       LIMIT $HubProbes),
      |d AS (
      |  SELECT p.q_id, c.vec_id AS n_id,
      |    CAST(sum((q.vq - c.vq) * (q.vq - c.vq)) AS BIGINT) AS d2
      |  FROM pr p JOIN corp q ON q.vec_id = p.q_id
      |  JOIN corp c ON c.dim = q.dim AND c.vec_id <> p.q_id
      |  GROUP BY 1, 2),
      |top AS (
      |  SELECT q_id, n_id FROM (
      |    SELECT q_id, n_id,
      |      row_number() OVER (PARTITION BY q_id ORDER BY d2, n_id) AS rk
      |    FROM d) t WHERE rk <= $TopK),
      |occ AS (SELECT n_id, CAST(count(*) AS BIGINT) AS k_occ
      |        FROM top GROUP BY 1),
      |nc AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n FROM corp),
      |hist AS (
      |  SELECT k_occ AS k_occurrences, CAST(count(*) AS BIGINT) AS n_vectors
      |  FROM occ GROUP BY 1
      |  UNION ALL
      |  SELECT CAST(0 AS BIGINT), nc.n - (SELECT count(*) FROM occ)
      |  FROM nc)
      |SELECT k_occurrences, n_vectors FROM hist
      |ORDER BY k_occurrences""".stripMargin)

  // ------------------------------------------------------------------
  // ann_ndcg — graded ranking quality of the raw ADC ordering
  // ------------------------------------------------------------------

  private val NdcgK = 10

  /** NDCG@10 of the RAW ADC ranking (PQ codes, no exact rescore)
    * against exact ground truth — the GRADED companion to
    * [[annPqAuto]]'s recall: recall only counts set overlap, NDCG
    * (Järvelin & Kekäläinen 2002) scores the ORDER, with gain
    * 11 − true_rank for truth-top-10 items and the log₂-position
    * discount. This is the metric that catches an index whose
    * shortlist contains the right neighbors in the wrong order —
    * invisible to recall, fatal to a no-rescore serving path.
    *
    * Exactness: ADC sums and true d2 are exact integers; position
    * weights are the micro-quantized double tree
    * round(10⁶·ln2/ln(pos+1)) (the pmi idiom — both libms 1-ulp);
    * DCG is an exact integer dot of gains and weights; IDCG is the
    * same weights against the perfect gain sequence; NDCG is one
    * truncated division onto the micro grid. The whole chain —
    * codebooks included — replays in DuckDB (the pqChainSql
    * machinery), so the op is hash-exact.
    *
    * Scale: same shape as [[annPq]] — codes and distance tables are
    * model-sized, queries broadcast, the corpus is scanned and never
    * shuffled; everything after the rank lives on the 8×10 grid. The
    * 8-row output follows the eager-grid convention (collect, release
    * the corpus cache, re-wrap).
    */
  def annNdcg(spark: SparkSession, dir: String, topK: Int = NdcgK): DataFrame = {
    import spark.implicits._
    val (corpus0, queries) = quantSplit(spark, dir)
    val corpus = corpus0.persist()
    val books = pqLloydL(corpus, "vq", PqK, PqIters)
    val codeTable = corpus.select($"vec_id".as("n_id"),
      pq_encode_l($"vq", books).as("codes"))
    val qTab = queries.select($"vec_id".as("q_id"), $"vq".as("qv"),
      pq_dist_table_l($"vq", books).as("dtab"))
    val adcTop = codeTable.crossJoin(broadcast(qTab))
      .withColumn("adc", adcL)
      .withColumn("pos", row_number().over(
        Window.partitionBy($"q_id").orderBy($"adc", $"n_id")))
      .filter($"pos" <= topK)
      .select($"q_id", $"n_id", $"pos")
    val truth = corpus.select($"vec_id".as("n_id"), $"vq".as("nv"))
      .crossJoin(broadcast(queries.select($"vec_id".as("q_id"), $"vq".as("qv"))))
      .withColumn("d2", d2Cols($"qv", $"nv"))
      .withColumn("trk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"d2", $"n_id")))
      .filter($"trk" <= topK)
      .select($"q_id", $"n_id", (lit(topK + 1) - $"trk").cast("long").as("rel"))
    val w = spark.range(1, topK + 1)
      .select($"id".cast("int").as("pos"),
        round(lit(1000000.0) * log(lit(2.0)) / log(($"id" + 1).cast("double")), 0)
          .cast("long").as("w"))
    val idcg = w.agg(sum((lit(topK + 1) - $"pos") * $"w").as("idcg_micro"))
    val out = adcTop
      .join(truth, Seq("q_id", "n_id"), "left")
      .join(broadcast(w), "pos")
      .groupBy($"q_id")
      .agg(sum(coalesce($"rel", lit(0L)) * $"w").as("dcg_micro"))
      .crossJoin(broadcast(idcg))
      .select($"q_id", $"dcg_micro", $"idcg_micro",
        expr("dcg_micro * 1000000 div idcg_micro").as("ndcg_micro"))
      .select($"q_id", $"dcg_micro", $"idcg_micro", $"ndcg_micro",
        round($"ndcg_micro".cast("double") / 1000000d, 6).as("ndcg"))
      .orderBy($"q_id")
    val rows = out.collect().toSeq
    corpus.unpersist()
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), out.schema)
  }

  val annNdcgSql: String = mat(
    baseCtes + pqChainSql("pq", "corp", "vq", PqK, PqIters) +
      pqEncodeSql("pq", "corp", "vq", PqIters, "") +
      s""",
      |qtab AS (
      |  SELECT q.vec_id AS q_id, k.sub, k.code, sum((q.vq - k.cq) * (q.vq - k.cq)) AS d2
      |  FROM qry q JOIN pqcent$PqIters k ON k.dim = q.dim GROUP BY 1, 2, 3),
      |adc AS (
      |  SELECT t.q_id, e.n_id, CAST(sum(t.d2) AS BIGINT) AS adc
      |  FROM pqenc e JOIN qtab t ON t.sub = e.sub AND t.code = e.code
      |  GROUP BY 1, 2),
      |adcr AS (
      |  SELECT q_id, n_id, pos FROM (
      |    SELECT q_id, n_id,
      |      row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS pos
      |    FROM adc) t WHERE pos <= $NdcgK),
      |truthd AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
      |    sum((q.vq - c.vq) * (q.vq - c.vq)) AS d2
      |  FROM qry q JOIN corp c ON c.dim = q.dim GROUP BY 1, 2),
      |truth AS (
      |  SELECT q_id, n_id, CAST(${NdcgK + 1} - trk AS BIGINT) AS rel FROM (
      |    SELECT q_id, n_id,
      |      row_number() OVER (PARTITION BY q_id ORDER BY d2, n_id) AS trk
      |    FROM truthd) t WHERE trk <= $NdcgK),
      |wt AS (
      |  SELECT CAST(r AS INT) AS pos,
      |    CAST(round(1000000.0 * ln(2.0) / ln(CAST(r + 1 AS DOUBLE)), 0) AS BIGINT) AS w
      |  FROM (SELECT unnest(range(1, ${NdcgK + 1})) AS r)),
      |idcg AS (
      |  SELECT CAST(sum((${NdcgK + 1} - pos) * w) AS BIGINT) AS idcg_micro FROM wt),
      |dcg AS (
      |  SELECT a.q_id, CAST(sum(coalesce(t.rel, 0) * w.w) AS BIGINT) AS dcg_micro
      |  FROM adcr a
      |  LEFT JOIN truth t ON t.q_id = a.q_id AND t.n_id = a.n_id
      |  JOIN wt w ON w.pos = a.pos
      |  GROUP BY 1)
      |SELECT d.q_id, d.dcg_micro, i.idcg_micro,
      |  (d.dcg_micro * 1000000) // i.idcg_micro AS ndcg_micro,
      |  round(CAST((d.dcg_micro * 1000000) // i.idcg_micro AS DOUBLE) / 1000000, 6)
      |    AS ndcg
      |FROM dcg d, idcg i ORDER BY q_id""".stripMargin)
}
