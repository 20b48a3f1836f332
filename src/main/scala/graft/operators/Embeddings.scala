package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Embedding-table analytics: the vector-column aggregations a curation
  * pipeline runs over billions of embeddings (class prototypes, and —
  * see [[PqIndex]] — compressed-code search).
  */
object Embeddings {

  /** Per-label mean vector ("class prototypes"): posexplode each
    * embedding to (label, dim, component) and aggregate — the dimension
    * axis rides the SAME shuffle as the label key (one exchange keyed
    * (label, dim), map-side partial sums), which is how a prototype per
    * class stays one linear pass at any corpus size. Components are
    * 7dp-quantized and decimal-summed so the mean is exact in any
    * summation order; float32→double is lossless.
    */
  def embeddingCentroids(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
      .groupBy($"label", $"dim")
      .agg(count(lit(1)).as("n"),
        sum(round($"v".cast("double"), 7).cast("decimal(18,7)")).as("s"))
      .select($"label", $"dim", $"n",
        round($"s".cast("double") / $"n".cast("double"), 6).as("centroid"))
      .orderBy($"label", $"dim")
  }

  val embeddingCentroidsSql: String =
    """WITH comp AS (
      |  SELECT label, CAST(i AS INT) AS dim, embedding[i + 1] AS v
      |  FROM embeddings
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i))
      |SELECT label, dim, count(*) AS n,
      |  round(CAST(sum(CAST(round(CAST(v AS DOUBLE), 7) AS DECIMAL(18,7))) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE), 6) AS centroid
      |FROM comp GROUP BY label, dim ORDER BY label, dim""".stripMargin

  /** Per-label embedding outliers — the points farthest from their
    * class prototype, the standard curation pass for mislabeled or
    * corrupt vectors (drop/re-queue the top tail before training).
    *
    * Plan: one (label, dim)-keyed exchange builds the exact decimal
    * centroids (same pass as [[embeddingCentroids]]); the centroid
    * table is LABELS×DIMS rows — model-sized — so AQE broadcasts it
    * back onto the component stream; per-vector distances then
    * partial-aggregate on vec_id, and the per-label top-k is a rank
    * window over the already-reduced |corpus| row table with a
    * map-side WindowGroupLimit. The corpus embedding column itself
    * never rides a shuffle wider than its posexploded components.
    *
    * Engine-exactness: centroids are 6dp-rounded doubles from exact
    * decimal sums; each per-dim deviation is quantized to integer
    * micro-units BEFORE squaring, so dist2_micro2 is an exact integer
    * in any aggregation order; the emitted distance derives from it
    * via IEEE sqrt (correctly rounded in both engines, unlike ln —
    * no quantization needed) and the validated round(_, 6) pair.
    */
  def embeddingOutliers(spark: SparkSession, dir: String, topK: Int = 5): DataFrame = {
    import spark.implicits._
    val comp = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label", posexplode($"embedding").as(Seq("dim", "v")))
    val cent = comp.groupBy($"label", $"dim")
      .agg(count(lit(1)).as("n"),
        sum(round($"v".cast("double"), 7).cast("decimal(18,7)")).as("s"))
      .select($"label", $"dim",
        round($"s".cast("double") / $"n".cast("double"), 6).as("c"))
    val dist = comp.join(cent, Seq("label", "dim"))
      .select($"vec_id", $"label",
        round(($"v".cast("double") - $"c") * 1000000d, 0).cast("long").as("e"))
      .groupBy($"vec_id", $"label")
      .agg(sum($"e" * $"e").as("dist2_micro2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"label").orderBy($"dist2_micro2".desc, $"vec_id")
    dist.withColumn("rk", row_number().over(w))
      .filter($"rk" <= topK)
      .select($"label", $"rk", $"vec_id", $"dist2_micro2",
        round(sqrt($"dist2_micro2".cast("double")) / 1000000d, 6).as("dist"))
      .orderBy($"label", $"rk")
  }

  val embeddingOutliersSql: String =
    """WITH comp AS (
      |  SELECT vec_id, label, CAST(i AS INT) AS dim, embedding[i + 1] AS v
      |  FROM embeddings
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
      |cent AS (
      |  SELECT label, dim,
      |    round(CAST(sum(CAST(round(CAST(v AS DOUBLE), 7) AS DECIMAL(18,7))) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE), 6) AS c
      |  FROM comp GROUP BY label, dim),
      |dist AS (
      |  SELECT vec_id, comp.label,
      |    CAST(sum(e * e) AS BIGINT) AS dist2_micro2
      |  FROM (
      |    SELECT vec_id, comp.label AS label,
      |      CAST(round((CAST(v AS DOUBLE) - c) * 1000000, 0) AS BIGINT) AS e
      |    FROM comp JOIN cent ON comp.label = cent.label AND comp.dim = cent.dim) comp
      |  GROUP BY vec_id, comp.label)
      |SELECT label, rk, vec_id, dist2_micro2,
      |  round(sqrt(CAST(dist2_micro2 AS DOUBLE)) / 1000000, 6) AS dist
      |FROM (
      |  SELECT label, vec_id, dist2_micro2,
      |    CAST(row_number() OVER (PARTITION BY label
      |      ORDER BY dist2_micro2 DESC, vec_id) AS INT) AS rk
      |  FROM dist)
      |WHERE rk <= 5 ORDER BY label, rk""".stripMargin

  /** Per-dimension INT8 scalar quantization report — the simplest and
    * most common embedding compression (4× over float32, no codebooks):
    * per dim, the [min, max] range, the 255-step code grid, and the
    * EXACT reconstruction error mass it would cost. Two linear passes
    * sharing one dim-keyed shuffle (the 64-row stats side broadcasts
    * back by AQE); the complement to [[PqIndex]]'s 50× codebook path.
    *
    * Engine-exactness: min/max are exact float selections cast
    * losslessly to double; code = round((v−min)/(max−min)·255) is the
    * validated Spark↔DuckDB round pair; each reconstruction error is
    * quantized to integer nano-units BEFORE squaring and summing, so
    * the per-dim error mass is an exact integer in any partial-agg
    * order, and mse derives from it with fixed-order double ops.
    */
  def embeddingQuantizeInt8(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val comp = Tables.embeddings(spark, dir)
      .select(posexplode($"embedding").as(Seq("dim", "v")))
    val stats = comp.groupBy($"dim")
      .agg(min($"v").as("vmin_f"), max($"v").as("vmax_f"))
    val vd = $"v".cast("double")
    val vmind = $"vmin_f".cast("double")
    val vmaxd = $"vmax_f".cast("double")
    val code = when($"vmax_f" === $"vmin_f", lit(0))
      .otherwise(round((vd - vmind) / (vmaxd - vmind) * 255d, 0).cast("int"))
    val recon = vmind + code.cast("double") * (vmaxd - vmind) / 255d
    val errNano = round((vd - recon) * 1000000000d, 0).cast("long")
    comp.join(stats, "dim")
      .select($"dim", $"v", $"vmin_f", $"vmax_f", (errNano * errNano).as("e2"))
      .groupBy($"dim")
      .agg(count(lit(1)).as("n"),
        round(min($"v").cast("double"), 6).as("vmin"),
        round(max($"v").cast("double"), 6).as("vmax"),
        sum($"e2").as("sse_nano2"))
      .select($"dim", $"n", $"vmin", $"vmax", $"sse_nano2",
        round($"sse_nano2".cast("double") / $"n".cast("double") / 1e18, 12).as("mse"))
      .orderBy($"dim")
  }

  val embeddingQuantizeInt8Sql: String =
    """WITH comp AS (
      |  SELECT CAST(i AS INT) AS dim, embedding[i + 1] AS v
      |  FROM embeddings
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
      |st AS (
      |  SELECT dim, min(v) AS vmin_f, max(v) AS vmax_f FROM comp GROUP BY dim),
      |e AS (
      |  SELECT c.dim, c.v,
      |    CASE WHEN vmax_f = vmin_f THEN 0
      |         ELSE CAST(round((CAST(c.v AS DOUBLE) - CAST(vmin_f AS DOUBLE))
      |           / (CAST(vmax_f AS DOUBLE) - CAST(vmin_f AS DOUBLE)) * 255, 0) AS INT)
      |    END AS code,
      |    CAST(vmin_f AS DOUBLE) AS vmind, CAST(vmax_f AS DOUBLE) AS vmaxd
      |  FROM comp c JOIN st ON c.dim = st.dim),
      |err AS (
      |  SELECT dim, v,
      |    CAST(round((CAST(v AS DOUBLE)
      |      - (vmind + CAST(code AS DOUBLE) * (vmaxd - vmind) / 255))
      |      * 1000000000, 0) AS BIGINT) AS e_nano
      |  FROM e)
      |SELECT dim, count(*) AS n,
      |  round(CAST(min(v) AS DOUBLE), 6) AS vmin,
      |  round(CAST(max(v) AS DOUBLE), 6) AS vmax,
      |  CAST(sum(e_nano * e_nano) AS BIGINT) AS sse_nano2,
      |  round(CAST(sum(e_nano * e_nano) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e18, 12)
      |    AS mse
      |FROM err GROUP BY dim ORDER BY dim""".stripMargin

  /** The quantized long-vector column the covariance aggregate consumes:
    * Spark's own round(x·10⁴) per component, so the quantization path
    * is the engine-validated one (mirrored by DuckDB round). */
  private def qvec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(c, v => round(v.cast("double") * 10000d, 0).cast("long"))

  /** Full 64×64 embedding covariance matrix in ONE pass via the native
    * [[graft.functions.VecCovSum]] aggregate: each partition accumulates
    * d(d+1)/2 exact integer product sums (O(d²) state, zero row
    * fan-out), buffers merge associatively, and the only data movement
    * is sketch-sized partials — vs. the posexplode²-and-groupBy
    * formulation that multiplies the corpus scan ×4096. Covariance
    * derives per pair from the sufficient statistics in exact integer
    * arithmetic ((n·Σqᵢqⱼ − Σqᵢ·Σqⱼ), all < 2⁵³ here) with a single
    * double division at the end — bit-identical cross-engine.
    *
    * This is the whitening / PCA-prep primitive for an embedding corpus
    * ([[pcaPower]] consumes it).
    */
  def embeddingCovariance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .agg(graft.functions.AggFunctions.vec_cov_sum(qvec($"embedding")).as("cov"))
      .select(explode($"cov").as("e"))
      .select($"e.i".as("i"), $"e.j".as("j"), $"e.n".as("n"),
        (($"e.n" * $"e.s_ij" - $"e.s_i" * $"e.s_j").cast("double")
          / ($"e.n".cast("double") * $"e.n".cast("double") * lit(1e8)))
          .as("cov"))
      .orderBy($"i", $"j")
  }

  val embeddingCovarianceSql: String =
    """WITH q AS (
      |  SELECT vec_id, CAST(i AS INT) AS i,
      |    CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 10000, 0) AS BIGINT) AS qv
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS i))
      |SELECT a.i AS i, b.i AS j, count(*) AS n,
      |  CAST(count(*) * CAST(sum(a.qv * b.qv) AS BIGINT)
      |       - CAST(sum(a.qv) AS BIGINT) * CAST(sum(b.qv) AS BIGINT) AS DOUBLE)
      |    / (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE) * 1e8) AS cov
      |FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
      |GROUP BY a.i, b.i ORDER BY i, j""".stripMargin

  /** Correlation matrix from the same one-pass sufficient statistics as
    * [[embeddingCovariance]] — no second scan: corr_ij derives from the
    * (i,j), (i,i), (j,j) moment rows of a single `vec_cov_sum` pass.
    * The exact-integer centered moments (n·Σqᵢqⱼ − Σqᵢ·Σqⱼ) convert to
    * double once; corr is one divide of a double by the sqrt-product —
    * identical IEEE op order in both engines. Off-diagonal pairs only
    * (the diagonal is 1 by construction).
    */
  def embeddingCorrelation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val moments = Tables.embeddings(spark, dir)
      .agg(graft.functions.AggFunctions.vec_cov_sum(qvec($"embedding")).as("cov"))
      .select(explode($"cov").as("e"))
      .select($"e.i".as("i"), $"e.j".as("j"),
        ($"e.n" * $"e.s_ij" - $"e.s_i" * $"e.s_j").cast("double").as("m_ij"))
    val diag = moments.filter($"i" === $"j").select($"i".as("d"), $"m_ij".as("m_dd"))
    moments.filter($"i" < $"j")
      .join(broadcast(diag.withColumnRenamed("d", "i").withColumnRenamed("m_dd", "m_ii")), Seq("i"))
      .join(broadcast(diag.withColumnRenamed("d", "j").withColumnRenamed("m_dd", "m_jj")), Seq("j"))
      .select($"i", $"j",
        round($"m_ij" / sqrt($"m_ii" * $"m_jj"), 9).as("corr"))
      .orderBy($"i", $"j")
  }

  val embeddingCorrelationSql: String =
    """WITH q AS (
      |  SELECT vec_id, CAST(i AS INT) AS i,
      |    CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 10000, 0) AS BIGINT) AS qv
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
      |m AS (
      |  SELECT a.i AS i, b.i AS j,
      |    CAST(count(*) * CAST(sum(a.qv * b.qv) AS BIGINT)
      |         - CAST(sum(a.qv) AS BIGINT) * CAST(sum(b.qv) AS BIGINT) AS DOUBLE) AS m_ij
      |  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY a.i, b.i)
      |SELECT p.i, p.j, round(p.m_ij / sqrt(di.m_ij * dj.m_ij), 9) AS corr
      |FROM m p
      |JOIN m di ON di.i = p.i AND di.j = p.i
      |JOIN m dj ON dj.i = p.j AND dj.j = p.j
      |WHERE p.i < p.j
      |ORDER BY p.i, p.j""".stripMargin

  /** Embedding drift per label — the distance each class prototype
    * moved between the first and second half of the corpus (vec_id
    * split): the distribution-shift monitor run before reusing an
    * index/classifier trained on older data. Both halves' centroids
    * come from the same one-pass decimal-exact mean shape as
    * [[embeddingCentroids]] (one exchange keyed (half, label, dim));
    * the L2 drift folds the 64 per-dim deltas in ascending-dim order
    * via an exact-input double chain mirrored in SQL.
    */
  def embeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val half = e.agg(expr("max(vec_id) div 2").as("cut"))
    val cent = e.crossJoin(broadcast(half))
      .withColumn("half", when($"vec_id" <= $"cut", 0).otherwise(1))
      .select($"half", $"label", posexplode($"embedding").as(Seq("dim", "v")))
      .groupBy($"half", $"label", $"dim")
      .agg(count(lit(1)).as("n"),
        sum(round($"v".cast("double"), 7).cast("decimal(18,7)")).as("s"))
      .select($"half", $"label", $"dim",
        ($"s".cast("double") / $"n".cast("double")).as("c"))
    val a = cent.filter($"half" === 0).select($"label", $"dim", $"c".as("c0"))
    val b = cent.filter($"half" === 1).select($"label", $"dim", $"c".as("c1"))
    a.join(b, Seq("label", "dim"))
      .withColumn("d2", ($"c1" - $"c0") * ($"c1" - $"c0"))
      .groupBy($"label")
      // per-dim squares quantized then decimal-summed: order-free exact
      .agg(sum(round($"d2", 12).cast("decimal(20,12)")).as("ss"))
      .select($"label", round(sqrt($"ss".cast("double")), 6).as("drift_l2"))
      .orderBy($"label")
  }

  val embeddingDriftSql: String =
    """WITH cut AS (SELECT max(vec_id) // 2 AS cut FROM embeddings),
      |comp AS (
      |  SELECT CASE WHEN vec_id <= cut THEN 0 ELSE 1 END AS half, label,
      |    CAST(i AS INT) AS dim, embedding[i + 1] AS v
      |  FROM embeddings, cut
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
      |cent AS (
      |  SELECT half, label, dim,
      |    CAST(sum(CAST(round(CAST(v AS DOUBLE), 7) AS DECIMAL(18,7))) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE) AS c
      |  FROM comp GROUP BY half, label, dim),
      |d AS (
      |  SELECT a.label, a.dim, (b.c - a.c) * (b.c - a.c) AS d2
      |  FROM cent a JOIN cent b
      |    ON a.label = b.label AND a.dim = b.dim AND a.half = 0 AND b.half = 1)
      |SELECT label,
      |  round(sqrt(CAST(sum(CAST(round(d2, 12) AS DECIMAL(20,12))) AS DOUBLE)), 6)
      |    AS drift_l2
      |FROM d GROUP BY label ORDER BY label""".stripMargin

  /** Top principal component of the embedding corpus by INTEGER power
    * iteration over the exact second-moment matrix M_ij = n·Σqᵢqⱼ −
    * Σqᵢ·Σqⱼ (the [[embeddingCovariance]] sufficient statistics — a
    * positive scalar multiple of the covariance, so same eigenvectors).
    * The distributed part is the one-pass [[graft.functions.VecCovSum]]
    * aggregate; the iteration runs on the d×d matrix — O(d²) driver
    * traffic, the bounded "model-sized" exception, never O(corpus).
    *
    * ORACLE-EXACT (round 10, promoted from rows-only): instead of 1000
    * float y=Av steps, K=12 REPEATED SQUARINGS compute M^(2¹²) — 4096
    * effective power steps in 12 integer matmuls, each renormalized to
    * the 10⁹ grid by truncated division (Scala BigInt `/` ≡ DuckDB `//`,
    * both toward zero), so DuckDB replays the whole iteration as 12
    * MATERIALIZED matmul CTEs. The projected vector y = M^(2ᴷ)·1 is
    * quantized to the 10⁷ grid (Σv² < 2⁵³, so every int→double cast is
    * EXACT — DuckDB's HUGEINT→DOUBLE cast is not correctly rounded
    * above 2⁵³, measured 2.2% off-by-one-ulp, so no big integer may
    * reach a double). λ and λ/trace derive from the integer Rayleigh
    * quotient vᵀMv/vᵀv via staged truncated divisions onto nano/micro
    * grids. Sign convention: y₀ < 0 flips the vector BEFORE the grid
    * quantization, identically in both engines. Convergence: sf0.01
    * measured max-component error 2·10⁻⁸ vs a 5000-step float
    * reference; (λ₂/λ₁)^4096 buries the near-isotropic tail.
    *
    * Output: one row per dimension with the eigenvector component
    * (unit-L2, 6dp), the covariance-scale eigenvalue (nano grid) and
    * its share of total variance (micro grid).
    */
  /** The integer PCA model shared by [[pcaPower]] and [[pcaProjection]]:
    * v7 (the 10⁷-grid top eigenvector), den = Σv7², λ·10⁹ and
    * (λ/trace)·10⁶, plus the per-dim sums sJ and row count n the
    * projection needs for exact centering. All driver math is BigInt;
    * every value later cast to double is < 2⁵³.
    */
  private[graft] final case class PcaModel(
      v7: Array[BigInt], den: BigInt, lamNano: Long, fracMicro: Long,
      n: Long, sJ: Array[Long])

  private[graft] def pcaModel(spark: SparkSession, dir: String,
                              squarings: Int = PcaSquarings): PcaModel = {
    import spark.implicits._
    // raw sufficient statistics only — the second moment
    // m = n·s_ij − s_i·s_j is formed in BigInt ON THE DRIVER: as a
    // LongType column the product n·s_ij would silently wrap past
    // ~3·10⁵ embedding rows (|s_ij| ≤ n·10⁸, ANSI off) while the
    // DuckDB oracle computes it in HUGEINT — the r10 advisory's
    // silent-wrong-at-scale divergence. The rows are model-sized
    // (d(d+1)/2), so the driver fold costs nothing.
    val mom = Tables.embeddings(spark, dir)
      .agg(graft.functions.AggFunctions.vec_cov_sum(qvec($"embedding")).as("cov"))
      .select(explode($"cov").as("e"))
      .select($"e.i".as("i"), $"e.j".as("j"), $"e.n".as("n"),
        $"e.s_ij".as("s_ij"), $"e.s_i".as("s_i"), $"e.s_j".as("s_j"))
      .collect() // d(d+1)/2 rows — model-sized
    val d = mom.map(_.getInt(1)).max + 1
    val n = mom.head.getLong(2)
    val mm = Array.ofDim[BigInt](d, d)
    val sJ = new Array[Long](d)
    mom.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val m = BigInt(n) * BigInt(r.getLong(3)) -
        BigInt(r.getLong(4)) * BigInt(r.getLong(5))
      mm(i)(j) = m; mm(j)(i) = m
      if (i == j) sJ(i) = r.getLong(4)
    }
    val sc = BigInt(1000000000L)
    def renorm(b: Array[Array[BigInt]]): Array[Array[BigInt]] = {
      val mx = b.iterator.flatten.map(_.abs).max
      b.map(_.map(x => x * sc / mx)) // BigInt / truncates ≡ DuckDB //
    }
    var b = renorm(mm)
    for (_ <- 1 to squarings) {
      val c = Array.tabulate(d, d) { (i, j) =>
        var s = BigInt(0); var k = 0
        while (k < d) { s += b(i)(k) * b(k)(j); k += 1 }
        s
      }
      b = renorm(c)
    }
    var y = b.map(_.sum) // M^(2^K) · 1⃗ — the converged direction
    if (y(0) < 0) y = y.map(-_)
    val my = y.map(_.abs).max
    val v7 = y.map(x => x * BigInt(10000000L) / my)
    val den = v7.map(x => x * x).sum // ≤ 64·10¹⁴ < 2⁵³: double-exact
    var num = BigInt(0)
    for (i <- 0 until d; j <- 0 until d) num += v7(i) * mm(i)(j) * v7(j)
    val tr = (0 until d).map(i => mm(i)(i)).sum
    val t = num * 100 / den // λ_M·100, staged to keep later products small
    val lamNano = (t * 10 / (BigInt(n) * BigInt(n) * 100)).toLong
    val fracMicro = (t * 1000000 / (tr * 100)).toLong
    PcaModel(v7, den, lamNano, fracMicro, n, sJ)
  }

  def pcaPower(spark: SparkSession, dir: String, squarings: Int = PcaSquarings): DataFrame = {
    import spark.implicits._
    val m = pcaModel(spark, dir, squarings)
    val denD = m.den.toDouble // exact (< 2⁵³)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = m.v7.zipWithIndex.map { case (c, i) =>
      (i, r6(c.toDouble / math.sqrt(denD)),
        m.lamNano.toDouble / 1e9, m.fracMicro.toDouble / 1e6)
    }
    spark.createDataFrame(rows.toIndexedSeq)
      .toDF("dim", "component", "eigenvalue", "explained_frac")
      .orderBy($"dim")
  }

  private val PcaSquarings = 12

  /** The CTE chain shared by the [[pcaPower]] and [[pcaProjection]]
    * oracles: moments → 12 renormalized matmul squarings → v7 + den.
    */
  private val pcaCtes: String = {
    val sq = (1 to PcaSquarings).map { k =>
      s""",
        |c$k AS MATERIALIZED (
        |  SELECT a.i, b.j, CAST(sum(a.v * b.v) AS HUGEINT) AS w
        |  FROM b${k - 1} a JOIN b${k - 1} b ON a.j = b.i GROUP BY 1, 2),
        |b$k AS MATERIALIZED (
        |  SELECT i, j, w * 1000000000 // (SELECT max(abs(w)) FROM c$k) AS v
        |  FROM c$k)""".stripMargin
    }.mkString
    s"""WITH q AS (
      |  SELECT vec_id, CAST(i AS INT) AS i,
      |    CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 10000, 0) AS BIGINT) AS qv
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
      |mom AS MATERIALIZED (
      |  SELECT a.i AS i, b.i AS j, CAST(count(*) AS HUGEINT) AS n,
      |    count(*) * CAST(sum(a.qv * b.qv) AS HUGEINT)
      |      - CAST(sum(a.qv) AS HUGEINT) * CAST(sum(b.qv) AS HUGEINT) AS m
      |  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY 1, 2),
      |mfull AS MATERIALIZED (
      |  SELECT i, j, m FROM mom
      |  UNION ALL SELECT j, i, m FROM mom WHERE i < j),
      |b0 AS MATERIALIZED (
      |  SELECT i, j, m * 1000000000 // (SELECT max(abs(m)) FROM mfull) AS v
      |  FROM mfull)$sq,
      |yr AS MATERIALIZED (
      |  SELECT i, CAST(sum(v) AS HUGEINT) AS y FROM b$PcaSquarings GROUP BY 1),
      |ys AS MATERIALIZED (
      |  SELECT i, CASE WHEN (SELECT y FROM yr WHERE i = 0) < 0
      |    THEN -y ELSE y END AS y FROM yr),
      |v7 AS MATERIALIZED (
      |  SELECT i, y * 10000000 // (SELECT max(abs(y)) FROM ys) AS v FROM ys),
      |den AS (SELECT CAST(sum(v * v) AS HUGEINT) AS den FROM v7)""".stripMargin
  }

  val pcaPowerSql: String =
    s"""$pcaCtes,
      |num AS (
      |  SELECT CAST(sum(a.v * m.m * b.v) AS HUGEINT) AS num
      |  FROM mfull m JOIN v7 a ON a.i = m.i JOIN v7 b ON b.i = m.j),
      |tr AS (SELECT CAST(sum(m) AS HUGEINT) AS tr FROM mom WHERE i = j),
      |nn AS (SELECT max(n) AS n FROM mom),
      |tq AS (SELECT (num.num * 100) // den.den AS t FROM num, den),
      |sc AS (
      |  SELECT CAST((tq.t * 10) // (nn.n * nn.n * 100) AS BIGINT) AS lam_nano,
      |    CAST((tq.t * 1000000) // (tr.tr * 100) AS BIGINT) AS frac_micro
      |  FROM tq, nn, tr)
      |SELECT v.i AS dim,
      |  round(CAST(v.v AS DOUBLE) / sqrt(CAST(den.den AS DOUBLE)), 6) AS component,
      |  CAST(sc.lam_nano AS DOUBLE) / 1e9 AS eigenvalue,
      |  CAST(sc.frac_micro AS DOUBLE) / 1e6 AS explained_frac
      |FROM v7 v, den, sc ORDER BY dim""".stripMargin

  private val PcaProjTopK = 50

  /** Corpus projection onto the top principal component — the
    * distributed companion of [[pcaPower]]: every embedding's centered
    * PC1 score, top-|score| extremes reported (the vectors PCA calls
    * most atypical along the dominant axis — outlier triage, ordering
    * for visualization, coreset seeds). Centered score without ever
    * materializing the mean: (x−μ)ᵀv ∝ n·(qᵀv7) − Σⱼsⱼ·v7ⱼ, both
    * exact integers (the constant is one driver BigInt fold).
    *
    * Scale: the 64-value integer eigenvector broadcasts as a LITERAL
    * into a codegen'd [[graft.functions.VectorFunctions.vec_dot]] over
    * the scan — ZERO shuffles before the top-k, which is
    * TakeOrderedAndProject (per-partition top-k, no global sort).
    * Every dot-product partial is an integer < 2⁵³, so the double
    * accumulation is exact and order-independent, and the long cast is
    * lossless — the oracle replays bit-for-bit via list_inner_product.
    */
  def pcaProjection(spark: SparkSession, dir: String,
                    topK: Int = PcaProjTopK): DataFrame = {
    import spark.implicits._
    val m = pcaModel(spark, dir)
    val d = m.v7.length
    // n·dot − s0 is Long column arithmetic: |dot| ≤ 64·10⁴·10⁷ =
    // 6.4·10¹² and |s0| ≤ n·6.4·10¹², so the OUTPUT itself (not just
    // an intermediate) reaches 2⁶³ near n ≈ 7·10⁵ vectors — where
    // Spark would wrap silently while the oracle's BIGINT multiply
    // fails loudly (the r10 advisory). Fail loudly on BOTH engines:
    // at that scale shard the corpus or rescale the projection grid.
    require(m.n <= 700000L,
      s"pcaProjection: centered-score magnitude n·1.28e13 would exceed " +
        s"2^63 at n = ${m.n} > 700000 vectors — shard or rescale " +
        "(the ann_pq_auto loud-guard discipline)")
    val s0 = (0 until d).map(j => BigInt(m.sJ(j)) * m.v7(j)).sum.toLong
    // both dot inputs are integers < 2²⁴ (|qv| ≤ 10⁴, |v7ⱼ| ≤ 10⁷), so
    // the float elements, their double products, and every partial sum
    // (≤ 6.4·10¹²) are EXACT — vec_dot's double accumulation is
    // order-free here
    val v7f = m.v7.map(_.toFloat)
    val dot = graft.functions.VectorFunctions.vec_dot(
      transform($"embedding", v => round(v.cast("double") * 10000d, 0))
        .cast("array<float>"),
      typedLit(v7f.toSeq))
    Tables.embeddings(spark, dir)
      .select($"vec_id", $"label",
        (lit(m.n) * dot.cast("long") - lit(s0)).as("score_c"))
      .select($"vec_id", $"label", $"score_c",
        round($"score_c".cast("double") / lit(m.n.toDouble) / lit(10000.0)
          / sqrt(lit(m.den.toDouble)), 6).as("score"))
      .orderBy(abs($"score_c").desc, $"vec_id")
      .limit(topK)
  }

  val pcaProjectionSql: String =
    s"""$pcaCtes,
      |sums AS (SELECT i, CAST(sum(qv) AS BIGINT) AS s FROM q GROUP BY i),
      |nn AS (SELECT CAST(max(n) AS BIGINT) AS n FROM mom),
      |cons AS (
      |  SELECT CAST(sum(s.s * v.v) AS BIGINT) AS s0
      |  FROM sums s JOIN v7 v ON v.i = s.i),
      |vl AS (SELECT list(CAST(v AS DOUBLE) ORDER BY i) AS vl FROM v7),
      |proj AS (
      |  SELECT e.vec_id, e.label,
      |    nn.n * CAST(list_inner_product(
      |        list_transform(CAST(e.embedding AS DOUBLE[]), x -> round(x * 10000, 0)),
      |        (SELECT vl FROM vl)) AS BIGINT) - cons.s0 AS score_c
      |  FROM embeddings e, nn, cons)
      |SELECT vec_id, label, score_c,
      |  round(CAST(score_c AS DOUBLE) / CAST(nn.n AS DOUBLE) / 10000.0
      |    / sqrt(CAST(den.den AS DOUBLE)), 6) AS score
      |FROM proj, nn, den
      |ORDER BY abs(score_c) DESC, vec_id LIMIT $PcaProjTopK""".stripMargin

  private val RpDims = 16

  /** Johnson–Lindenstrauss random projection 64 → 16 dims with a
    * HASH-DERIVED sign matrix (Achlioptas ±1 construction): the
    * dimensionality-reduction pass that feeds cheap ANN pre-filters
    * and drift monitors without shipping a trained projection around —
    * the matrix is a pure function of (i, j), so every executor, every
    * run, and the DuckDB oracle materialize the identical projection.
    *
    * Exactness: components are quantized to the micro grid
    * (round(x·10⁶) BIGINT — float→double widening is exact), signs
    * come from the parity of an integer LCG over (i, j), and each
    * output is an exact 64-term integer dot product. No float
    * accumulation anywhere.
    *
    * Scale: a ZERO-SHUFFLE per-row map via the native [[graft.functions.RpProject]]
    * kernel — ONE static call inside whole-stage codegen over the scan,
    * one quantization pass per row. (The composable `transform` ×
    * `aggregate` HOF formulation is CodegenFallback: an interpreted
    * lambda frame per (i, j) term plus a re-round per output dim —
    * the PQ-encode lesson again; EmbeddingsSpec pins kernel ≡ HOF.)
    * The posexplode fans out only the 16 projected values per row.
    */
  def embeddingRp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val proj = graft.functions.VectorFunctions.rp_project($"embedding", RpDims)
    Tables.embeddings(spark, dir)
      .select($"vec_id", posexplode(proj).as(Seq("rp_dim", "proj_u")))
      .select($"vec_id", $"rp_dim",
        $"proj_u", round($"proj_u".cast("double") / 1000000d, 6).as("proj"))
      .orderBy($"vec_id", $"rp_dim")
  }

  val embeddingRpSql: String =
    s"""WITH cells AS (
      |  SELECT e.vec_id, CAST(j AS INT) AS rp_dim,
      |    CAST(sum(CAST(round(CAST(e.embedding[i + 1] AS DOUBLE) * 1000000, 0)
      |        AS BIGINT)
      |      * (CASE WHEN (CAST(i AS BIGINT) * $RpDims + CAST(j AS BIGINT) + 17)
      |             * (CAST(i AS BIGINT) * $RpDims + CAST(j AS BIGINT) + 17)
      |             * (CAST(i AS BIGINT) * $RpDims + CAST(j AS BIGINT) + 17)
      |             % 1000003 % 2 = 0
      |         THEN 1 ELSE -1 END)) AS BIGINT) AS proj_u
      |  FROM embeddings e
      |  CROSS JOIN (SELECT unnest(range(0, $RpDims)) AS j)
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i)
      |  GROUP BY e.vec_id, j)
      |SELECT vec_id, rp_dim, proj_u,
      |  round(CAST(proj_u AS DOUBLE) / 1000000, 6) AS proj
      |FROM cells ORDER BY vec_id, rp_dim""".stripMargin

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): within each
    * label cluster, elect the member closest to the class prototype as
    * the REPRESENTATIVE, score every member's cosine similarity to it,
    * and flag members above the similarity threshold as drops — the
    * embedding-space analog of [[graft.operators.Dedup]]'s lexical
    * near-dup family, used to thin semantically redundant training
    * data. Here the cluster assignment is the label column (the
    * prototype machinery of [[embeddingCentroids]]); with unlabeled
    * data the same pass runs over [[IvfIndex]]'s k-means cells.
    *
    * Engine-exactness: prototypes are the exact decimal-sum centroids;
    * representative election uses the integer micro-unit distances of
    * [[embeddingOutliers]] (vec_id tie-break); components quantize to
    * the 7dp integer grid BEFORE dot/norm products, so dot and norms
    * are exact integers and the cosine is one fixed-order double
    * division (IEEE sqrt), rounded 6dp.
    *
    * Scale: two (label, dim)-keyed partial aggs (centroids + member
    * components) and one label-keyed rank window; the representative
    * component table is |labels|·dims rows — model-sized — so AQE
    * broadcasts it back onto the member component stream. The corpus
    * embedding column itself never rides a shuffle wider than its
    * posexploded components.
    */
  def semdedup(spark: SparkSession, dir: String,
               simThreshold: Double = 0.93): DataFrame = {
    import spark.implicits._
    val comp = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label", posexplode($"embedding").as(Seq("dim", "v")))
      .withColumn("vm", round($"v".cast("double") * 10000000d, 0).cast("long"))
    val cent = comp.groupBy($"label", $"dim")
      .agg(count(lit(1)).as("n"),
        sum(round($"v".cast("double"), 7).cast("decimal(18,7)")).as("s"))
      .select($"label", $"dim",
        round($"s".cast("double") / $"n".cast("double"), 6).as("c"))
    val per = comp.join(cent, Seq("label", "dim"))
      .select($"vec_id", $"label", $"dim", $"vm",
        round(($"v".cast("double") - $"c") * 1000000d, 0).cast("long").as("e"))
      .groupBy($"vec_id", $"label")
      .agg(sum($"e" * $"e").as("dist2"),
        sum(($"vm" * $"vm").cast("decimal(38,0)")).as("n2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"label").orderBy($"dist2".asc, $"vec_id")
    val withRep = per.withColumn("is_rep",
      row_number().over(w) === 1)
    val repComp = withRep.filter($"is_rep")
      .select($"label", $"vec_id".as("rep_id"), $"n2".as("rep_n2"))
      .join(comp.select($"vec_id", $"dim", $"vm".as("rm")),
        $"rep_id" === $"vec_id")
      .select($"label", $"rep_id", $"rep_n2", $"dim", $"rm")
    val dots = comp.join(repComp, Seq("label", "dim"))
      .groupBy($"vec_id", $"label")
      .agg(sum(($"vm" * $"rm").cast("decimal(38,0)")).as("dot"),
        min($"rep_n2").as("rep_n2"))
    withRep.join(dots, Seq("vec_id", "label"))
      .select($"vec_id", $"label", $"is_rep",
        round($"dot".cast("double")
          / (sqrt($"n2".cast("double")) * sqrt($"rep_n2".cast("double"))), 6)
          .as("sim_to_rep"),
        ($"is_rep" || ($"dot".cast("double")
          / (sqrt($"n2".cast("double")) * sqrt($"rep_n2".cast("double")))
          < simThreshold)).as("is_kept"))
      .orderBy($"label", $"vec_id")
  }

  val semdedupSql: String =
    """WITH comp AS (
      |  SELECT vec_id, label, CAST(i AS INT) AS dim, embedding[i + 1] AS v,
      |    CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 10000000, 0) AS BIGINT)
      |      AS vm
      |  FROM embeddings
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
      |cent AS (
      |  SELECT label, dim,
      |    round(CAST(sum(CAST(round(CAST(v AS DOUBLE), 7) AS DECIMAL(18,7))) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE), 6) AS c
      |  FROM comp GROUP BY label, dim),
      |per AS (
      |  SELECT vec_id, comp.label AS label,
      |    CAST(sum(e * e) AS BIGINT) AS dist2,
      |    CAST(sum(CAST(vm * vm AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS n2
      |  FROM (
      |    SELECT vec_id, comp.label, vm,
      |      CAST(round((CAST(v AS DOUBLE) - c) * 1000000, 0) AS BIGINT) AS e
      |    FROM comp JOIN cent ON comp.label = cent.label AND comp.dim = cent.dim) comp
      |  GROUP BY vec_id, comp.label),
      |wr AS (
      |  SELECT vec_id, label, dist2, n2,
      |    row_number() OVER (PARTITION BY label ORDER BY dist2 ASC, vec_id) = 1
      |      AS is_rep
      |  FROM per),
      |repc AS (
      |  SELECT w.label, w.vec_id AS rep_id, w.n2 AS rep_n2, c.dim, c.vm AS rm
      |  FROM wr w JOIN comp c ON c.vec_id = w.vec_id
      |  WHERE w.is_rep),
      |dots AS (
      |  SELECT comp.vec_id, comp.label,
      |    CAST(sum(CAST(vm * rm AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS dot,
      |    min(rep_n2) AS rep_n2
      |  FROM comp JOIN repc ON comp.label = repc.label AND comp.dim = repc.dim
      |  GROUP BY comp.vec_id, comp.label)
      |SELECT w.vec_id, w.label, w.is_rep,
      |  round(CAST(dot AS DOUBLE)
      |    / (sqrt(CAST(w.n2 AS DOUBLE)) * sqrt(CAST(d.rep_n2 AS DOUBLE))), 6)
      |    AS sim_to_rep,
      |  w.is_rep OR (CAST(dot AS DOUBLE)
      |    / (sqrt(CAST(w.n2 AS DOUBLE)) * sqrt(CAST(d.rep_n2 AS DOUBLE)))
      |    < 0.93) AS is_kept
      |FROM wr w JOIN dots d ON d.vec_id = w.vec_id AND d.label = w.label
      |ORDER BY w.label, w.vec_id""".stripMargin
  // ------------------------------------------------------------------
  // embedding_mmd — linear-time two-sample kernel drift test
  // ------------------------------------------------------------------

  private val MmdC = 100000000L // polynomial-kernel offset on the 1e8 dot grid

  /** Linear-time MMD² two-sample test between the first and second
    * half of the embedding corpus (Gretton et al., "A Kernel
    * Two-Sample Test", JMLR 2012, §6 lemma 14 — the streaming/linear
    * estimator): consecutive-sample pairs (x₂ᵢ₋₁,x₂ᵢ) and (y₂ᵢ₋₁,y₂ᵢ)
    * contribute h(i) = k(x₁,x₂) + k(y₁,y₂) − k(x₁,y₂) − k(x₂,y₁);
    * MMD²_lin = mean(h). The distribution-shift SIGNIFICANCE companion
    * of [[embeddingDrift]]'s centroid distance: a mean shift moves the
    * centroid, but a covariance/mode change can leave centroids in
    * place — the quadratic kernel sees both.
    *
    * Exactness: components quantize to the 10⁴ grid (every vec_dot
    * partial < 2⁵³, double-exact), the degree-2 polynomial kernel
    * k(a,b) = (aᵀb + 10⁸)² is computed in DECIMAL(38,0)/HUGEINT and
    * floored onto the 10¹⁰ grid (k_q ≤ ~4.2·10⁹ — long-safe), and all
    * means are truncated divisions (both engines truncate toward zero
    * for the possibly-negative h sum). Pairing is deterministic:
    * row_number by vec_id within each half; an incomplete trailing
    * pair drops; cross terms align the i-th X pair with the i-th Y
    * pair (the inner join trims to the shorter half).
    *
    * Scale: ONE rank window per half (keyed shuffle), one p-keyed join
    * of two-vector pair rows — each vector rides exactly one shuffle,
    * O(n) total, versus the O(n²) full MMD. One row out; every
    * intermediate is released (eager-grid).
    */
  def embeddingMmd(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val cut = e.agg(expr("max(vec_id) div 2").as("cut"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"half").orderBy($"vec_id")
    val ranked = e.crossJoin(broadcast(cut))
      .withColumn("half", when($"vec_id" <= $"cut", 0).otherwise(1))
      .select($"half", $"vec_id",
        qvec($"embedding").cast("array<float>").as("qf"))
      .withColumn("rn", row_number().over(w))
      .select($"half", (($"rn" - 1) / 2).cast("long").as("p"),
        (($"rn" - 1) % 2).as("slot"), $"qf")
    val pairs = ranked.groupBy($"half", $"p")
      .agg(first(when($"slot" === 0, $"qf"), ignoreNulls = true).as("a"),
        first(when($"slot" === 1, $"qf"), ignoreNulls = true).as("b"))
      .filter($"a".isNotNull && $"b".isNotNull)
    val xp = pairs.filter($"half" === 0).select($"p", $"a".as("xa"), $"b".as("xb"))
    val yp = pairs.filter($"half" === 1).select($"p", $"a".as("ya"), $"b".as("yb"))
    def kq(u: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) = {
      val d = (graft.functions.VectorFunctions.vec_dot(u, v).cast("long") + MmdC)
        .cast("decimal(38,0)")
      val k = (d * d).cast("decimal(38,0)")
      val g = lit(10000000000L).cast("decimal(38,0)")
      ((k - (k % g)) / g).cast("long")
    }
    val h = xp.join(yp, "p")
      .select(kq($"xa", $"xb").as("kxx"), kq($"ya", $"yb").as("kyy"),
        kq($"xa", $"yb").as("kxy"), kq($"xb", $"ya").as("kyx"))
    def tdiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - (a % b)) / b).cast("long") // truncation toward zero, both engines
    val agg = h.agg(count(lit(1)).as("n_pairs"),
      sum($"kxx" + $"kyy").as("sw"), sum($"kxy" + $"kyx").as("sc"),
      sum($"kxx" + $"kyy" - $"kxy" - $"kyx").as("sh"))
    Release.grid(
      agg.select($"n_pairs",
        tdiv($"sw", $"n_pairs" * 2).as("mean_within_q"),
        tdiv($"sc", $"n_pairs" * 2).as("mean_cross_q"),
        tdiv($"sh", $"n_pairs").as("mmd2_q"),
        round(tdiv($"sh", $"n_pairs").cast("double") / 1e6, 6).as("mmd2")))
  }

  val embeddingMmdSql: String =
    """WITH cut AS (SELECT max(vec_id) // 2 AS cut FROM embeddings),
      |rk AS (
      |  SELECT vec_id, CASE WHEN vec_id <= cut THEN 0 ELSE 1 END AS half,
      |    row_number() OVER (
      |      PARTITION BY (CASE WHEN vec_id <= cut THEN 0 ELSE 1 END)
      |      ORDER BY vec_id) AS rn
      |  FROM embeddings, cut),
      |pm AS (
      |  SELECT half, (rn - 1) // 2 AS p,
      |    max(CASE WHEN (rn - 1) % 2 = 0 THEN vec_id END) AS a,
      |    max(CASE WHEN (rn - 1) % 2 = 1 THEN vec_id END) AS b
      |  FROM rk GROUP BY 1, 2
      |  HAVING max(CASE WHEN (rn - 1) % 2 = 0 THEN vec_id END) IS NOT NULL
      |     AND max(CASE WHEN (rn - 1) % 2 = 1 THEN vec_id END) IS NOT NULL),
      |xp AS (SELECT p, a, b FROM pm WHERE half = 0),
      |yp AS (SELECT p, a, b FROM pm WHERE half = 1),
      |need AS (
      |  SELECT xp.p, 'xx' AS kind, xp.a AS u, xp.b AS v FROM xp JOIN yp USING (p)
      |  UNION ALL SELECT yp.p, 'yy', yp.a, yp.b FROM xp JOIN yp USING (p)
      |  UNION ALL SELECT xp.p, 'xy', xp.a, yp.b FROM xp JOIN yp USING (p)
      |  UNION ALL SELECT xp.p, 'yx', xp.b, yp.a FROM xp JOIN yp USING (p)),
      |comp AS (
      |  SELECT vec_id, CAST(i AS INT) AS dim,
      |    CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 10000, 0) AS BIGINT) AS qv
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
      |dd AS (
      |  SELECT n.p, n.kind, CAST(sum(ca.qv * cb.qv) AS BIGINT) AS d
      |  FROM need n
      |  JOIN comp ca ON ca.vec_id = n.u
      |  JOIN comp cb ON cb.vec_id = n.v AND cb.dim = ca.dim
      |  GROUP BY 1, 2),
      |kk AS (
      |  SELECT p, kind,
      |    CAST((CAST(d AS HUGEINT) + 100000000)
      |      * (CAST(d AS HUGEINT) + 100000000) // 10000000000 AS BIGINT) AS k
      |  FROM dd),
      |hh AS (
      |  SELECT p,
      |    sum(CASE WHEN kind IN ('xx','yy') THEN k ELSE 0 END) AS w2,
      |    sum(CASE WHEN kind IN ('xy','yx') THEN k ELSE 0 END) AS c2
      |  FROM kk GROUP BY p),
      |ag AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(w2) AS HUGEINT) AS sw, CAST(sum(c2) AS HUGEINT) AS sc,
      |    CAST(sum(w2 - c2) AS HUGEINT) AS sh
      |  FROM hh)
      |SELECT n_pairs,
      |  CAST((sw - (sw % (n_pairs * 2))) // (n_pairs * 2) AS BIGINT) AS mean_within_q,
      |  CAST((sc - (sc % (n_pairs * 2))) // (n_pairs * 2) AS BIGINT) AS mean_cross_q,
      |  CAST((sh - (sh % n_pairs)) // n_pairs AS BIGINT) AS mmd2_q,
      |  round(CAST(CAST((sh - (sh % n_pairs)) // n_pairs AS BIGINT) AS DOUBLE) / 1e6, 6)
      |    AS mmd2
      |FROM ag""".stripMargin

}
