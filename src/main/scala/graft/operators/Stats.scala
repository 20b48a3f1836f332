package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Categorical-association statistics over the corpus metadata — the
  * "is my language mix independent of my source mix" questions a
  * curation pipeline asks before trusting per-source quotas. Two
  * operators over the documents lang × source contingency table:
  * the chi-square test of independence (+ Cramér's V effect size) and
  * the per-cell Pearson-residual table that says WHICH cells drive a
  * rejection.
  *
  * Engine-exactness doctrine (the ksTest convention, Behavior.scala):
  * every sum crossing a group boundary is exact integer arithmetic.
  * Cell contributions use the identity
  *   (O − E)²/E = (O·N − r·c)² / (r·c·N)  with E = r·c/N,
  * evaluated in micro-units by exact floor division — DECIMAL(38,0)
  * `(x − x%d)/d` in Spark ≡ HUGEINT `//` in DuckDB (dividend ≥ 0, so
  * truncation = floor in both). The chi² statistic is then an exact
  * long sum of per-cell micro contributions; doubles appear only in
  * display columns (one division / one sqrt, identical expression
  * order in both engines).
  *
  * Scale: the contingency table is GRID-cardinality (|langs|·|sources|,
  * bounded by label vocabularies, not corpus rows). One partial-agg
  * scan produces the cells; row/column marginals re-aggregate the
  * cells (grid-sized input, not a second corpus scan); everything
  * after is arithmetic on ≤ grid rows. Nothing about this plan changes
  * at 10⁹ documents except the one scan.
  *
  * Reference anchor: the reference POC stops at ingest
  * (consumer.py:68-81); this is part of the analytics surface the
  * brief layers on top.
  */
object Stats {

  /** Exact floor division on non-negative DECIMAL(38,0) columns:
    * x − x%d is an exact multiple of d, so the decimal division is
    * lossless (Spark rounds to scale 6, but the true quotient is an
    * integer well inside precision). With x ≥ 0 and d > 0, `%` agrees
    * between Spark and DuckDB and truncation equals floor. */
  private def fdivDec(x: Column, d: Column): Column =
    ((x - (x % d)) / d).cast("long")

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** The shared grid: one row per (lang, source) cell of the FULL cross
    * product (zero-observed cells included — they carry expected mass),
    * with observed count, marginals, total, and the exact micro-unit
    * chi² contribution. */
  private def cells(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val obs = Tables.documents(spark, dir)
      .groupBy($"lang", $"source").agg(count(lit(1)).as("o"))
    // marginals re-aggregate the grid-sized cell table, not the corpus
    val rt = obs.groupBy($"lang").agg(sum($"o").as("row_tot"))
    val ct = obs.groupBy($"source").agg(sum($"o").as("col_tot"))
    val n = obs.agg(sum($"o").as("n"))
    rt.crossJoin(ct).crossJoin(broadcast(n))
      .join(obs, Seq("lang", "source"), "left")
      .withColumn("o", coalesce($"o", lit(0L)))
      // a = O·N − r·c (long: |a| ≤ r·c ≤ N² — safe to N ≈ 3·10⁹;
      // beyond that the dec() casts below already carry the value)
      .withColumn("a", $"o" * $"n" - $"row_tot" * $"col_tot")
      .withColumn("contrib_micro",
        fdivDec(dec($"a") * dec($"a") * dec(lit(1000000L)),
          dec($"row_tot") * dec($"col_tot") * dec($"n")))
  }

  /** One-row chi-square test of lang ⟂ source independence: exact
    * micro-unit statistic, degrees of freedom, Cramér's V effect size
    * (√(χ²/(N·min(R−1,C−1)))), and the α=0.05 decision against the
    * Wilson–Hilferty closed-form critical value
    * dof·(1 − 2/(9·dof) + z₀.₉₅·√(2/(9·dof)))³ — a documented
    * approximation (exact to ~0.1% at dof ≥ 10; our grid has dof 76),
    * chosen because it is a deterministic closed form both engines
    * evaluate identically (no inverse-χ² table dependency). */
  def chi2Independence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val z95 = 1.6448536269514722 // Φ⁻¹(0.95), standard published value
    // Wilson–Hilferty term as explicit multiplies (x·x·x, not pow):
    // IEEE multiply and sqrt are correctly rounded, so the whole
    // critical-value expression is bit-deterministic across engines.
    def wh(dofD: Column): Column = {
      val x = lit(1.0) - lit(2.0) / (lit(9.0) * dofD) +
        lit(z95) * sqrt(lit(2.0) / (lit(9.0) * dofD))
      dofD * x * x * x
    }
    cells(spark, dir)
      .agg(
        max($"n").as("nl"),
        countDistinct($"lang").as("r"),
        countDistinct($"source").as("c"),
        sum($"contrib_micro").as("chi2_micro"))
      .select(
        $"nl".cast("long").as("n"),
        $"r".cast("int").as("n_rows"),
        $"c".cast("int").as("n_cols"),
        (($"r" - 1) * ($"c" - 1)).cast("int").as("dof"),
        round($"chi2_micro".cast("double") / 1000000d, 6).as("chi2"),
        round(
          sqrt(($"chi2_micro".cast("double") / 1000000d)
            / ($"nl".cast("double") * least($"r" - 1, $"c" - 1).cast("double"))),
          6).as("cramers_v"),
        round(wh((($"r" - 1) * ($"c" - 1)).cast("double")), 6).as("chi2_crit_95"),
        ($"chi2_micro".cast("double") / 1000000d >
          wh((($"r" - 1) * ($"c" - 1)).cast("double"))).as("significant_95"))
  }

  val chi2IndependenceSql: String =
    """WITH obs AS (
      |  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
      |  FROM documents GROUP BY lang, source),
      |rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS row_tot FROM obs GROUP BY lang),
      |ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS col_tot FROM obs GROUP BY source),
      |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
      |grid AS (
      |  SELECT rt.lang, ct.source, rt.row_tot, ct.col_tot, t.n,
      |    COALESCE(obs.o, 0) AS o
      |  FROM rt CROSS JOIN ct CROSS JOIN t
      |  LEFT JOIN obs ON obs.lang = rt.lang AND obs.source = ct.source),
      |cell AS (
      |  SELECT lang, source, n,
      |    (CAST(o*n - row_tot*col_tot AS HUGEINT)
      |       * CAST(o*n - row_tot*col_tot AS HUGEINT) * 1000000)
      |      // (CAST(row_tot AS HUGEINT) * CAST(col_tot AS HUGEINT)
      |          * CAST(n AS HUGEINT)) AS contrib_micro
      |  FROM grid),
      |agg AS (
      |  SELECT max(n) AS nl, count(DISTINCT lang) AS r,
      |    count(DISTINCT source) AS c,
      |    CAST(sum(contrib_micro) AS BIGINT) AS chi2_micro
      |  FROM cell),
      |whx AS (
      |  SELECT *,
      |    1.0 - 2.0/(9.0*CAST((r-1)*(c-1) AS DOUBLE))
      |      + 1.6448536269514722*sqrt(2.0/(9.0*CAST((r-1)*(c-1) AS DOUBLE))) AS x
      |  FROM agg)
      |SELECT CAST(nl AS BIGINT) AS n, CAST(r AS INT) AS n_rows,
      |  CAST(c AS INT) AS n_cols, CAST((r-1)*(c-1) AS INT) AS dof,
      |  round(CAST(chi2_micro AS DOUBLE) / 1000000, 6) AS chi2,
      |  round(sqrt((CAST(chi2_micro AS DOUBLE) / 1000000)
      |    / (CAST(nl AS DOUBLE) * CAST(least(r-1, c-1) AS DOUBLE))), 6) AS cramers_v,
      |  round(CAST((r-1)*(c-1) AS DOUBLE) * x * x * x, 6) AS chi2_crit_95,
      |  CAST(chi2_micro AS DOUBLE) / 1000000 >
      |    CAST((r-1)*(c-1) AS DOUBLE) * x * x * x AS significant_95
      |FROM whx""".stripMargin

  /** The full per-cell table behind [[chi2Independence]]: observed vs
    * expected (exact micro-unit floor) and the Pearson standardized
    * residual (O−E)/√E = a/√(r·c·N) — the cell-level "which
    * (lang, source) combinations are over/under-represented" drill-in.
    * Grid-cardinality output; residual is the single display double. */
  def contingencyResiduals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    cells(spark, dir)
      .select($"lang", $"source", $"o".as("observed"),
        $"row_tot", $"col_tot",
        fdivDec(dec($"row_tot") * dec($"col_tot") * dec(lit(1000000L)), dec($"n"))
          .as("expected_micro"),
        $"contrib_micro",
        round($"a".cast("double")
          / sqrt(($"row_tot" * $"col_tot" * $"n").cast("double")), 6)
          .as("std_residual"))
      .orderBy($"lang", $"source")
  }

  // ------------------------------------------------------------------
  // anova_oneway — one-way ANOVA F-test over event_type groups
  // ------------------------------------------------------------------

  /** The event-type vocabulary, pinned in alphabetical order. Explicit
    * like [[Sampling.sampleStratified]]'s per-stratum cut map: the
    * per-group moment columns must be a FIXED expression tree so the
    * cross-group double arithmetic has one deterministic evaluation
    * order in both engines (the [[Behavior.abTtest]] convention,
    * generalized from 2 pivoted groups to k). */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** One-way ANOVA of event value across the k event types — the
    * "does this metric differ by segment at all" omnibus test that
    * precedes pairwise t-tests (abTtest is the k=2 special case).
    *
    * Exactness: per-group n/Σv/Σv² are conditional aggregates over
    * 4dp-quantized DECIMAL values (exact, order-free in both engines);
    * the grand moments aggregate unconditionally in the same pass. The
    * F statistic is then ONE fixed-order scalar double tree over those
    * 3k+3 exact inputs — between-groups mass as Σ s_g²/n_g − S²/N in
    * the pinned alphabetical group order. The α=0.05 decision uses
    * F_crit(k−1, ∞) = χ²_crit(k−1)/(k−1) via the same Wilson–Hilferty
    * closed form as [[chi2Independence]] — documented approximation,
    * exact to ~0.4% at dof 4 and valid because dof_within ≫ 10³ at
    * every SF (the asymptotic denominator regime).
    *
    * Scale: one map-side-partial aggregate over the events scan into a
    * single row; everything after is scalar arithmetic. Nothing
    * changes at 10⁹ rows but the scan. */
  def anovaOneway(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = round($"value", 4).cast("decimal(14,4)")
    val perGroup = EventTypes.flatMap { g =>
      Seq(
        sum(when($"event_type" === g, 1L).otherwise(0L)).as(s"n_$g"),
        sum(when($"event_type" === g, v)).as(s"s_$g"),
        sum(when($"event_type" === g, v * v)).as(s"ss_$g"))
    }
    val grand = Seq(
      count(lit(1)).as("n"), sum(v).as("s"), sum(v * v).as("ss"))
    val m0 = Tables.events(spark, dir).agg(grand.head, (grand.tail ++ perGroup): _*)
    // vocabulary guard: the pinned EventTypes list must PARTITION the
    // corpus — an event_type outside it would silently inflate
    // ss_within (its mass enters grand moments but no group) and a
    // missing type would null F via n_g = 0. assert_true returns NULL
    // when the invariant holds (coalesce keeps the row, output
    // unchanged) and THROWS on vocabulary drift instead of producing a
    // plausible-but-wrong statistic.
    val groupTotal = EventTypes.map(g => col(s"n_$g")).reduceLeft(_ + _)
    val minGroup = EventTypes.map(g => col(s"n_$g")).reduce(least(_, _))
    val m = m0.where(coalesce(
      assert_true(groupTotal === col("n") && minGroup > 0,
        lit("anova_oneway: event_type vocabulary drift — pinned groups no longer partition the corpus")),
      lit(true)))
    val k = EventTypes.size
    val nD = col("n").cast("double")
    val sD = col("s").cast("double")
    val ssD = col("ss").cast("double")
    // fixed-order Σ s_g²/n_g: alphabetical, left-assoc — one tree
    val sumSq = EventTypes
      .map(g => col(s"s_$g").cast("double") * col(s"s_$g").cast("double")
        / col(s"n_$g").cast("double"))
      .reduceLeft(_ + _)
    m.select(
      col("n").cast("long").as("n"), lit(k).as("k"),
      lit(k - 1).as("dof_between"), (col("n") - k).cast("long").as("dof_within"),
      round(sD / nD, 6).as("grand_mean"),
      round(sumSq - sD * sD / nD, 6).as("ss_between"),
      round(ssD - sumSq, 6).as("ss_within"),
      round(((sumSq - sD * sD / nD) / lit((k - 1).toDouble))
        / ((ssD - sumSq) / (nD - lit(k.toDouble))), 6).as("f_stat"),
      round((sumSq - sD * sD / nD) / (ssD - sD * sD / nD), 6).as("eta_sq"),
      lit(math.rint(whCrit(k - 1) / (k - 1).toDouble * 1e6) / 1e6).as("f_crit_95"),
      (((sumSq - sD * sD / nD) / lit((k - 1).toDouble))
        / ((ssD - sumSq) / (nD - lit(k.toDouble)))
        > whCrit(k - 1) / (k - 1).toDouble).as("significant_95"))
  }

  /** Wilson–Hilferty χ² 95th-percentile critical value for integer dof
    * as a Scala-side double literal (both engines then compare against
    * the SAME constant — no cross-engine libm exposure at all). */
  private def whCrit(dof: Int): Double = {
    val z95 = 1.6448536269514722
    val d = dof.toDouble
    val x = 1.0 - 2.0 / (9.0 * d) + z95 * math.sqrt(2.0 / (9.0 * d))
    d * x * x * x
  }

  val anovaOnewaySql: String = {
    val groups = EventTypes.map { g =>
      s"""    sum(CASE WHEN event_type = '$g' THEN 1 ELSE 0 END) AS n_$g,
         |    sum(CASE WHEN event_type = '$g' THEN CAST(round(value, 4) AS DECIMAL(14,4)) END) AS s_$g,
         |    sum(CASE WHEN event_type = '$g' THEN CAST(round(value, 4) AS DECIMAL(14,4))
         |        * CAST(round(value, 4) AS DECIMAL(14,4)) END) AS ss_$g""".stripMargin
    }.mkString(",\n")
    val k = EventTypes.size
    val sumSq = EventTypes
      .map(g => s"CAST(s_$g AS DOUBLE) * CAST(s_$g AS DOUBLE) / CAST(n_$g AS DOUBLE)")
      .reduceLeft((a, b) => s"($a + $b)")
    val crit = whCrit(k - 1) / (k - 1).toDouble
    s"""WITH m AS (
       |  SELECT count(*) AS n,
       |    sum(CAST(round(value, 4) AS DECIMAL(14,4))) AS s,
       |    sum(CAST(round(value, 4) AS DECIMAL(14,4))
       |      * CAST(round(value, 4) AS DECIMAL(14,4))) AS ss,
       |$groups
       |  FROM events)
       |SELECT CAST(n AS BIGINT) AS n, $k AS k,
       |  ${k - 1} AS dof_between, CAST(n - $k AS BIGINT) AS dof_within,
       |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS grand_mean,
       |  round($sumSq - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ss_between,
       |  round(CAST(ss AS DOUBLE) - $sumSq, 6) AS ss_within,
       |  round((($sumSq - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / ${(k - 1).toDouble})
       |    / ((CAST(ss AS DOUBLE) - $sumSq) / (CAST(n AS DOUBLE) - ${k.toDouble})), 6) AS f_stat,
       |  round(($sumSq - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
       |    / (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS eta_sq,
       |  round($crit, 6) AS f_crit_95,
       |  (($sumSq - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / ${(k - 1).toDouble})
       |    / ((CAST(ss AS DOUBLE) - $sumSq) / (CAST(n AS DOUBLE) - ${k.toDouble})) > $crit AS significant_95
       |FROM m""".stripMargin
  }

  // ------------------------------------------------------------------
  // spearman_corr — rank correlation via the joint value grid
  // ------------------------------------------------------------------

  /** Spearman rank correlation (with the Pearson raw-value coefficient
    * alongside) between l_quantity and l_discount — the monotone-
    * association readout that survives outliers and nonlinearity,
    * over two GRID-valued columns (50 quantities × 11 discount steps).
    *
    * The trick that makes it exact AND scale-safe: Spearman needs a
    * global rank, but ranks of a grid-valued column depend only on the
    * per-value counts. So: one corpus pass → joint (xq, yq, cnt) cells
    * (≤ 550 rows); marginal cumulative counts over the ≤ 50-row value
    * grids give each value its midrank as the exact INTEGER doubled
    * rank 2R = 2·cnt_below + cnt_eq + 1 (ties share the midrank, the
    * textbook tie treatment — doubling keeps the ½ exact); then every
    * sum Pearson needs (Σ cnt·2Rx·2Ry …) is exact DECIMAL(38,0)
    * integer arithmetic over the cell table. ρ is one fixed scalar
    * double tree over those exact sums (headroom: 4N³ < 10³⁸ holds to
    * N ≈ 10¹² rows). The cumulative windows are unpartitioned but read
    * value-grid inputs — the mann_whitney/ks_test pattern, registered
    * in PlanSpec's grid sweep.
    *
    * Scale: one partial-agg scan → grid cells; the corpus never rides
    * a shuffle wider than (xq, yq) pairs, and nothing downstream grows
    * with rows. */
  /** Shared joint value grid for the rank-statistics pair
    * ([[spearmanCorr]], [[kendallTau]]): quantity × discount cell
    * counts, ≤ 50·11 rows at any corpus size. */
  private def qdCells(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select(round($"l_quantity", 0).cast("int").as("xq"),
        round($"l_discount" * 100, 0).cast("int").as("yq"))
      .groupBy($"xq", $"yq").agg(count(lit(1)).as("cnt"))
  }

  def spearmanCorr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val cells = qdCells(spark, dir)
    def midranks(key: String): DataFrame = {
      val w = Window.orderBy(col(key))
        .rowsBetween(Window.unboundedPreceding, -1)
      cells.groupBy(col(key)).agg(sum($"cnt").as("ceq"))
        .withColumn("cb", coalesce(sum($"ceq").over(w), lit(0L)))
        .select(col(key), (lit(2L) * $"cb" + $"ceq" + 1L).as(s"r2_$key"))
    }
    val joined = cells
      .join(broadcast(midranks("xq")), "xq")
      .join(broadcast(midranks("yq")), "yq")
    val d = (c: Column) => c.cast("decimal(38,0)")
    val agg = joined.agg(
      sum($"cnt").as("n"),
      countDistinct($"xq").as("ndx"), countDistinct($"yq").as("ndy"),
      sum(d($"cnt") * d($"r2_xq")).as("sx"),
      sum(d($"cnt") * d($"r2_yq")).as("sy"),
      sum(d($"cnt") * d($"r2_xq") * d($"r2_xq")).as("sxx"),
      sum(d($"cnt") * d($"r2_yq") * d($"r2_yq")).as("syy"),
      sum(d($"cnt") * d($"r2_xq") * d($"r2_yq")).as("sxy"),
      sum(d($"cnt") * d($"xq")).as("px"),
      sum(d($"cnt") * d($"yq")).as("py"),
      sum(d($"cnt") * d($"xq") * d($"xq")).as("pxx"),
      sum(d($"cnt") * d($"yq") * d($"yq")).as("pyy"),
      sum(d($"cnt") * d($"xq") * d($"yq")).as("pxy"))
    def corr(n: Column, sx: Column, sy: Column,
             sxx: Column, syy: Column, sxy: Column): Column = {
      val (nD, sxD, syD) = (n.cast("double"), sx.cast("double"), sy.cast("double"))
      val (sxxD, syyD, sxyD) = (sxx.cast("double"), syy.cast("double"), sxy.cast("double"))
      (nD * sxyD - sxD * syD) /
        sqrt((nD * sxxD - sxD * sxD) * (nD * syyD - syD * syD))
    }
    agg.select(
      $"n".cast("long").as("n"),
      $"ndx".cast("int").as("n_distinct_x"), $"ndy".cast("int").as("n_distinct_y"),
      round(corr($"n", $"sx", $"sy", $"sxx", $"syy", $"sxy"), 6).as("spearman_rho"),
      round(corr($"n", $"px", $"py", $"pxx", $"pyy", $"pxy"), 6).as("pearson_r"))
  }

  val spearmanCorrSql: String =
    """WITH cells AS (
      |  SELECT CAST(round(l_quantity, 0) AS INT) AS xq,
      |    CAST(round(l_discount * 100, 0) AS INT) AS yq,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |xm AS (
      |  SELECT xq, 2 * COALESCE(sum(ceq) OVER (ORDER BY xq
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    + ceq + 1 AS r2x
      |  FROM (SELECT xq, sum(cnt) AS ceq FROM cells GROUP BY xq)),
      |ym AS (
      |  SELECT yq, 2 * COALESCE(sum(ceq) OVER (ORDER BY yq
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    + ceq + 1 AS r2y
      |  FROM (SELECT yq, sum(cnt) AS ceq FROM cells GROUP BY yq)),
      |j AS (
      |  SELECT cells.*, xm.r2x, ym.r2y FROM cells
      |  JOIN xm USING (xq) JOIN ym USING (yq)),
      |s AS (
      |  SELECT CAST(sum(cnt) AS BIGINT) AS n,
      |    count(DISTINCT xq) AS ndx, count(DISTINCT yq) AS ndy,
      |    sum(CAST(cnt AS HUGEINT) * CAST(r2x AS HUGEINT)) AS sx,
      |    sum(CAST(cnt AS HUGEINT) * CAST(r2y AS HUGEINT)) AS sy,
      |    sum(CAST(cnt AS HUGEINT) * CAST(r2x AS HUGEINT) * CAST(r2x AS HUGEINT)) AS sxx,
      |    sum(CAST(cnt AS HUGEINT) * CAST(r2y AS HUGEINT) * CAST(r2y AS HUGEINT)) AS syy,
      |    sum(CAST(cnt AS HUGEINT) * CAST(r2x AS HUGEINT) * CAST(r2y AS HUGEINT)) AS sxy,
      |    sum(CAST(cnt AS HUGEINT) * CAST(xq AS HUGEINT)) AS px,
      |    sum(CAST(cnt AS HUGEINT) * CAST(yq AS HUGEINT)) AS py,
      |    sum(CAST(cnt AS HUGEINT) * CAST(xq AS HUGEINT) * CAST(xq AS HUGEINT)) AS pxx,
      |    sum(CAST(cnt AS HUGEINT) * CAST(yq AS HUGEINT) * CAST(yq AS HUGEINT)) AS pyy,
      |    sum(CAST(cnt AS HUGEINT) * CAST(xq AS HUGEINT) * CAST(yq AS HUGEINT)) AS pxy
      |  FROM j)
      |SELECT n, CAST(ndx AS INT) AS n_distinct_x, CAST(ndy AS INT) AS n_distinct_y,
      |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
      |    AS spearman_rho,
      |  round((CAST(n AS DOUBLE) * CAST(pxy AS DOUBLE) - CAST(px AS DOUBLE) * CAST(py AS DOUBLE))
      |    / sqrt((CAST(n AS DOUBLE) * CAST(pxx AS DOUBLE) - CAST(px AS DOUBLE) * CAST(px AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(pyy AS DOUBLE) - CAST(py AS DOUBLE) * CAST(py AS DOUBLE))), 6)
      |    AS pearson_r
      |FROM s""".stripMargin

  // ------------------------------------------------------------------
  // kendall_tau — tau-b from the joint grid's cell-pair table
  // ------------------------------------------------------------------

  /** Kendall's τ-b between l_quantity and l_discount — the
    * concordant-vs-discordant pair view of the same monotone
    * association [[spearmanCorr]] measures through ranks (τ is the
    * probability-of-agreement scale statisticians prefer for heavily
    * tied data; reporting both is standard practice).
    *
    * Naively τ is an O(n²) pair statistic; over grid-valued columns
    * every pair count is a product of CELL counts, so the whole
    * statistic collapses to a ≤550² cell-pair join — grid², corpus-
    * independent. Concordant mass C = Σ_{x₁<x₂, y₁<y₂} c₁·c₂,
    * discordant D likewise with y₁>y₂ (each unordered pair counted
    * once via the x₁<x₂ guard); tie masses n₁/n₂ come from the
    * marginal counts, n₀ = n(n−1)/2. τ-b = (C−D)/√((n₀−n₁)(n₀−n₂)).
    * All masses are exact DECIMAL(38,0)/HUGEINT integer sums (c₁·c₂
    * products cast before multiply); τ is one fixed double tree.
    *
    * Scale: one partial-agg scan → cells; the pair join is a
    * broadcast nested loop over TWO grid-sized sides (bounded by the
    * value domains); marginal/tie aggregates re-read the cell table.
    * Nothing downstream of the scan grows with rows.
    *
    * Output-range contract: the RAW pair-mass columns (concordant /
    * discordant / ties_x / ties_y) are reported as BIGINT and are
    * O(n²) quantities — they stay in Long range only for n ≲ 4.3×10⁹
    * rows (beyond that Spark's non-ANSI cast nulls while DuckDB's CAST
    * errors). τ-b itself is computed from the DECIMAL(38,0)/HUGEINT
    * masses BEFORE the display cast and is exact to n ≈ 10¹⁸; past
    * 4e9 rows drop the raw-mass display columns or widen them to
    * DECIMAL — the statistic needs no change. */
  def kendallTau(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = qdCells(spark, dir)
    val d = (c: Column) => c.cast("decimal(38,0)")
    val a = cells.select($"xq".as("x1"), $"yq".as("y1"), $"cnt".as("c1"))
    val b = cells.select($"xq".as("x2"), $"yq".as("y2"), $"cnt".as("c2"))
    val pairs = a.join(broadcast(b), $"x1" < $"x2")
      .agg(
        sum(when($"y1" < $"y2", d($"c1") * d($"c2")).otherwise(d(lit(0))))
          .as("conc"),
        sum(when($"y1" > $"y2", d($"c1") * d($"c2")).otherwise(d(lit(0))))
          .as("disc"))
    val marg = cells.agg(
      sum($"cnt").as("n"),
      // n1/n2 need marginal counts: Σ_x (Σ_y cnt)·(Σ_y cnt − 1)/2 —
      // computed from per-x/per-y re-aggregates below
      countDistinct($"xq").as("ndx"), countDistinct($"yq").as("ndy"))
    val tiesX = cells.groupBy($"xq").agg(sum($"cnt").as("cx"))
      .agg(sum(d($"cx") * d($"cx" - 1) / 2).cast("decimal(38,0)").as("n1"))
    val tiesY = cells.groupBy($"yq").agg(sum($"cnt").as("cy"))
      .agg(sum(d($"cy") * d($"cy" - 1) / 2).cast("decimal(38,0)").as("n2"))
    pairs.crossJoin(broadcast(marg)).crossJoin(broadcast(tiesX))
      .crossJoin(broadcast(tiesY))
      .select(
        $"n".cast("long").as("n"),
        $"ndx".cast("int").as("n_distinct_x"), $"ndy".cast("int").as("n_distinct_y"),
        $"conc".cast("long").as("concordant"),
        $"disc".cast("long").as("discordant"),
        $"n1".cast("long").as("ties_x"), $"n2".cast("long").as("ties_y"),
        round(($"conc".cast("double") - $"disc".cast("double"))
          / sqrt((d($"n") * d($"n" - 1) / 2).cast("double") - $"n1".cast("double"))
          / sqrt((d($"n") * d($"n" - 1) / 2).cast("double") - $"n2".cast("double")), 6)
          .as("tau_b"))
  }

  val kendallTauSql: String =
    """WITH cells AS (
      |  SELECT CAST(round(l_quantity, 0) AS INT) AS xq,
      |    CAST(round(l_discount * 100, 0) AS INT) AS yq,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |pairs AS (
      |  SELECT
      |    sum(CASE WHEN a.yq < b.yq
      |      THEN CAST(a.cnt AS HUGEINT) * CAST(b.cnt AS HUGEINT)
      |      ELSE CAST(0 AS HUGEINT) END) AS conc,
      |    sum(CASE WHEN a.yq > b.yq
      |      THEN CAST(a.cnt AS HUGEINT) * CAST(b.cnt AS HUGEINT)
      |      ELSE CAST(0 AS HUGEINT) END) AS disc
      |  FROM cells a JOIN cells b ON a.xq < b.xq),
      |marg AS (
      |  SELECT CAST(sum(cnt) AS BIGINT) AS n,
      |    count(DISTINCT xq) AS ndx, count(DISTINCT yq) AS ndy
      |  FROM cells),
      |tx AS (
      |  SELECT sum(CAST(cx AS HUGEINT) * CAST(cx - 1 AS HUGEINT) // 2) AS n1
      |  FROM (SELECT sum(cnt) AS cx FROM cells GROUP BY xq)),
      |ty AS (
      |  SELECT sum(CAST(cy AS HUGEINT) * CAST(cy - 1 AS HUGEINT) // 2) AS n2
      |  FROM (SELECT sum(cnt) AS cy FROM cells GROUP BY yq))
      |SELECT n, CAST(ndx AS INT) AS n_distinct_x, CAST(ndy AS INT) AS n_distinct_y,
      |  CAST(conc AS BIGINT) AS concordant, CAST(disc AS BIGINT) AS discordant,
      |  CAST(n1 AS BIGINT) AS ties_x, CAST(n2 AS BIGINT) AS ties_y,
      |  round((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
      |    / sqrt(CAST(CAST(n AS HUGEINT) * CAST(n - 1 AS HUGEINT) // 2 AS DOUBLE)
      |      - CAST(n1 AS DOUBLE))
      |    / sqrt(CAST(CAST(n AS HUGEINT) * CAST(n - 1 AS HUGEINT) // 2 AS DOUBLE)
      |      - CAST(n2 AS DOUBLE)), 6) AS tau_b
      |FROM pairs CROSS JOIN marg CROSS JOIN tx CROSS JOIN ty""".stripMargin

  val contingencyResidualsSql: String =
    """WITH obs AS (
      |  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
      |  FROM documents GROUP BY lang, source),
      |rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS row_tot FROM obs GROUP BY lang),
      |ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS col_tot FROM obs GROUP BY source),
      |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
      |grid AS (
      |  SELECT rt.lang, ct.source, rt.row_tot, ct.col_tot, t.n,
      |    COALESCE(obs.o, 0) AS o
      |  FROM rt CROSS JOIN ct CROSS JOIN t
      |  LEFT JOIN obs ON obs.lang = rt.lang AND obs.source = ct.source)
      |SELECT lang, source, o AS observed, row_tot, col_tot,
      |  CAST((CAST(row_tot AS HUGEINT) * CAST(col_tot AS HUGEINT) * 1000000)
      |    // CAST(n AS HUGEINT) AS BIGINT) AS expected_micro,
      |  CAST((CAST(o*n - row_tot*col_tot AS HUGEINT)
      |      * CAST(o*n - row_tot*col_tot AS HUGEINT) * 1000000)
      |    // (CAST(row_tot AS HUGEINT) * CAST(col_tot AS HUGEINT)
      |        * CAST(n AS HUGEINT)) AS BIGINT) AS contrib_micro,
      |  round(CAST(o*n - row_tot*col_tot AS DOUBLE)
      |    / sqrt(CAST(row_tot*col_tot*n AS DOUBLE)), 6) AS std_residual
      |FROM grid ORDER BY lang, source""".stripMargin

  // ------------------------------------------------------------------
  // levene_test — homogeneity of variances across event types
  // ------------------------------------------------------------------

  /** Levene's test (Levene 1960) for homogeneity of variances across
    * event-type groups — the assumption check read BEFORE trusting
    * anova_oneway's pooled within-group variance: a one-way ANOVA on
    * the absolute deviations z = |x − x̄_group|. Unlike anova_oneway's
    * pinned 5-type pivot, the group set here is derived from the data
    * (any vocabulary), which forces the cross-group discipline below.
    *
    * Exactness: group means come from 4dp-decimal sums and are rounded
    * to 6 before broadcasting back, so both engines subtract the
    * identical double; z is re-quantized to a 6dp DECIMAL so the
    * within-group Σz/Σz² are exact decimal sums (never raw-double
    * accumulation); the cross-group masses Σᵢ Sz_i²/n_i ride the micro
    * idiom (per-group round(·×10⁶) → exact long sum), so the F
    * numerator/denominator are deterministic regardless of group count
    * or order. Scale: two corpus passes (means agg; z agg behind a
    * |types|-row broadcast join), then arithmetic on the group grid —
    * one row out at any scale.
    */
  def leveneTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x4 = round($"value", 4)
    val means = Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum(x4.cast("decimal(14,4)")).as("sx"))
      .select($"event_type",
        round($"sx".cast("double") / $"n", 6).as("mean6"))
    val z = Tables.events(spark, dir)
      .join(broadcast(means), "event_type")
      .select($"event_type",
        round(abs(x4 - $"mean6"), 6).cast("decimal(16,6)").as("z"))
    val g = z.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"z").as("sz"),
        sum($"z" * $"z").as("szz"))
      .select($"n", $"sz", $"szz",
        round($"sz".cast("double") * $"sz".cast("double") / $"n" * 1e6, 0)
          .cast("long").as("ai"))
    g.agg(count(lit(1)).as("k"), sum($"n").as("nn"),
        sum($"sz").as("szsum"), sum($"szz").as("szzsum"),
        sum($"ai").as("a"))
      .select($"k", $"nn".as("n_total"),
        $"szsum".cast("double").as("szsum"),
        $"szzsum".cast("double").as("szzsum"),
        ($"a".cast("double") / 1e6).as("ad"))
      .select($"k".as("k_groups"), $"n_total",
        round($"ad" - $"szsum" * $"szsum" / $"n_total", 6).as("ss_between"),
        round($"szzsum" - $"ad", 6).as("ss_within"),
        round((($"ad" - $"szsum" * $"szsum" / $"n_total") / ($"k" - 1L))
          / (($"szzsum" - $"ad") / ($"n_total" - $"k")), 6).as("f_stat"))
  }

  // ------------------------------------------------------------------
  // bootstrap_ci — Poisson bootstrap for the purchase-value mean
  // ------------------------------------------------------------------

  private val BootB = 40

  /** Poisson bootstrap (Chamandy et al. 2012, "Estimating uncertainty
    * for massive data streams"): B = 40 deterministic replicates of
    * the purchase-value mean, each event re-weighted by a
    * Poisson(1)-distributed integer derived from a salted md5 — the
    * resample-without-materializing trick that makes bootstrap CIs
    * computable in one aggregation pass over a corpus too large to
    * sample row-by-row. Output: point mean, nearest-rank 95 % CI over
    * the replicate means, and the bootstrap SE.
    *
    * Exactness: the Poisson draw is a CASE ladder on a 2-hex-char md5
    * value (0..255 against ⌊256·F(k)⌋ thresholds — integer compare,
    * engine-identical); replicate means are decimal-ratio rounds cast
    * back to 6dp DECIMAL so the cross-replicate Σm/Σm² are exact
    * decimal sums; order statistics come from a row_number over the
    * 40-row replicate grid (registered grid-bounded). Scale: the ×B
    * fan-out happens INSIDE the map-side partial aggregate (explode →
    * combine to B·partitions rows), so shuffle traffic is B rows per
    * partition, never B× the corpus.
    */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x4 = round($"value", 4).cast("decimal(14,4)")
    val base = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"event_id", x4.as("x"))
    val h2 = conv(substring(md5(concat(lit("bs:"), $"b".cast("string"),
      lit(":"), $"event_id".cast("string"))), 1, 2), 16, 10).cast("long")
    val w = when(h2 <= 93, 0L).when(h2 <= 187, 1L).when(h2 <= 234, 2L)
      .when(h2 <= 250, 3L).when(h2 <= 254, 4L).otherwise(5L)
    val reps = base
      .select($"event_id", $"x",
        explode(sequence(lit(1), lit(BootB))).as("b"))
      .withColumn("w", w)
      .groupBy($"b")
      .agg(sum($"w").as("sw"), sum($"w" * $"x").as("swx"))
      .select($"b",
        round($"swx".cast("double") / $"sw", 6).cast("decimal(16,6)").as("m"))
    val ranked = reps.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy($"m", $"b")))
    val stats = reps.agg(sum($"m").as("sm"), sum($"m" * $"m").as("smm"),
      count(lit(1)).as("bn"))
    Tables.events(spark, dir).filter($"event_type" === "purchase")
      .agg(count(lit(1)).as("n_events"), sum(x4).as("sx"))
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(ranked.filter($"rk" === 1).select($"m".as("lo"))))
      .crossJoin(broadcast(ranked.filter($"rk" === 39).select($"m".as("hi"))))
      .select($"n_events",
        round($"sx".cast("double") / $"n_events", 6).as("mean"),
        $"lo".cast("double").as("ci_lo"), $"hi".cast("double").as("ci_hi"),
        round(sqrt(($"smm".cast("double")
          - $"sm".cast("double") * $"sm".cast("double") / $"bn")
          / ($"bn" - 1L)), 6).as("se_boot"),
        $"bn".as("b_replicates"))
  }

  val bootstrapCiSql: String =
    """WITH base AS (
      |  SELECT event_id, CAST(round(value, 4) AS DECIMAL(14,4)) AS x
      |  FROM events WHERE event_type = 'purchase'),
      |rep AS (
      |  SELECT event_id, x, b
      |  FROM base CROSS JOIN (SELECT unnest(range(1, 41)) AS b)),
      |wgt AS (
      |  SELECT b, x,
      |    CASE WHEN h2 <= 93 THEN 0 WHEN h2 <= 187 THEN 1
      |      WHEN h2 <= 234 THEN 2 WHEN h2 <= 250 THEN 3
      |      WHEN h2 <= 254 THEN 4 ELSE 5 END AS w
      |  FROM (SELECT b, x,
      |    list_reduce(list_transform(
      |      split(substr(md5('bs:' || CAST(b AS VARCHAR) || ':'
      |        || CAST(event_id AS VARCHAR)), 1, 2), ''),
      |      c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)),
      |      (a, c) -> a * 16 + c) AS h2
      |  FROM rep)),
      |reps AS MATERIALIZED (
      |  SELECT b, CAST(round(CAST(sum(w * x) AS DOUBLE) / sum(w), 6)
      |    AS DECIMAL(16,6)) AS m
      |  FROM wgt GROUP BY b),
      |ranked AS (SELECT m, row_number() OVER (ORDER BY m, b) AS rk FROM reps),
      |st AS (
      |  SELECT CAST(sum(m) AS DOUBLE) AS sm, CAST(sum(m * m) AS DOUBLE) AS smm,
      |    CAST(count(*) AS BIGINT) AS bn
      |  FROM reps),
      |pt AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_events, CAST(sum(x) AS DOUBLE) AS sx
      |  FROM base)
      |SELECT n_events, round(sx / n_events, 6) AS mean,
      |  CAST((SELECT m FROM ranked WHERE rk = 1) AS DOUBLE) AS ci_lo,
      |  CAST((SELECT m FROM ranked WHERE rk = 39) AS DOUBLE) AS ci_hi,
      |  round(sqrt((smm - sm * sm / bn) / (bn - 1)), 6) AS se_boot,
      |  bn AS b_replicates
      |FROM pt CROSS JOIN st""".stripMargin

  val leveneTestSql: String =
    """WITH m AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(CAST(round(value, 4) AS DECIMAL(14,4))) AS DOUBLE) AS sx
      |  FROM events GROUP BY event_type),
      |m6 AS (SELECT event_type, round(sx / n, 6) AS mean6 FROM m),
      |z AS (
      |  SELECT e.event_type,
      |    CAST(round(abs(round(e.value, 4) - m6.mean6), 6)
      |      AS DECIMAL(16,6)) AS z
      |  FROM events e JOIN m6 ON m6.event_type = e.event_type),
      |g AS (
      |  SELECT n, sz, szz,
      |    CAST(round(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / n * 1e6, 0)
      |      AS BIGINT) AS ai
      |  FROM (SELECT count(*) AS n, sum(z) AS sz, sum(z * z) AS szz
      |        FROM z GROUP BY event_type)),
      |t AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
      |    CAST(sum(sz) AS DOUBLE) AS szsum, CAST(sum(szz) AS DOUBLE) AS szzsum,
      |    CAST(sum(ai) AS DOUBLE) / 1e6 AS ad
      |  FROM g)
      |SELECT k AS k_groups, nn AS n_total,
      |  round(ad - szsum * szsum / nn, 6) AS ss_between,
      |  round(szzsum - ad, 6) AS ss_within,
      |  round(((ad - szsum * szsum / nn) / (k - 1))
      |    / ((szzsum - ad) / (nn - k)), 6) AS f_stat
      |FROM t""".stripMargin

  // ------------------------------------------------------------------
  // ab_srm_check — sample-ratio-mismatch guard on the experiment split
  // ------------------------------------------------------------------

  /** Sample-ratio-mismatch check — the first gate every A/B readout
    * must pass (Kohavi's "trustworthy experiments" rule: a biased
    * assignment invalidates EVERY downstream metric before any t-test
    * runs): users are deterministically split 50/50 by an md5 coin
    * (the dp_release seeding discipline), and the 1-df chi-square of
    * the observed counts against the designed ratio is compared to
    * the 95% bar (3.841459). For a binary equal split the statistic
    * reduces to (nA−nB)²/(nA+nB) — computed on the exact-integer
    * micro grid, so the alarm bit is bit-stable cross-engine.
    *
    * Scale: one distinct over the assignment unit, one 2-group
    * aggregate, one output row.
    */
  def abSrmCheck(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val arm = conv(substring(md5(concat(lit("srm:"),
      $"user_id".cast("string"))), 1, 8), 16, 10).cast("long") % 2
    val counts = Tables.events(spark, dir)
      .select($"user_id").distinct()
      .select(arm.as("arm"))
      .groupBy($"arm").agg(count(lit(1)).as("n"))
    val a = counts.filter($"arm" === 0).select($"n".as("n_a"))
    val b = counts.filter($"arm" === 1).select($"n".as("n_b"))
    a.crossJoin(b)
      .withColumn("chi2_micro",
        expr("(n_a - n_b) * (n_a - n_b) * 1000000 DIV (n_a + n_b)"))
      .select($"n_a", $"n_b", $"chi2_micro",
        round($"chi2_micro".cast("double") / 1e6, 6).as("chi2"),
        ($"chi2_micro" > 3841459L).as("srm_alarm"))
  }

  val abSrmCheckSql: String =
    """WITH u AS (
      |  SELECT DISTINCT user_id FROM events),
      |arms AS (
      |  SELECT CAST(('0x' || substr(md5('srm:' || CAST(user_id AS VARCHAR)),
      |      1, 8)) AS BIGINT) % 2 AS arm
      |  FROM u),
      |c AS (SELECT arm, CAST(count(*) AS BIGINT) AS n FROM arms GROUP BY 1),
      |j AS (
      |  SELECT (SELECT n FROM c WHERE arm = 0) AS n_a,
      |    (SELECT n FROM c WHERE arm = 1) AS n_b)
      |SELECT n_a, n_b,
      |  (n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b) AS chi2_micro,
      |  round(CAST((n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b)
      |    AS DOUBLE) / 1e6, 6) AS chi2,
      |  (n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b) > 3841459
      |    AS srm_alarm
      |FROM j""".stripMargin
}
