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
}
