package graft

import graft.operators.{Behavior, Profile}
import org.apache.spark.sql.functions._

/** Semantic checks for the round-4 statistics batch (anomaly_mad,
  * mutual_info, survival_retention) beyond the DuckDB hash gate.
  */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("anomaly_mad: breakdown resistance — flags survive a planted heavy tail " +
    "that drags the mean/std detector") {
    val rows = Profile.anomalyMad(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_outliers") > 0,
        s"${r.getString(0)}: MAD detector vacuous (no outliers flagged)")
      assert(r.getAs[Double]("mad") > 0, "degenerate MAD")
      val frac = r.getAs[Double]("outlier_frac")
      assert(frac > 0 && frac < 0.25, s"implausible outlier fraction $frac")
    }
    // robustness property on a planted set: one extreme point moves the
    // mean-based z flags, not the MAD flags
    val base = (1 to 99).map(i => ("g", (i % 10 + 10).toDouble)) :+ (("g", 1e6))
    val df = base.toDF("g", "v")
      .select(round($"v" * 10000, 0).cast("long").as("xc"))
    val m2 = df.agg((expr("percentile(xc, 0.5)") * 2).cast("long")).first().getLong(0)
    val mad4 = df.select(abs($"xc" * 2 - m2).as("dev2"))
      .agg((expr("percentile(dev2, 0.5)") * 2).cast("long")).first().getLong(0)
    val flagged = df.select(abs($"xc" * 2 - m2).as("dev2"))
      .filter($"dev2" * 1349 > lit(mad4) * 3500).count()
    assert(flagged === 1, s"MAD flagged $flagged of 100 — the single planted outlier")
  }

  test("mutual_info: contributions sum to the __total rollup exactly " +
    "and MI is nonnegative") {
    val rows = Behavior.mutualInfo(spark, sf).collect()
    val total = rows.filter(_.getString(0) == "__total")
    assert(total.length === 1)
    val parts = rows.filterNot(_.getString(0) == "__total")
    assert(parts.map(_.getAs[Long]("term_sum")).sum ===
      total.head.getAs[Long]("term_sum"),
      "per-type term sums must add to the rollup total (exact integers)")
    assert(parts.map(_.getAs[Long]("n_x")).sum === total.head.getAs[Long]("n_x"))
    // MI of the full pair is >= 0 up to quantization slack (each cell
    // term is quantized to micro-units before summation)
    assert(total.head.getAs[Double]("mi_nats") >= -1e-5,
      "mutual information must be nonnegative")
  }

  test("ks_test: D bounds, self-test is zero, and a planted shape shift is caught " +
    "where the t-test is blind") {
    val r = Behavior.ksTest(spark, sf).first()
    val d = r.getAs[Double]("ks_d")
    assert(d >= 0 && d <= 1, s"KS D out of range: $d")
    // same group twice → identical ECDFs → D = 0
    val self = Behavior.ksTest(spark, sf, "purchase", "purchase").first()
    assert(self.getAs[Double]("ks_d") === 0.0)
    assert(!self.getAs[Boolean]("significant_95"))
    // planted: same mean, doubled spread — mean-based tests see nothing,
    // KS must reject. ECDF cross-multiplication replayed locally.
    val a = (1 to 2000).map(i => 100.0 + (i % 21) - 10)     // mean 100, ±10
    val b = (1 to 2000).map(i => 100.0 + 2 * ((i % 21) - 10)) // mean 100, ±20
    def ecdf(xs: Seq[Double]) = xs.groupBy(identity).view.mapValues(_.size).toMap
    val (ea, eb) = (ecdf(a), ecdf(b))
    val grid = (ea.keySet ++ eb.keySet).toSeq.sorted
    var (ca, cb, best) = (0L, 0L, 0L)
    grid.foreach { v =>
      ca += ea.getOrElse(v, 0).toLong; cb += eb.getOrElse(v, 0).toLong
      best = math.max(best, math.abs(ca * 2000L - cb * 2000L))
    }
    val dPlanted = best.toDouble / (2000L * 2000L)
    val thresh = 1.358 * math.sqrt(4000.0 / (2000.0 * 2000.0))
    assert(dPlanted > thresh,
      s"planted variance shift must exceed the KS threshold ($dPlanted vs $thresh)")
  }

  test("rfm_migration: every before-tier row is a probability distribution " +
    "and totals match customers active in both halves") {
    val rows = Behavior.rfmMigration(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    rows.groupBy(_.getString(0)).foreach { case (tier, rs) =>
      val share = rs.map(_.getAs[Double]("share")).sum
      assert(math.abs(share - 1.0) < 1e-4, s"$tier shares sum to $share")
    }
    val matrixTotal = rows.map(_.getAs[Long]("n")).sum
    assert(matrixTotal > 0, "no customer active in both halves — vacuous split")
  }

  test("survival_retention: KM curve is monotone nonincreasing, at-risk counts " +
    "decrease, and survival matches the exact accumulator") {
    val rows = Behavior.survivalRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    val surv = rows.map(_.getAs[Double]("survival"))
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-12 },
      "KM survival must be nonincreasing in time")
    val risk = rows.map(_.getAs[Long]("n_risk"))
    assert(risk.zip(risk.tail).forall { case (a, b) => b < a },
      "at-risk count must strictly decrease across event months")
    rows.foreach { r =>
      assert(r.getAs[Long]("d_churned") > 0, "only event months are emitted")
      val fromAcc = math.exp(r.getAs[Long]("cum_ln_nano") / 1e9)
      assert(math.abs(fromAcc - r.getAs[Double]("survival")) < 1e-6,
        "display survival must derive from the exact accumulator")
    }
  }
}
