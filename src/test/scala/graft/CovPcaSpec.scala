package graft

import graft.operators.Embeddings
import org.apache.spark.sql.functions._

/** Semantics of the native second-moment aggregate and the PCA built on
  * it: the one-pass O(d²)-state result must equal the explicit fan-out
  * formulation under any partitioning, and the power iteration must
  * return a genuine eigenpair of the covariance it consumed.
  */
class CovPcaSpec extends SparkSpec {
  import spark.implicits._

  test("vec_cov_sum equals the posexplode² formulation under adversarial partitioning") {
    val cov = Embeddings.embeddingCovariance(spark, sf)
      .withColumnRenamed("cov", "cov_agg")
    // explicit fan-out reference: quantize, explode twice, integer sums
    val q = graft.sources.Tables.embeddings(spark, sf)
      .repartition(7) // partitioning must not change a merged exact sum
      .select($"vec_id",
        posexplode(transform($"embedding",
          v => round(v.cast("double") * 10000d, 0).cast("long"))).as(Seq("i", "qv")))
    val ref = q.as("a").join(q.as("b"), $"a.vec_id" === $"b.vec_id" && $"a.i" <= $"b.i")
      .groupBy($"a.i".as("i"), $"b.i".as("j"))
      .agg(count(lit(1)).as("n"),
        sum($"a.qv" * $"b.qv").as("s_ij"), sum($"a.qv").as("s_i"), sum($"b.qv").as("s_j"))
      .select($"i", $"j",
        (($"n" * $"s_ij" - $"s_i" * $"s_j").cast("double")
          / ($"n".cast("double") * $"n".cast("double") * lit(1e8))).as("cov_ref"))
    val joined = cov.join(ref, Seq("i", "j")).cache()
    assert(joined.count() == 64 * 65 / 2)
    assert(joined.filter($"cov_agg" =!= $"cov_ref").count() == 0,
      "one-pass aggregate must be bit-identical to the fan-out formulation")
  }

  test("pca_power returns an eigenpair: ||A·v − λ·v|| is tiny and explained_frac is sane") {
    val cov = Embeddings.embeddingCovariance(spark, sf).collect()
    val d = 64
    val a = Array.ofDim[Double](d, d)
    cov.foreach { r =>
      a(r.getInt(0))(r.getInt(1)) = r.getDouble(3)
      a(r.getInt(1))(r.getInt(0)) = r.getDouble(3)
    }
    val p = Embeddings.pcaPower(spark, sf).orderBy($"dim").collect()
    val v = p.map(_.getDouble(1))
    val lambda = p.head.getDouble(2)
    // components are 6dp-rounded from the 10⁷ integer grid (the
    // oracle-exact round-10 formulation), so unit norm holds to the
    // rounding mass ~√d·10⁻⁶, not machine epsilon
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-4, "v must be unit")
    val av = (0 until d).map(i => (0 until d).map(j => a(i)(j) * v(j)).sum)
    val resid = math.sqrt((0 until d).map(i => math.pow(av(i) - lambda * v(i), 2)).sum)
    assert(resid < 1e-3 * lambda, s"eigen residual $resid vs lambda $lambda")
    val expl = p.head.getDouble(3)
    assert(expl > 1.0 / d && expl < 0.5, s"explained_frac $expl out of sane range")
  }
}
