package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BandBuckets, DotProduct, MinHashSig, ShingleHash3, SigAgree, SimHash64, TokenHashes}

/** SparkSessionExtensions entry point: exposes graft's native
  * expressions to SQL users.
  *
  * ```
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT vec_dot(a.embedding, b.embedding) FROM ...")
  * ```
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float vectors"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(hashes) - 64-value minhash signature"),
      (args: Seq[Expression]) => MinHashSig(args.head)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit simhash"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    ext.injectFunction((FunctionIdentifier("shingle_hash3"),
      info("shingle_hash3", "shingle_hash3(hashes) - 3-gram shingle hashes"),
      (args: Seq[Expression]) => ShingleHash3(args.head)))
    ext.injectFunction((FunctionIdentifier("token_hash32"),
      info("token_hash32", "token_hash32(text) - 32-bit per-token hashes"),
      (args: Seq[Expression]) => TokenHashes(args.head, wide = false)))
    ext.injectFunction((FunctionIdentifier("token_hash63"),
      info("token_hash63", "token_hash63(text) - 63-bit per-token hashes"),
      (args: Seq[Expression]) => TokenHashes(args.head, wide = true)))
    ext.injectFunction((FunctionIdentifier("band_buckets"),
      info("band_buckets", "band_buckets(sig) - 16 LSH band bucket keys"),
      (args: Seq[Expression]) => BandBuckets(args.head)))
    ext.injectFunction((FunctionIdentifier("sig_agree"),
      info("sig_agree", "sig_agree(a, b) - count of agreeing signature rows"),
      (args: Seq[Expression]) => SigAgree(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity"),
      (args: Seq[Expression]) => graft.functions.JaroWinkler(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("char_entropy_stats"),
      info("char_entropy_stats", "char_entropy_stats(text) - one-pass char entropy stats"),
      (args: Seq[Expression]) => graft.functions.CharEntropyStats(args.head)))
    ext.injectFunction((FunctionIdentifier("top_k_by"),
      info("top_k_by", "top_k_by(score, payload, k) - bounded top-k aggregate"),
      (args: Seq[Expression]) => graft.functions.TopKBy(args(0), args(1),
        args(2).eval().asInstanceOf[Number].intValue()).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("space_saving"),
      info("space_saving", "space_saving(item, m) - Misra-Gries frequent-items sketch"),
      (args: Seq[Expression]) => graft.functions.SpaceSavingAgg(args(0),
        args(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("vec_cov_sum"),
      info("vec_cov_sum", "vec_cov_sum(qvec) - exact vector second-moment sums"),
      (args: Seq[Expression]) => graft.functions.VecCovSum(args.head)
        .toAggregateExpression()))
    // Spark's internal bloom expressions, surfaced for explicit
    // pre-pass filters (the dedup definite-unique skip in SQL form)
    ext.injectFunction((FunctionIdentifier("bloom_agg"),
      info("bloom_agg", "bloom_agg(item, n) - bloom filter of long items sized for n"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1).eval().asInstanceOf[Number].longValue())
          .toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain",
        "bloom_might_contain(bloom, item) - membership probe, no false negatives"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("token_stats"),
      info("token_stats",
        "token_stats(text, stopwords_csv) - one-pass per-token rule statistics"),
      (args: Seq[Expression]) => graft.functions.TokenStats(args(0),
        args(1).eval().toString.split(",").toSeq)))
    ext.injectFunction((FunctionIdentifier("rp_project"),
      info("rp_project",
        "rp_project(vec, dims) - hash-signed JL random projection to integer micro-sums"),
      (args: Seq[Expression]) => graft.functions.RpProject(args(0),
        args(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash",
        "rolling_hash(text) - base-31 mod 1e9+7 Rabin-Karp code-point fingerprint"),
      (args: Seq[Expression]) => graft.functions.RollingHash(args.head)))
  }
}

/** Registration for an already-built session (tests, notebooks). */
object GraftExtensions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      (args: Seq[Expression]) => DotProduct(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      (args: Seq[Expression]) => MinHashSig(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      (args: Seq[Expression]) => SimHash64(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("shingle_hash3",
      (args: Seq[Expression]) => ShingleHash3(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("token_hash32",
      (args: Seq[Expression]) => TokenHashes(args.head, wide = false), "scala_udf")
    reg.createOrReplaceTempFunction("token_hash63",
      (args: Seq[Expression]) => TokenHashes(args.head, wide = true), "scala_udf")
    reg.createOrReplaceTempFunction("band_buckets",
      (args: Seq[Expression]) => BandBuckets(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("sig_agree",
      (args: Seq[Expression]) => SigAgree(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("jaro_winkler",
      (args: Seq[Expression]) => graft.functions.JaroWinkler(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("char_entropy_stats",
      (args: Seq[Expression]) => graft.functions.CharEntropyStats(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("top_k_by",
      (args: Seq[Expression]) => graft.functions.TopKBy(args(0), args(1),
        args(2).eval().asInstanceOf[Number].intValue()).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("space_saving",
      (args: Seq[Expression]) => graft.functions.SpaceSavingAgg(args(0),
        args(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("vec_cov_sum",
      (args: Seq[Expression]) => graft.functions.VecCovSum(args.head)
        .toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("bloom_agg",
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1).eval().asInstanceOf[Number].longValue())
          .toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("bloom_might_contain",
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("token_stats",
      (args: Seq[Expression]) => graft.functions.TokenStats(args(0),
        args(1).eval().toString.split(",").toSeq), "scala_udf")
    reg.createOrReplaceTempFunction("rp_project",
      (args: Seq[Expression]) => graft.functions.RpProject(args(0),
        args(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("rolling_hash",
      (args: Seq[Expression]) => graft.functions.RollingHash(args.head), "scala_udf")
  }
}
