package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, MinHashSig, SimHash64}

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
  }
}
