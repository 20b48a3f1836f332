package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftExpressionBridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, ArrayType}

/** Native Catalyst expressions for the embedding hot paths.
  *
  * The composable alternative (`aggregate(zip_with(...))`) is a
  * higher-order function: Spark evaluates those interpreted, allocating
  * a lambda frame per element — the dominant cost in ANN scans. These
  * expressions generate a tight primitive loop via `doGenCode`, so the
  * per-pair work is a single fused dot-product loop inside whole-stage
  * codegen. Results are bit-identical to the fold form (same
  * left-to-right double accumulation).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot expects array<float> inputs, got ${left.dataType} / ${right.dataType}")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object VectorFunctions {
  /** dot(a, b) over array<float> columns — codegen'd primitive loop. */
  def vec_dot(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpression(a), toExpression(b)))

  /** L2 norm via the same native loop. */
  def vec_norm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(vec_dot(a, a))
  }

  /** cosine = dot / (normA * normB) — pass precomputed norms on hot paths. */
  def vec_cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / vec_norm(a) / vec_norm(b)

  /** Hash-signed random projection to `outDims` micro-unit sums. */
  def rp_project(a: Column, outDims: Int): Column =
    toColumn(RpProject(toExpression(a), outDims))
}

/** Shared kernel for [[RpProject]] — interpreted eval and codegen call
  * the same static method, so results are identical by construction.
  */
object RpImpl {
  /** Spark `cast(round(x, 0) as bigint)` semantics, exactly: Round on
    * DoubleType goes through BigDecimal HALF_UP, the cast truncates.
    */
  private def quant(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  /** proj(j) = Σ_i round(v_i·10⁶) · s(i,j) with the LCG-parity sign
    * s(i,j) = ±1 over the COMBINED cell index i·outDims + j —
    * bit-identical to the HOF fold it replaces, but the quantization
    * runs ONCE per component instead of once per (i, j).
    *
    * Why the CUBE-mod sign: any sign LINEAR in the cell index —
    * including bit-k of an LCG over it — leaves adjacent output dims
    * with near-identical sign vectors (measured pairwise agreement up
    * to 63/64: a rank-1 projection, ANN recall at chance, 0.025).
    * Per-dim balance checks cannot see this; the property that matters
    * is CROSS-DIM decorrelation. s(i,j) = parity of
    * ((i·outDims + j + 17)³ mod 1000003) is nonlinear in the index,
    * measured balanced (29–37 of 64 positive per dim) AND decorrelated
    * (pairwise agreement 23–42 of 64), and every intermediate stays
    * below 2³¹ — exactly expressible in DuckDB BIGINT arithmetic,
    * which ERRORS on 64-bit overflow (splitmix-style avalanche mixing
    * is not portable there). Both properties pinned in RpHitsSpec.
    */
  def project(v: ArrayData, outDims: Int): ArrayData = {
    val d = v.numElements()
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      q(i) = quant(v.getFloat(i).toDouble * 1000000.0)
      i += 1
    }
    val out = new Array[Long](outDims)
    var j = 0
    while (j < outDims) {
      var acc = 0L
      i = 0
      while (i < d) {
        val x = i.toLong * outDims + j.toLong + 17L
        acc += (if (x * x * x % 1000003L % 2L == 0L) q(i) else -q(i))
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `rp_project(vec)` → array<long> of LCG-signed random-projection
  * micro-sums. The HOF formulation (`transform` × `aggregate`) is
  * CodegenFallback — an interpreted lambda frame per (i, j) term, and
  * it re-rounds every component once per output dim; this kernel is
  * one static call inside whole-stage codegen with one quantization
  * pass (same integers, ~64× less rounding work).
  */
case class RpProject(child: Expression, outDims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "rp_project"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rp_project expects array<float>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    RpImpl.project(v.asInstanceOf[ArrayData], outDims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.RpImpl.project($v, $outDims);")

  override protected def withNewChildInternal(newChild: Expression): RpProject =
    copy(child = newChild)
}
