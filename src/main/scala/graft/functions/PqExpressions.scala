package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftExpressionBridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Product-quantization kernels shared by interpreted eval and codegen.
  *
  * The composable formulation (`greatest` over M×K `vec_dot` structs
  * with literal centroids) expands to ~256 dot-product terms in ONE
  * generated method, overflowing janino's 64 KB method limit — Spark
  * then silently drops the whole stage to interpreted execution, and
  * the stage it drops is the corpus-side encode map, the one pass that
  * touches every row at 100 TB. These kernels keep the generated code
  * at a single static call (the [[JaroWinklerImpl]] pattern); the
  * codebooks travel as plan references, not literals.
  *
  * Arithmetic contract (bit-identical to the expanded form it
  * replaces): per-subspace scores accumulate `(double)v_f * (double)c_f`
  * left-to-right over the subvector exactly like [[DotProduct]];
  * `encode` ties resolve to the HIGHEST code index (the `greatest`
  * struct-comparison semantics); `distTable` rows evaluate
  * `(qq - 2.0*qc) + |c|²` in that order. Centroid norms are
  * precomputed once per plan with the same `x.toDouble * x` summation
  * the literal expansion used.
  */
object PqImpl {

  /** codes(s) = argmax_c (v_s · books(s)(c) − |books(s)(c)|²/2); ties
    * take the larger c, matching `greatest(struct(score, idx)).i`.
    */
  def encode(v: ArrayData, books: Array[Array[Array[Float]]],
             halfNorms: Array[Array[Double]]): ArrayData = {
    val m = books.length
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val sub = books(s)
      val subDim = sub(0).length
      val off = s * subDim
      var best = Double.NegativeInfinity
      var bestI = 0
      var i = 0
      while (i < sub.length) {
        val c = sub(i)
        var acc = 0.0
        var d = 0
        while (d < subDim) {
          acc += v.getFloat(off + d).toDouble * c(d).toDouble
          d += 1
        }
        val score = acc - halfNorms(s)(i)
        if (score >= best) { best = score; bestI = i }
        i += 1
      }
      codes(s) = bestI
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** out(d) = v(d) − centroids(cluster)(d), float arithmetic. */
  def residual(v: ArrayData, cluster: Int,
               centroids: Array[Array[Float]]): ArrayData = {
    val c = centroids(cluster)
    val out = new Array[Float](c.length)
    var d = 0
    while (d < c.length) {
      out(d) = v.getFloat(d) - c(d)
      d += 1
    }
    new GenericArrayData(out)
  }

  /** Exact-integer variant of [[encode]] over micro-unit long vectors:
    * codes(s) = argmin_c Σ_d (v_d − books(s)(c)(d))², ties to the
    * SMALLEST code index (the `row_number ORDER BY d2, code` oracle
    * convention — note this differs from the float path's
    * largest-index `greatest` ties). All arithmetic is Long and exact,
    * so the DuckDB oracle replays every code bit-identically. */
  def encodeL(v: ArrayData, books: Array[Array[Array[Long]]]): ArrayData = {
    val m = books.length
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val sub = books(s)
      val subDim = sub(0).length
      val off = s * subDim
      var best = Long.MaxValue
      var bestI = 0
      var i = 0
      while (i < sub.length) {
        val c = sub(i)
        var acc = 0L
        var d = 0
        while (d < subDim) {
          val diff = v.getLong(off + d) - c(d)
          acc += diff * diff
          d += 1
        }
        if (acc < best) { best = acc; bestI = i }
        i += 1
      }
      codes(s) = bestI
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** Exact-integer residual: out(d) = v(d) − centroids(cluster)(d). */
  def residualL(v: ArrayData, cluster: Int,
                centroids: Array[Array[Long]]): ArrayData = {
    val c = centroids(cluster)
    val out = new Array[Long](c.length)
    var d = 0
    while (d < c.length) {
      out(d) = v.getLong(d) - c(d)
      d += 1
    }
    new GenericArrayData(out)
  }

  /** Exact-integer distance table: dtab(s)(c) = Σ_d (q_d − c_d)² as
    * Long — no qq−2qc+cc expansion needed, the direct sum is exact. */
  def distTableL(q: ArrayData, books: Array[Array[Array[Long]]]): ArrayData = {
    val m = books.length
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val sub = books(s)
      val subDim = sub(0).length
      val off = s * subDim
      val row = new Array[Long](sub.length)
      var i = 0
      while (i < sub.length) {
        val c = sub(i)
        var acc = 0L
        var d = 0
        while (d < subDim) {
          val diff = q.getLong(off + d) - c(d)
          acc += diff * diff
          d += 1
        }
        row(i) = acc
        i += 1
      }
      out(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Exact-integer dot product over micro-unit long vectors (squared
    * norm = dotL(v, v)); Long accumulation, overflow-free for
    * |component| ≤ ~1.2e7 at 64 dims. */
  def dotL(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** dtab(s)(c) = |q_s − books(s)(c)|² expanded as qq − 2·(q_s·c) + |c|². */
  def distTable(q: ArrayData, books: Array[Array[Array[Float]]],
                norms: Array[Array[Double]]): ArrayData = {
    val m = books.length
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val sub = books(s)
      val subDim = sub(0).length
      val off = s * subDim
      var qq = 0.0
      var d = 0
      while (d < subDim) {
        val x = q.getFloat(off + d).toDouble
        qq += x * x
        d += 1
      }
      val row = new Array[Double](sub.length)
      var i = 0
      while (i < sub.length) {
        val c = sub(i)
        var qc = 0.0
        d = 0
        while (d < subDim) {
          qc += q.getFloat(off + d).toDouble * c(d).toDouble
          d += 1
        }
        row(i) = qq - 2.0 * qc + norms(s)(i)
        i += 1
      }
      out(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** `pq_encode(vec)` → array<int> of M per-subspace code indices. */
case class PqEncode(child: Expression, books: Array[Array[Array[Float]]])
    extends UnaryExpression with Serializable {

  @transient private lazy val halfNorms: Array[Array[Double]] =
    books.map(_.map(c => c.map(x => x.toDouble * x).sum / 2.0))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects array<float>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    PqImpl.encode(v.asInstanceOf[ArrayData], books, halfNorms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("pqBooks", books, "float[][][]")
    val h = ctx.addReferenceObj("pqHalfNorms", halfNorms, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqImpl.encode($v, $b, $h);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_dist_table(qvec)` → array<array<double>> of per-subspace squared
  * L2 distances from the query subvector to every codebook centroid.
  */
case class PqDistTable(child: Expression, books: Array[Array[Array[Float]]])
    extends UnaryExpression with Serializable {

  @transient private lazy val norms: Array[Array[Double]] =
    books.map(_.map(c => c.map(x => x.toDouble * x).sum))

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_dist_table"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_dist_table expects array<float>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    PqImpl.distTable(v.asInstanceOf[ArrayData], books, norms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("pqBooks", books, "float[][][]")
    val n = ctx.addReferenceObj("pqNorms", norms, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqImpl.distTable($v, $b, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistTable =
    copy(child = newChild)
}

/** `vec_centroid_residual(vec, cluster)` → array<float> of
  * vec − centroids(cluster), elementwise in FLOAT arithmetic (the same
  * IEEE op as the `zip_with((a, b) => a - b)` formulation it replaces —
  * which, being a higher-order function, evaluated interpreted with a
  * lambda frame per element on EVERY corpus row of the IVF-PQ encode
  * path). One static call; stays inside whole-stage codegen.
  */
case class VecCentroidResidual(left: Expression, right: Expression,
                               centroids: Array[Array[Float]])
    extends BinaryExpression with Serializable {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "vec_centroid_residual"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_centroid_residual expects (array<float>, int), got $other")
    }

  override def nullSafeEval(v: Any, c: Any): Any =
    PqImpl.residual(v.asInstanceOf[ArrayData], c.asInstanceOf[Int], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("residualCentroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.PqImpl.residual($v, $c, $cents);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCentroidResidual =
    copy(left = newLeft, right = newRight)
}

/** `pq_encode_l(vec)` — exact-integer encode over micro-unit
  * array<long> vectors (argmin L2, ties to smallest code). */
case class PqEncodeL(child: Expression, books: Array[Array[Array[Long]]])
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode_l"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode_l expects array<bigint>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    PqImpl.encodeL(v.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("pqBooksL", books, "long[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqImpl.encodeL($v, $b);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeL =
    copy(child = newChild)
}

/** `pq_dist_table_l(qvec)` — exact-integer per-subspace squared-L2
  * distance table (array<array<bigint>>). */
case class PqDistTableL(child: Expression, books: Array[Array[Array[Long]]])
    extends UnaryExpression with Serializable {

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_dist_table_l"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_dist_table_l expects array<bigint>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    PqImpl.distTableL(v.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("pqBooksL", books, "long[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqImpl.distTableL($v, $b);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistTableL =
    copy(child = newChild)
}

/** `vec_centroid_residual_l(vec, cluster)` — exact-integer residual. */
case class VecCentroidResidualL(left: Expression, right: Expression,
                                centroids: Array[Array[Long]])
    extends BinaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_centroid_residual_l"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_centroid_residual_l expects (array<bigint>, int), got $other")
    }

  override def nullSafeEval(v: Any, c: Any): Any =
    PqImpl.residualL(v.asInstanceOf[ArrayData], c.asInstanceOf[Int], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("residualCentroidsL", centroids, "long[][]")
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.PqImpl.residualL($v, $c, $cents);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCentroidResidualL =
    copy(left = newLeft, right = newRight)
}

/** `vec_dot_l(a, b)` — exact-integer dot product of two micro-unit
  * array<long> vectors; one static call, stays in whole-stage codegen
  * (the candidate-scoring map of the exact ANN family touches every
  * probed corpus row — same hot-path argument as [[PqEncode]]). */
case class VecDotL(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_l"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot_l expects (array<bigint>, array<bigint>), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    PqImpl.dotL(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.PqImpl.dotL($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotL =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  def pq_encode(vec: Column, books: Array[Array[Array[Float]]]): Column =
    toColumn(PqEncode(toExpression(vec), books))

  def pq_dist_table(qvec: Column, books: Array[Array[Array[Float]]]): Column =
    toColumn(PqDistTable(toExpression(qvec), books))

  def vec_centroid_residual(vec: Column, cluster: Column,
                            centroids: Array[Array[Float]]): Column =
    toColumn(VecCentroidResidual(toExpression(vec), toExpression(cluster), centroids))

  def pq_encode_l(vec: Column, books: Array[Array[Array[Long]]]): Column =
    toColumn(PqEncodeL(toExpression(vec), books))

  def pq_dist_table_l(qvec: Column, books: Array[Array[Array[Long]]]): Column =
    toColumn(PqDistTableL(toExpression(qvec), books))

  def vec_centroid_residual_l(vec: Column, cluster: Column,
                              centroids: Array[Array[Long]]): Column =
    toColumn(VecCentroidResidualL(toExpression(vec), toExpression(cluster), centroids))

  def vec_dot_l(a: Column, b: Column): Column =
    toColumn(VecDotL(toExpression(a), toExpression(b)))
}
