package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the dedup signature hot paths.
  *
  * The composable forms (`transform(sequence(0,63), i -> array_min(
  * transform(hs, ...)))` and 64 unrolled `aggregate` votes) are
  * higher-order functions, which Spark evaluates interpreted — a lambda
  * frame per element per permutation. At 50k docs that is ~10⁹
  * interpreted steps. These expressions emit one fused primitive loop
  * via `doGenCode` and produce bit-identical signatures.
  */
object MinHashPerms {
  val NumHashes = 64
  // same affine family as the composable form: a odd, 30-bit; b 32-bit
  val A: Array[Long] = Array.tabulate(NumHashes)(s =>
    ((s * 2654435761L + 1) & 0x3FFFFFFFL) | 1L)
  val B: Array[Long] = Array.tabulate(NumHashes)(s =>
    (s * 0x9E3779B9L) & 0xFFFFFFFFL)
}

/** array<long> (32-bit shingle hashes) → array<long> of 64 minhash values. */
case class MinHashSig(child: Expression) extends UnaryExpression with Serializable {
  import MinHashPerms._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig expects array<long>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val mins = Array.fill(NumHashes)(0xFFFFFFFFL)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var s = 0
      while (s < NumHashes) {
        val p = (h * A(s) + B(s)) & 0xFFFFFFFFL
        if (p < mins(s)) mins(s) = p
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", A, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", B, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val p = ctx.freshName("p")
      s"""
         |long[] $mins = new long[${NumHashes}];
         |java.util.Arrays.fill($mins, 4294967295L);
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $s = 0; $s < ${NumHashes}; $s++) {
         |    long $p = ($h * $aRef[$s] + $bRef[$s]) & 4294967295L;
         |    if ($p < $mins[$s]) $mins[$s] = $p;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** array<long> (32-bit token hashes) → array<long> of 3-gram shingle
  * hashes, matching `Dedup.shingleHashesFrom` bit-for-bit: per window
  * fold of (th[i+k]·31(k+1) & M) with ·33 mixing; for <3 tokens, a
  * single rolling fold seeded with 7.
  */
case class ShingleHash3(child: Expression) extends UnaryExpression with Serializable {
  private val M = 0xFFFFFFFFL

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash3"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_hash3 expects array<long>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val n = th.numElements()
    if (n < 3) {
      var acc = 7L
      var i = 0
      while (i < n) { acc = (acc * 33L + th.getLong(i)) & M; i += 1 }
      new GenericArrayData(Array(acc))
    } else {
      val out = new Array[Long](n - 2)
      var i = 0
      while (i < n - 2) {
        val a = (th.getLong(i) * 31L) & M
        val b = (th.getLong(i + 1) * 62L) & M
        val c = (th.getLong(i + 2) * 93L) & M
        out(i) = (((a * 33L + b) & M) * 33L + c) & M
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val cc = ctx.freshName("c")
      s"""
         |int $n = $c.numElements();
         |long[] $out;
         |if ($n < 3) {
         |  long $acc = 7L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc = ($acc * 33L + $c.getLong($i)) & 4294967295L;
         |  }
         |  $out = new long[]{$acc};
         |} else {
         |  $out = new long[$n - 2];
         |  for (int $i = 0; $i < $n - 2; $i++) {
         |    long $a = ($c.getLong($i) * 31L) & 4294967295L;
         |    long $b = ($c.getLong($i + 1) * 62L) & 4294967295L;
         |    long $cc = ($c.getLong($i + 2) * 93L) & 4294967295L;
         |    $out[$i] = ((($a * 33L + $b) & 4294967295L) * 33L + $cc) & 4294967295L;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): ShingleHash3 = copy(child = c)
}

/** array<long> (token hashes) → 64-bit simhash (per-bit majority vote). */
case class SimHash64(child: Expression) extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<long>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $votes = new int[64];
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) { if ($votes[$b] > 0) $sig |= (1L << $b); }
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

object HashFunctions {
  /** Native minhash signature from a shingle-hash array column. */
  def minhash_sig(hs: Column): Column = toColumn(MinHashSig(toExpression(hs)))

  /** Native 64-bit simhash from a token-hash array column. */
  def simhash64(hs: Column): Column = toColumn(SimHash64(toExpression(hs)))

  /** Native 3-gram shingle hashes from a token-hash array column. */
  def shingle_hash3(th: Column): Column = toColumn(ShingleHash3(toExpression(th)))
}
