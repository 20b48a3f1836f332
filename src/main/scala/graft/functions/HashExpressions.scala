package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<long> with non-null elements, got $t")
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
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash3 expects array<long> with non-null elements, got $t")
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
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<long> with non-null elements, got $t")
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

/** Shared tokenize-and-hash loops, called from both the interpreted and
  * the generated code path so the two cannot drift. The hash is a plain
  * codepoint polynomial fold (NOT xxhash64) deliberately: it is exactly
  * reproducible in the DuckDB oracle with `unicode()` + `list_reduce`,
  * which is what lets dedup_minhash/dedup_simhash be hash-checked
  * instead of rows-only. Whitespace = Java regex \s ([ \t\n\x0B\f\r]),
  * matching the composable `split(text, "\\s+")` form.
  */
object TokenHashUtil {
  private val M = 0xFFFFFFFFL

  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  /** 32-bit token hashes: per token, h = fold(7, (h*31 + cp) & M). */
  def tokens32(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val out = new java.util.ArrayList[java.lang.Long]()
    var h = 7L; var in = false; var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i); i += Character.charCount(cp)
      if (isWs(cp)) { if (in) { out.add(h); in = false; h = 7L } }
      else { in = true; h = (h * 31L + cp) & M }
    }
    if (in) out.add(h)
    val arr = new Array[Long](out.size)
    var k = 0; while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }

  /** One xor-shift/multiply avalanche round over a 32-bit value. The
    * multiplier constants are < 2^30 so every product stays < 2^62 —
    * the same arithmetic runs in DuckDB's checked BIGINT without
    * overflow (a plain murmur fmix32 constant would overflow there).
    */
  @inline def mix32(h0: Long, c1: Long, c2: Long): Long = {
    var h = h0
    h ^= h >>> 16; h = (h * c1) & M
    h ^= h >>> 13; h = (h * c2) & M
    h ^= h >>> 16
    h
  }

  /** Combined token-hash finalizers for the two simhash halves: two
    * avalanche rounds each, constants swapped between halves. A raw
    * polynomial fold has weak high-bit avalanche, which on a
    * small-vocabulary corpus collapses simhash discrimination (~10×
    * more hamming≤3 pairs than a 64-bit hash); two mixed rounds restore
    * it to parity with xxhash-class hashes (measured on the test corpus).
    */
  @inline def fin1(h: Long): Long = mix32(mix32(h, 747796405L, 277803737L), 668265263L, 374761393L)
  @inline def fin2(h: Long): Long = mix32(mix32(h, 747796405L, 277803737L), 374761393L, 668265263L)

  /** 63-bit token hashes (for simhash, which needs bit spread past bit
    * 31): h = fin1(fold(7, *31)) + (fin2(fold(13, *37)) & 0x7FFFFFFF)
    * * 2^32. Always non-negative and < 2^63.
    */
  def tokens63(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val out = new java.util.ArrayList[java.lang.Long]()
    var h1 = 7L; var h2 = 13L; var in = false; var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i); i += Character.charCount(cp)
      if (isWs(cp)) {
        if (in) { out.add(fin1(h1) + (fin2(h2) & 0x7FFFFFFFL) * 4294967296L); in = false; h1 = 7L; h2 = 13L }
      } else { in = true; h1 = (h1 * 31L + cp) & M; h2 = (h2 * 37L + cp) & M }
    }
    if (in) out.add(fin1(h1) + (fin2(h2) & 0x7FFFFFFFL) * 4294967296L)
    val arr = new Array[Long](out.size)
    var k = 0; while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }
}

/** string → array<long> of per-token hashes (one fused tokenize+hash
  * pass; wide=false → 32-bit minhash tokens, wide=true → 63-bit simhash
  * tokens). Codegen emits a single static call — no per-token lambda
  * frames, no intermediate token array.
  */
case class TokenHashes(child: Expression, wide: Boolean)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = if (wide) "token_hash63" else "token_hash32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (wide) TokenHashUtil.tokens63(s) else TokenHashUtil.tokens32(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (wide) "tokens63" else "tokens32"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenHashUtil$$.MODULE$$.$m($c);")
  }

  override protected def withNewChildInternal(c: Expression): TokenHashes = copy(child = c)
}

/** array<long> (64-entry minhash signature) → array<long> of 16 LSH band
  * bucket keys. Bucket b folds signature rows 4b..4b+3 with seed b+11:
  * acc = (acc*33 + v) & 0xFFFFFFFF. Plain masked arithmetic so the
  * DuckDB oracle reproduces it with list_reduce over a list slice.
  */
case class BandBuckets(child: Expression) extends UnaryExpression with Serializable {
  import MinHashPerms.NumHashes
  private val NumBands = 16
  private val RowsPerBand = NumHashes / NumBands

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"band_buckets expects array<long> with non-null elements, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val out = new Array[Long](NumBands)
    var b = 0
    while (b < NumBands) {
      var acc = b + 11L
      var k = 0
      while (k < RowsPerBand) {
        acc = (acc * 33L + sig.getLong(b * RowsPerBand + k)) & 0xFFFFFFFFL
        k += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      s"""
         |long[] $out = new long[$NumBands];
         |for (int $b = 0; $b < $NumBands; $b++) {
         |  long $acc = $b + 11L;
         |  for (int $k = 0; $k < $RowsPerBand; $k++) {
         |    $acc = ($acc * 33L + $c.getLong($b * $RowsPerBand + $k)) & 4294967295L;
         |  }
         |  $out[$b] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): BandBuckets = copy(child = c)
}

/** (array<long>, array<long>) → int: count of positions where the two
  * signatures agree (the minhash Jaccard estimator numerator). One
  * primitive loop; replaces `size(filter(zip_with(...)))` which would
  * evaluate interpreted and shuffle nothing but still burn a lambda
  * frame per signature row.
  */
case class SigAgree(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_agree"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, false), ArrayType(LongType, false)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sig_agree expects (array<long>, array<long>) with non-null elements, got ($l, $r)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0; var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
    java.lang.Integer.valueOf(c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigAgree =
    copy(left = l, right = r)
}

/** array<long> (sorted ascending, values in [0, 2³¹)) → array<long> of
  * all C(n,2) ordered pairs packed as a(i)·2³² | a(j) for i < j — the
  * co-occurrence pair generator of the graph family's shared
  * [[graft.operators.Graph]] coPairCounts stage. One primitive loop
  * replaces posexplode + per-element `slice(arr, i+2, n)` (which
  * allocates a sub-array per element), and the single packed long
  * halves the pair exchange's key bytes (one 8-byte key vs two).
  * Unpacking is exact: pa = pp >> 32, pb = pp & 0xFFFFFFFF. Inputs
  * outside [0, 2³¹) throw rather than silently mis-pack (partkeys are
  * small positives at every SF; the doc_chunks-style packing contract).
  */
case class PairPack(child: Expression) extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pair_pack"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pair_pack expects array<long>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    PairPackImpl.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PairPackImpl.compute($c);")

  override protected def withNewChildInternal(c: Expression): PairPack = copy(child = c)
}

object PairPackImpl {
  def compute(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n * (n - 1) / 2)
    var o = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      if (a < 0L || a > 0x7FFFFFFFL)
        throw new IllegalArgumentException(s"pair_pack: value $a outside [0, 2^31)")
      val hi = a << 32
      var j = i + 1
      while (j < n) {
        out(o) = hi | arr.getLong(j)
        o += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** array<long> (sorted ascending, values in [0, 2³¹)) → array of all
  * C(n,3) ordered triples as struct(pp = a(i)·2³²|a(j), pc = a(k)) for
  * i < j < k — [[PairPack]]'s 3-item sibling for the basket_rules_3
  * triple generator. One primitive loop replaces TWO chained
  * posexplode + per-element `slice` stages (each of which allocated a
  * suffix sub-array per element), and the packed antecedent pair cuts
  * the triple aggregate's key from three longs to two (16 vs 24 key
  * bytes on the triple exchange). Unpacking after the aggregate is
  * exact (pa = pp >> 32, pb = pp & 0xFFFFFFFF); out-of-range inputs
  * throw rather than silently mis-pack, matching the pair_pack
  * contract.
  */
case class TriplePack(child: Expression) extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pp", LongType, nullable = false),
      StructField("pc", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "triple_pack"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"triple_pack expects array<long>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    TriplePackImpl.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TriplePackImpl.compute($c);")

  override protected def withNewChildInternal(c: Expression): TriplePack = copy(child = c)
}

object TriplePackImpl {
  def compute(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val m = if (n < 3) 0 else n * (n - 1) * (n - 2) / 6
    val out = new Array[Any](m)
    var o = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      if (a < 0L || a > 0x7FFFFFFFL)
        throw new IllegalArgumentException(s"triple_pack: value $a outside [0, 2^31)")
      val hi = a << 32
      var j = i + 1
      while (j < n) {
        val pp = hi | arr.getLong(j)
        var k = j + 1
        while (k < n) {
          out(o) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](pp, arr.getLong(k)))
          o += 1
          k += 1
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** array<long> (dense `dim`-length count vector) → array<long> of
  * `tables` sign-LSH bucket keys: bucket(t) = Σ_b [Σ_d v(d)·sign(t,b,d)
  * ≥ 0]·2^b — all tables×bits sign sums in ONE primitive pass per row.
  * Replaces a broadcast plane join that fanned every (id, dim, cnt)
  * component row out ×(tables·bits) through two aggregate exchanges.
  * All-integer arithmetic — exact, engine-independent. `signs` is laid
  * out [t][b][d] flattened.
  */
case class SignBuckets(child: Expression, signs: Array[Int],
                       tables: Int, bits: Int, dim: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_buckets expects array<long>, got $t")
  }

  private def compute(v: ArrayData): GenericArrayData = {
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        var s = 0L
        val base = (t * bits + b) * dim
        var d = 0
        while (d < dim) {
          s += v.getLong(d) * signs(base + d)
          d += 1
        }
        if (s >= 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("signBucketSigns", signs, "int[]")
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val bucket = ctx.freshName("bucket")
      s"""
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    long $s = 0L;
         |    int $base = ($t * $bits + $b) * $dim;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $s += $c.getLong($d) * $sRef[$base + $d];
         |    }
         |    if ($s >= 0) $bucket |= (1L << $b);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SignBuckets = copy(child = c)
}

object HashFunctions {
  /** Native minhash signature from a shingle-hash array column. */
  def minhash_sig(hs: Column): Column = toColumn(MinHashSig(toExpression(hs)))

  /** Native packed co-occurrence pairs from a sorted id array. */
  def pair_pack(arr: Column): Column = toColumn(PairPack(toExpression(arr)))

  /** Native packed co-occurrence triples (struct(pp, pc)) from a sorted id array. */
  def triple_pack(arr: Column): Column = toColumn(TriplePack(toExpression(arr)))

  /** Native sign-LSH bucket keys from a dense count vector. */
  def sign_buckets(v: Column, signs: Array[Int], tables: Int, bits: Int, dim: Int): Column =
    toColumn(SignBuckets(toExpression(v), signs, tables, bits, dim))

  /** Native 64-bit simhash from a token-hash array column. */
  def simhash64(hs: Column): Column = toColumn(SimHash64(toExpression(hs)))

  /** Native 3-gram shingle hashes from a token-hash array column. */
  def shingle_hash3(th: Column): Column = toColumn(ShingleHash3(toExpression(th)))

  /** Native fused tokenize+hash: 32-bit per-token hashes. */
  def token_hash32(text: Column): Column = toColumn(TokenHashes(toExpression(text), wide = false))

  /** Native fused tokenize+hash: 63-bit per-token hashes (simhash). */
  def token_hash63(text: Column): Column = toColumn(TokenHashes(toExpression(text), wide = true))

  /** Native LSH band bucket keys from a minhash signature. */
  def band_buckets(sig: Column): Column = toColumn(BandBuckets(toExpression(sig)))

  /** Native signature agreement count (minhash Jaccard numerator). */
  def sig_agree(a: Column, b: Column): Column = toColumn(SigAgree(toExpression(a), toExpression(b)))
}
