package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftExpressionBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity, standard parameters (match window
  * max(|a|,|b|)/2 − 1, prefix scale 0.1 over ≤ 4 chars, boost threshold
  * 0.7). The operation order — (m/l1 + m/l2 + (m−t)/m)/3, then
  * j + ℓ·0.1·(1−j) — mirrors DuckDB's jaro_winkler_similarity exactly,
  * verified bit-identical on probe pairs, so results are oracle-safe
  * without rounding slack.
  */
object JaroWinklerImpl {

  def jaro(a: String, b: String): Double = {
    if (a == b) return 1.0
    val l1 = a.length; val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val win = math.max(l1, l2) / 2 - 1
    val f1 = new Array[Boolean](l1); val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - win); val hi = math.min(i + win + 1, l2)
      var j = lo
      var matched = false
      while (j < hi && !matched) {
        if (!f2(j) && a.charAt(i) == b.charAt(j)) {
          f1(i) = true; f2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    (md / l1 + md / l2 + (md - t) / md) / 3.0
  }

  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    var l = 0
    val n = math.min(4, math.min(a.length, b.length))
    while (l < n && a.charAt(l) == b.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Entry point for both interpreted eval and generated code. */
  def jw(a: UTF8String, b: UTF8String): Double =
    jaroWinkler(a.toString, b.toString)
}

/** jaro_winkler(a, b) — native expression; the generated code is a
  * single static call, so the similarity stays inside whole-stage
  * codegen with no lambda/row allocation per pair.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaro_winkler expects (string, string), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerImpl.jw(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.jw($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** Character-entropy implementation shared by interpreted eval and
  * codegen (the emitted code calls the static method — the expression
  * stays inside whole-stage codegen like [[JaroWinklerImpl]]).
  *
  * Arithmetic contract (must stay bit-identical to the composable
  * explode→quantize→decimal-sum formulation AND its DuckDB oracle):
  * p = (double) c / (double) tot; term = round(−(p·ln p), 9dp HALF_UP);
  * terms summed EXACTLY as 9dp-scaled longs (order-free); entropy =
  * decimal(sum,9).doubleValue / ln 2, rounded 6dp HALF_UP. Counting is
  * by code point, matching Spark substring / DuckDB [] indexing.
  */
object CharEntropyImpl {
  private val Ln2 = 0.6931471805599453

  /** Returns {n_chars, n_distinct_chars, entropy_bits-as-double-bits}
    * packed in a long array (codegen-friendly single return). */
  def compute(s: UTF8String): Array[Long] = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      i += Character.charCount(cp)
      n += 1
    }
    var sumScaled = 0L // Σ round(-p·ln p, 9) in 1e-9 units — exact
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      val p = c.toDouble / n.toDouble
      val term = -(p * math.log(p))
      sumScaled += java.math.BigDecimal.valueOf(term)
        .setScale(9, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()
    }
    val bits = new java.math.BigDecimal(java.math.BigInteger.valueOf(sumScaled), 9)
      .doubleValue() / Ln2
    val rounded = java.math.BigDecimal.valueOf(bits)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    Array(n, counts.size.toLong, java.lang.Double.doubleToLongBits(rounded))
  }
}

/** char_entropy_stats(text) → struct(n_chars, n_distinct_chars,
  * entropy_bits): the one-pass native form of the explode→aggregate
  * entropy pipeline — a pure map over the scan (no char fan-out, no
  * shuffles), emitting values bit-identical to the composable form.
  */
case class CharEntropyStats(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct_chars", LongType, nullable = false),
    StructField("entropy_bits", DoubleType, nullable = false)))
  override def prettyName: String = "char_entropy_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_entropy_stats expects a string, got $other")
    }

  private def toRow(a: Array[Long]) =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](a(0), a(1), java.lang.Double.longBitsToDouble(a(2))))

  override def nullSafeEval(s: Any): Any =
    toRow(CharEntropyImpl.compute(s.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val arr = ctx.freshName("ceArr")
      s"""long[] $arr = graft.functions.CharEntropyImpl.compute($a);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $arr[0], $arr[1], Double.longBitsToDouble($arr[2]) });
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharEntropyStats =
    copy(child = newChild)
}

/** Rabin-Karp fingerprint kernel shared by interpreted eval and
  * codegen. Bit-identical to the HOF formulation
  * `aggregate(transform(split(text, ""), ascii), 0L, (a,c) => (a*31+c) % p)`
  * and its DuckDB mirror (`list_reduce` over `unicode(x)`): iteration
  * is by CODE POINT, the accumulator stays < 10⁹+7 so `acc*31 + cp`
  * never leaves the long range, and the empty string folds to 0 both
  * ways (no iterations here; a single ascii('')=0 step there — same
  * result). The HOF chain is CodegenFallback — a per-character lambda
  * frame on a full-corpus scan path — which is exactly the interpreted
  * hot-loop shape the RpProject/TokenStats kernels exist to remove.
  */
object RollingHashImpl {
  private val Mod = 1000000007L

  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}

/** rolling_hash(text) → bigint: one-pass base-31 mod 10⁹+7 polynomial
  * rolling hash over the code points — the native form of the
  * split→transform→aggregate HOF chain (which never enters whole-stage
  * codegen), staying inside the scan's generated loop.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_hash expects a string, got $other")
    }

  override def nullSafeEval(s: Any): Any =
    RollingHashImpl.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RollingHashImpl.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Shared kernel for [[WinnowFps]] — the full winnowing fingerprint
  * pipeline (MOSS, Schleimer et al. 2003) as ONE per-document pass:
  * char k-gram md5-prefix hashes → trailing-w window minima → distinct
  * selected hashes. Bit-identical to the relational formulation it
  * replaces (posexplode(sequence) + md5/conv + trailing-ROWS min window
  * + distinct), which paid one corpus-character-cardinality Exchange +
  * Sort for the window and a second Exchange for the distinct:
  *  - gram hash = unsigned first-4-bytes of md5(utf8(substring(text,
  *    pos, k))), pos 1-based — substring boundaries computed on UTF-8
  *    codepoint starts, exactly Spark's substring/length semantics;
  *  - fp(pos) = min(h[pos-w+1..pos]) for pos ≥ w (first complete
  *    window), matching rowsBetween(-(w-1), 0) + filter(pos ≥ w);
  *  - output = the distinct fp set (ascending; consumers treat it as a
  *    set — the old shape's .distinct() had no defined order either).
  */
object WinnowFpsImpl {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // codepoint start offsets (UTF-8 continuation bytes have 10xxxxxx)
    var nChars = 0
    var i = 0
    while (i < nb) { if ((bytes(i) & 0xC0) != 0x80) nChars += 1; i += 1 }
    val starts = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < nb) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(nChars) = nb
    val nGrams = nChars - k + 1
    if (nGrams < w) return new GenericArrayData(Array.emptyLongArray)
    val d = md5.get()
    val h = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      d.reset()
      d.update(bytes, starts(g), starts(g + k) - starts(g))
      val dig = d.digest()
      h(g) = ((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) |
        ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)
      g += 1
    }
    val set = new java.util.HashSet[java.lang.Long]()
    var pos = w - 1 // 0-based end of the first complete window
    while (pos < nGrams) {
      var mn = h(pos)
      var j = pos - w + 1
      while (j < pos) { if (h(j) < mn) mn = h(j); j += 1 }
      set.add(mn)
      pos += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}

/** `winnow_fps(text, k, w)` → array<long> of the document's distinct
  * winnowing fingerprints — a pure map fused into the scan (no
  * per-character fan-out, no window shuffle+sort, no distinct
  * exchange). */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fps expects a string, got $other")
    }

  override def nullSafeEval(s: Any): Any =
    WinnowFpsImpl.compute(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowFpsImpl.compute($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object StringFunctions {
  def jaro_winkler(a: Column, b: Column): Column =
    toColumn(JaroWinkler(toExpression(a), toExpression(b)))

  def winnow_fps(text: Column, k: Int, w: Int): Column =
    toColumn(WinnowFps(toExpression(text), k, w))

  def char_entropy_stats(text: Column): Column =
    toColumn(CharEntropyStats(toExpression(text)))

  def token_stats(text: Column, stopwords: Seq[String]): Column =
    toColumn(TokenStats(toExpression(text), stopwords))

  def rolling_hash(text: Column): Column =
    toColumn(RollingHash(toExpression(text)))
}

/** Shared kernel for [[TokenStats]] — one pass over the text computing
  * every per-token statistic the rule filters need. Tokenization is
  * bit-compatible with `filter(split(text, "\s+"), _ != "")`: tokens
  * are maximal runs of characters outside Java regex `\s`
  * ([ \t\n\x0B\f\r]), so empty leading fields vanish exactly as the
  * filter drops them.
  */
object TokenStatsImpl {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Returns [n_tokens, sum_len, n_stop, n_uniq, top_cnt]; top_cnt is
    * -1 when no tokens (the caller surfaces SQL NULL, matching
    * `array_max` over an empty distinct list).
    */
  def compute(text: org.apache.spark.unsafe.types.UTF8String,
              stop: java.util.HashSet[String]): Array[Long] = {
    val s = text.toString
    val counts = new java.util.HashMap[String, Int]()
    var nTok = 0L; var sumLen = 0L; var nStop = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        val tok = s.substring(start, i)
        nTok += 1
        sumLen += tok.codePointCount(0, tok.length)
        if (stop.contains(tok)) nStop += 1
        counts.merge(tok, 1, Integer.sum)
      }
    }
    var top = -1L
    if (!counts.isEmpty) {
      top = 0L
      val it = counts.values().iterator()
      while (it.hasNext) { val c = it.next().toLong; if (c > top) top = c }
    }
    Array(nTok, sumLen, nStop, counts.size.toLong, top)
  }
}

/** `token_stats(text)` → struct of the five per-token statistics.
  * The composable form is four separate HOF chains over the same
  * token array (interpreted lambda frames, and the most-frequent-token
  * count is O(distinct·n) re-scans); this is ONE linear pass in a
  * static call inside whole-stage codegen. Results are pinned
  * bit-identical to the HOF chain by spec.
  */
case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with Serializable {

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String]()
    stopwords.foreach(h.add)
    h
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_uniq", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = true)))
  override def prettyName: String = "token_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_stats expects a string, got $other")
    }

  private def toRow(a: Array[Long]) =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](a(0), a(1), a(2), a(3),
        if (a(4) < 0) null else java.lang.Long.valueOf(a(4))))

  override def nullSafeEval(s: Any): Any =
    toRow(TokenStatsImpl.compute(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], stopSet))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopRef = ctx.addReferenceObj("tokenStatsStop", stopSet,
      "java.util.HashSet<String>")
    nullSafeCodeGen(ctx, ev, a => {
      val arr = ctx.freshName("tsArr")
      s"""long[] $arr = graft.functions.TokenStatsImpl.compute($a, $stopRef);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $arr[0], $arr[1], $arr[2], $arr[3],
         |    ($arr[4] < 0L ? null : (Object) java.lang.Long.valueOf($arr[4])) });
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}
