package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream, ByteArrayInputStream, DataInputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftExpressionBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k best (score, payload) pairs under
  * (score DESC, payload ASC) — a fixed min-heap-at-the-bottom kept as a
  * sorted array (k is small; insertion is an O(k) shift).
  */
final class TopKBuffer(val k: Int) extends Serializable {
  // parallel arrays sorted best-first; `size` entries valid
  val scores = new Array[Double](k)
  val payloads = new Array[Long](k)
  var size = 0

  @inline private def better(s: Double, p: Long, i: Int): Boolean =
    s > scores(i) || (s == scores(i) && p < payloads(i))

  def insert(s: Double, p: Long): Unit = {
    if (size == k && !better(s, p, k - 1)) return
    var i = math.min(size, k - 1)
    while (i > 0 && better(s, p, i - 1)) {
      scores(i) = scores(i - 1); payloads(i) = payloads(i - 1); i -= 1
    }
    scores(i) = s; payloads(i) = p
    if (size < k) size += 1
  }
}

/** top_k_by(score, payload, k): per-group array of the k largest
  * (score, payload) structs, ordered score DESC then payload ASC.
  *
  * The scale point of a native aggregate: "top N per group" via window
  * rank shuffles EVERY row to its group's partition and sorts them;
  * this aggregate keeps O(k) state per group, partial-aggregates
  * map-side (ObjectHashAggregate), and merges buffers, so only k rows
  * per group per map task reach the shuffle. Deterministic tie-break
  * (payload ASC) makes results engine-exact.
  */
case class TopKBy(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with Serializable {

  require(k > 0 && k <= 1024, s"top_k_by: k must be in [1, 1024], got $k")

  override def children: Seq[Expression] = Seq(score, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("payload", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_by"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (score.dataType, payload.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_k_by expects (double, bigint), got $other")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      buffer.insert(s.asInstanceOf[Double], p.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) {
      buffer.insert(other.scores(i), other.payloads(i)); i += 1
    }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val rows = new Array[Any](buffer.size)
    var i = 0
    while (i < buffer.size) {
      rows(i) = new GenericInternalRow(Array[Any](buffer.scores(i), buffer.payloads(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + buffer.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k); out.writeInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      out.writeDouble(buffer.scores(i)); out.writeLong(buffer.payloads(i)); i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.scores(i) = in.readDouble(); buf.payloads(i) = in.readLong(); i += 1
    }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKBy =
    copy(score = newChildren(0), payload = newChildren(1))
}

/** Misra–Gries frequent-items buffer over long keys: at most m counters;
  * any item with true frequency > n/m is guaranteed to be retained, and
  * every retained estimate satisfies est ≥ true − n/m.
  */
final class MGBuffer(val m: Int) extends Serializable {
  val counts = new java.util.HashMap[Long, Long](m * 2)

  def add(item: Long, by: Long = 1L): Unit = {
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + by)
    else if (counts.size < m) counts.put(item, by)
    else decrementAll(by)
  }

  /** The decrement step: reduce every counter by `by` (clamped at the
    * smallest), dropping zeros — O(m), amortized O(1) per stream item
    * because a decrement pays for m prior increments.
    */
  private def decrementAll(by: Long): Unit = {
    val it = counts.entrySet().iterator()
    var drop = List.empty[Long]
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= by) drop = e.getKey :: drop
      else e.setValue(e.getValue - by)
    }
    drop.foreach(counts.remove(_))
  }

  /** Mergeable-summaries merge (Agarwal et al. 2012): sum counters,
    * then subtract the (m+1)-th largest count and keep positives.
    */
  def merge(other: MGBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.put(e.getKey, counts.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (counts.size > m) {
      val vals = new Array[Long](counts.size)
      val vi = counts.values().iterator()
      var i = 0
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - m - 1) // (m+1)-th largest
      val it2 = counts.entrySet().iterator()
      var drop = List.empty[Long]
      while (it2.hasNext) {
        val e = it2.next()
        if (e.getValue <= cut) drop = e.getKey :: drop
        else e.setValue(e.getValue - cut)
      }
      drop.foreach(counts.remove(_))
    }
  }
}

/** space_saving(item, m): Misra–Gries frequent-items sketch over a long
  * key — O(m) state per partial buffer regardless of key cardinality.
  * Returns array<struct<item, est>> sorted (est DESC, item ASC).
  *
  * The estimates are partitioning-dependent (±n/m), so the sketch is
  * a CANDIDATE generator, not a result: pair it with an exact recount
  * of the ≤ m candidates (see Profile.heavyHittersSketch) to get exact
  * heavy hitters without ever grouping the full key space.
  */
case class SpaceSavingAgg(
    item: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] with Serializable {

  require(m > 0 && m <= 65536, s"space_saving: m must be in [1, 65536], got $m")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "space_saving"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    item.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"space_saving expects a bigint item, got $other")
    }

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(m)

  override def update(buffer: MGBuffer, input: InternalRow): MGBuffer = {
    val v = item.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: MGBuffer, other: MGBuffer): MGBuffer = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: MGBuffer): Any = {
    val entries = new Array[(Long, Long)](buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    val sorted = entries.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      new GenericInternalRow(Array[Any](k, c))
    })
  }

  override def serialize(buffer: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + buffer.counts.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.m); out.writeInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); out.writeLong(e.getKey); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MGBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.counts.put(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SpaceSavingAgg =
    copy(item = newChildren(0))
}

/** Exact per-group vote tally: label → Σweight, merged by summing. The
  * label space per group is bounded by the group's input rows (for the
  * LPA vote, a node's distinct neighbor labels ≤ its degree).
  */
final class VoteBuffer extends Serializable {
  val votes = new java.util.HashMap[Long, Long]()
  def add(lbl: Long, w: Long): Unit =
    votes.put(lbl, votes.getOrDefault(lbl, 0L) + w)
}

/** weighted_mode(lbl, w): the label with the largest exact Σw per group,
  * ties broken to the SMALLEST label — bit-identical to the two-level
  * formulation `groupBy(g, lbl).agg(sum(w))` → `groupBy(g).agg(max(
  * struct(votes, -lbl)))` that the LPA loop used, but in ONE aggregate:
  * partial vote maps combine map-side (ObjectHashAggregate) and only
  * per-group partials cross the wire, so each LPA round pays one
  * exchange instead of two (guide §2.4 — two operations keyed the same
  * way share one exchange). Exact: long sums, deterministic tie-break.
  */
case class WeightedMode(
    lbl: Expression,
    w: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VoteBuffer] with Serializable {

  override def children: Seq[Expression] = Seq(lbl, w)
  override def nullable: Boolean = true // empty group (never in practice)
  override def dataType: DataType = LongType
  override def prettyName: String = "weighted_mode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (lbl.dataType, w.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"weighted_mode expects (bigint, bigint), got $other")
    }

  override def createAggregationBuffer(): VoteBuffer = new VoteBuffer

  override def update(buffer: VoteBuffer, input: InternalRow): VoteBuffer = {
    val l = lbl.eval(input)
    val v = w.eval(input)
    if (l != null && v != null) buffer.add(l.asInstanceOf[Long], v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: VoteBuffer, other: VoteBuffer): VoteBuffer = {
    val it = other.votes.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); buffer.add(e.getKey, e.getValue)
    }
    buffer
  }

  override def eval(buffer: VoteBuffer): Any = {
    if (buffer.votes.isEmpty) return null
    var bestLbl = 0L
    var bestVotes = Long.MinValue
    var first = true
    val it = buffer.votes.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val l = e.getKey; val v = e.getValue
      if (first || v > bestVotes || (v == bestVotes && l < bestLbl)) {
        bestLbl = l; bestVotes = v; first = false
      }
    }
    bestLbl
  }

  override def serialize(buffer: VoteBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buffer.votes.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.votes.size)
    val it = buffer.votes.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); out.writeLong(e.getKey); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VoteBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new VoteBuffer
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.votes.put(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WeightedMode =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WeightedMode =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): WeightedMode =
    copy(lbl = newChildren(0), w = newChildren(1))
}

/** Exact element-wise Σ over long vectors, sized lazily to the first
  * vector's dimension. */
final class VecSumBuffer extends Serializable {
  var s: Array[Long] = null
  def add(arr: org.apache.spark.sql.catalyst.util.ArrayData): Unit = {
    val n = arr.numElements()
    if (s == null) s = new Array[Long](n)
    require(s.length == n, s"vec_sum_l: dim mismatch (${s.length} vs $n)")
    var i = 0
    while (i < n) { s(i) += arr.getLong(i); i += 1 }
  }
}

/** vec_sum_l(vq): exact element-wise sum of array<long> vectors per
  * group — the Lloyd mean-update numerator in ONE map-side-combining
  * aggregate. Replaces posexplode(×d) + a (cluster, dim)-keyed exchange
  * of N·d rows with a d-long buffer per group per map task (guide §2.3:
  * aggregate before you shuffle, don't multiply rows to aggregate
  * them). Long adds are commutative ⇒ partitioning-independent.
  */
case class VecSumL(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer] with Serializable {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true // empty group
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_sum_l"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_sum_l expects array<bigint>, got $other")
    }

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(buffer: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    buffer
  }

  override def merge(buffer: VecSumBuffer, other: VecSumBuffer): VecSumBuffer = {
    if (other.s != null) {
      if (buffer.s == null) buffer.s = other.s.clone()
      else {
        require(buffer.s.length == other.s.length,
          s"vec_sum_l: dim mismatch (${buffer.s.length} vs ${other.s.length})")
        var i = 0
        while (i < buffer.s.length) { buffer.s(i) += other.s(i); i += 1 }
      }
    }
    buffer
  }

  override def eval(buffer: VecSumBuffer): Any =
    if (buffer.s == null) null else new GenericArrayData(buffer.s.clone())

  override def serialize(buffer: VecSumBuffer): Array[Byte] = {
    val n = if (buffer.s == null) -1 else buffer.s.length
    val bos = new ByteArrayOutputStream(4 + math.max(0, n) * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(n)
    if (n > 0) buffer.s.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new VecSumBuffer
    val n = in.readInt()
    if (n >= 0) {
      buf.s = new Array[Long](n)
      var i = 0
      while (i < n) { buf.s(i) = in.readLong(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumL =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumL =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VecSumL =
    copy(child = newChildren(0))
}

/** Exact second-moment accumulator over quantized vectors: n, Σq_i, and
  * the upper-triangle Σq_i·q_j — sized lazily to the first vector's
  * dimension (d longs + d(d+1)/2 longs of state).
  */
final class CovBuffer extends Serializable {
  var n: Long = 0L
  var d: Int = -1
  var s: Array[Long] = null
  var ss: Array[Long] = null // row-major upper triangle: (i,j) i<=j at i*d - i(i-1)/2 + (j-i)

  def init(dim: Int): Unit = {
    d = dim; s = new Array[Long](dim); ss = new Array[Long](dim * (dim + 1) / 2)
  }

  def add(q: Array[Long]): Unit = {
    if (d < 0) init(q.length)
    require(q.length == d, s"vec_cov_sum: mixed dimensions $d vs ${q.length}")
    n += 1
    var i = 0; var t = 0
    while (i < d) {
      s(i) += q(i)
      var j = i
      while (j < d) { ss(t) += q(i) * q(j); j += 1; t += 1 }
      i += 1
    }
  }

  def merge(o: CovBuffer): Unit = {
    if (o.d < 0) return
    if (d < 0) init(o.d)
    require(o.d == d, s"vec_cov_sum: mixed dimensions $d vs ${o.d}")
    n += o.n
    var i = 0
    while (i < s.length) { s(i) += o.s(i); i += 1 }
    i = 0
    while (i < ss.length) { ss(i) += o.ss(i); i += 1 }
  }
}

/** vec_cov_sum(qvec): exact distributed second-moment sums over an
  * integer-quantized vector column — ONE streaming pass builds the full
  * d×d Gram state per partition (O(d²) longs, independent of row
  * count), partials merge associatively, and only sketch-sized buffers
  * ride the shuffle. The alternative — posexplode twice into a
  * (row × d²) fan-out and groupBy — multiplies the 100 TB scan by 4096.
  *
  * Input is ALREADY-quantized longs (callers use Spark's round(x·10⁴)
  * so the quantization path is the engine-validated one); all internal
  * arithmetic is exact integer. With 4dp quantization of unit-scale
  * components (|q| ≤ 10⁴, products ≤ 10⁸), long partials are exact up
  * to ~9·10¹⁰ rows; beyond that drop to 3dp.
  *
  * Returns array<struct<i, j, n, s_i, s_j, s_ij>> for i ≤ j — the raw
  * sufficient statistics, so covariance/correlation derive downstream
  * in one exact integer step per pair.
  */
case class VecCovSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovBuffer] with Serializable {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("s_i", LongType, nullable = false),
    StructField("s_j", LongType, nullable = false),
    StructField("s_ij", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "vec_cov_sum"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // containsNull=true is tolerated at the type level (transform()
      // lambdas infer it) but a null ELEMENT is a hard runtime error —
      // silently reading it as 0 would corrupt the moment sums
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_cov_sum expects array<bigint>, got $other")
    }

  override def createAggregationBuffer(): CovBuffer = new CovBuffer

  override def update(buffer: CovBuffer, input: InternalRow): CovBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = arr.numElements()
      val q = new Array[Long](n)
      var i = 0
      while (i < n) {
        require(!arr.isNullAt(i), "vec_cov_sum: null vector element")
        q(i) = arr.getLong(i); i += 1
      }
      buffer.add(q)
    }
    buffer
  }

  override def merge(buffer: CovBuffer, other: CovBuffer): CovBuffer = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: CovBuffer): Any = {
    if (buffer.d < 0) return new GenericArrayData(Array.empty[Any])
    val rows = new Array[Any](buffer.ss.length)
    var i = 0; var t = 0
    while (i < buffer.d) {
      var j = i
      while (j < buffer.d) {
        rows(t) = new GenericInternalRow(
          Array[Any](i, j, buffer.n, buffer.s(i), buffer.s(j), buffer.ss(t)))
        j += 1; t += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: CovBuffer): Array[Byte] = {
    val d = math.max(buffer.d, 0)
    val bos = new ByteArrayOutputStream(16 + 8 * (d + d * (d + 1) / 2))
    val out = new DataOutputStream(bos)
    out.writeLong(buffer.n); out.writeInt(buffer.d)
    if (buffer.d >= 0) {
      buffer.s.foreach(out.writeLong)
      buffer.ss.foreach(out.writeLong)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CovBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new CovBuffer
    buf.n = in.readLong()
    val d = in.readInt()
    if (d >= 0) {
      buf.init(d)
      var i = 0
      while (i < buf.s.length) { buf.s(i) = in.readLong(); i += 1 }
      i = 0
      while (i < buf.ss.length) { buf.ss(i) = in.readLong(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecCovSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecCovSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VecCovSum =
    copy(child = newChildren(0))
}

object AggFunctions {
  /** Column API for the bounded top-k aggregate. */
  def top_k_by(score: Column, payload: Column, k: Int): Column =
    toColumn(TopKBy(toExpression(score), toExpression(payload), k)
      .toAggregateExpression())

  /** Column API for the Misra–Gries frequent-items sketch. */
  def space_saving(item: Column, m: Int): Column =
    toColumn(SpaceSavingAgg(toExpression(item), m).toAggregateExpression())

  /** Column API for the fused LPA vote (argmax label by Σweight). */
  def weighted_mode(lbl: Column, w: Column): Column =
    toColumn(WeightedMode(toExpression(lbl), toExpression(w)).toAggregateExpression())

  /** Column API for the exact element-wise long-vector sum. */
  def vec_sum_l(vq: Column): Column =
    toColumn(VecSumL(toExpression(vq)).toAggregateExpression())

  /** Column API for the exact vector second-moment aggregate. */
  def vec_cov_sum(qvec: Column): Column =
    toColumn(VecCovSum(toExpression(qvec)).toAggregateExpression())
}
