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

object AggFunctions {
  /** Column API for the bounded top-k aggregate. */
  def top_k_by(score: Column, payload: Column, k: Int): Column =
    toColumn(TopKBy(toExpression(score), toExpression(payload), k)
      .toAggregateExpression())
}
