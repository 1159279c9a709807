package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-N aggregate: keeps the N SMALLEST struct values in the
  * struct's natural (lexicographic ascending) ordering — the aggregate
  * equivalent of `ORDER BY ... LIMIT n` per group. Encode descending
  * keys by negating them in the input struct.
  *
  * Why it exists: top-k-per-group via window `row_number` must shuffle
  * and SORT every row of every group; this aggregate is partial —
  * each map task reduces its slice of a group to <= N rows (a bounded
  * heap), partials merge associatively, and only N rows per group per
  * task ever reach the exchange. A single hot key costs N rows per
  * upstream task instead of its full row count: the skew-proof shape.
  * Plans as ObjectHashAggregate (partial + final), like Spark's own
  * `percentile`/`collect_list` object aggregates.
  */
case class BoundedTopN(
    child: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopN.Buffer]
  with UnaryLike[Expression] {

  require(n > 0, "bounded_topn: n must be positive")

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_topn"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if TypeUtils.checkForOrderingExpr(s, prettyName)
        .isInstanceOf[TypeCheckResult.TypeCheckSuccess.type] =>
      TypeCheckResult.TypeCheckSuccess
    case s: StructType =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an orderable struct, got ${s.sql}")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a struct input, got ${t.sql}")
  }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): BoundedTopN.Buffer =
    new BoundedTopN.Buffer(n, ordering)

  override def update(buf: BoundedTopN.Buffer, input: InternalRow): BoundedTopN.Buffer = {
    val v = child.eval(input)
    // UnsafeProjection + copy gives a DEEP copy: a GenericInternalRow
    // from struct eval may hold UTF8String/array VIEWS into the scan's
    // reused buffers, which a shallow InternalRow.copy() would keep
    // pointing at (corrupting buffered rows as the scan advances)
    if (v != null) buf.offer(proj(v.asInstanceOf[InternalRow]).copy())
    buf
  }

  override def merge(buf: BoundedTopN.Buffer, other: BoundedTopN.Buffer): BoundedTopN.Buffer = {
    other.foreach(buf.offer)
    buf
  }

  override def eval(buf: BoundedTopN.Buffer): Any =
    new GenericArrayData(buf.sortedAscending.asInstanceOf[Array[Any]])

  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def serialize(buf: BoundedTopN.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val rows = buf.sortedAscending
    out.writeInt(rows.length)
    rows.foreach { r =>
      val bytes = r match {
        case u: UnsafeRow => u.getBytes
        case other => proj(other).getBytes
      }
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopN.Buffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val count = in.readInt()
    var i = 0
    while (i < count) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(structType.size)
      row.pointTo(b, len)
      buf.offer(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopN =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopN =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopN =
    copy(child = newChild)
}

object BoundedTopN {
  /** Max-heap of the kept smallest-N (peek = current worst keeper). */
  final class Buffer(n: Int, ordering: Ordering[Any]) {
    private val pq = new java.util.PriorityQueue[InternalRow](
      math.max(n, 1), (a: InternalRow, b: InternalRow) => ordering.compare(b, a))

    def offer(row: InternalRow): Unit =
      if (pq.size < n) pq.add(row)
      else if (ordering.compare(row, pq.peek) < 0) { pq.poll(); pq.add(row) }

    def foreach(f: InternalRow => Unit): Unit = pq.forEach(r => f(r))

    def sortedAscending: Array[InternalRow] = {
      val arr = pq.toArray(new Array[InternalRow](pq.size))
      java.util.Arrays.sort(arr,
        (a: InternalRow, b: InternalRow) => ordering.compare(a, b))
      arr
    }
  }
}

object AggFunctions {
  /** `bounded_topn(struct, n)`: array of the n smallest struct values,
    * ascending (negate keys for descending).
    */
  def bounded_topn(e: Column, n: Int): Column =
    ColumnBridge.column(
      BoundedTopN(ColumnBridge.expression(e), n).toAggregateExpression())
}
