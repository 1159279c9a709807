package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch over a string column: at most `k`
  * counters per buffer, mergeable partials (Agarwal et al., "Mergeable
  * Summaries"), output `array<struct<item, est>>` sorted (est desc,
  * item asc).
  *
  * Guarantees: `true - n/(k+1) <= est <= true` for every item, and any
  * item with true frequency > n/(k+1) survives — so `k` bounds BOTH
  * memory and shuffle bytes per group per task regardless of input
  * cardinality. This is the vocabulary/heavy-hitter pass for 100 TB
  * corpora where an exact `groupBy(token)` would shuffle billions of
  * distinct keys: O(k) bytes per map task instead.
  *
  * When `k` >= the true distinct count the sketch degrades to EXACT
  * counts (no decrements ever fire) and the result is deterministic /
  * oracle-comparable; in the approximate regime survivor sets can vary
  * with merge order (like any mergeable sketch) and the guarantees
  * above are the contract (asserted in SketchSpec).
  *
  * Plans as ObjectHashAggregate with partial merge, like
  * collect_list/percentile.
  */
case class FreqItems(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqItems.Buffer]
  with UnaryLike[Expression] {

  require(k > 0, "freq_items: k must be positive")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  override def createAggregationBuffer(): FreqItems.Buffer =
    new FreqItems.Buffer(k)

  override def update(buf: FreqItems.Buffer, input: InternalRow): FreqItems.Buffer = {
    val v = child.eval(input)
    // .toString owns its bytes — safe against UTF8String views into
    // reused scan buffers
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: FreqItems.Buffer, other: FreqItems.Buffer): FreqItems.Buffer = {
    other.foreach((item, c) => buf.add(item, c))
    buf.shrink()
    buf
  }

  override def eval(buf: FreqItems.Buffer): Any = {
    val rows = buf.sorted.map { case (item, c) =>
      new GenericInternalRow(
        Array[Any](UTF8String.fromString(item), c)): InternalRow
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: FreqItems.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buf.sorted
    out.writeInt(entries.length)
    entries.foreach { case (item, c) =>
      val b = item.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqItems.Buffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.add(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItems =
    copy(child = newChild)
}

object FreqItems {
  /** Misra-Gries counter set: <= k entries after [[shrink]]. Singleton
    * increments decrement-all on overflow (classic MG); bulk adds from
    * merges may exceed k transiently until [[shrink]] subtracts the
    * (k+1)-th largest count (the mergeable-summaries reduction).
    */
  final class Buffer(k: Int) {
    private val counts = new java.util.HashMap[String, Long]()

    def add(item: String, by: Long): Unit = {
      val cur = counts.get(item)
      if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + by)
      else if (counts.size < k) counts.put(item, by)
      else if (by == 1L) decrementAll()
      else counts.put(item, by) // merge path: shrink() restores <= k
    }

    private def decrementAll(): Unit = {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove()
        else e.setValue(e.getValue - 1L)
      }
    }

    /** Reduce to <= k entries: subtract the (k+1)-th largest count from
      * all and drop non-positives (keeps the MG error bound additive
      * across merges).
      */
    def shrink(): Unit = if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val threshold = vals(vals.length - k - 1) // (k+1)-th largest
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= threshold) it.remove()
        else e.setValue(e.getValue - threshold)
      }
    }

    def foreach(f: (String, Long) => Unit): Unit =
      counts.forEach((k, v) => f(k, v))

    def sorted: Array[(String, Long)] = {
      val arr = new Array[(String, Long)](counts.size)
      var i = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
      scala.util.Sorting.stableSort(arr,
        (a: (String, Long), b: (String, Long)) =>
          a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      arr
    }
  }

  def freq_items(e: Column, k: Int): Column =
    ColumnBridge.column(
      FreqItems(ColumnBridge.expression(e), k).toAggregateExpression())
}
