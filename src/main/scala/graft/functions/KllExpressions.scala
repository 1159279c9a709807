package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Mergeable quantile sketches (DataSketches KLL, the library already
  * backing Spark's own `hll_sketch_agg`): the quantile counterpart of
  * [[graft.queries.Relational.a19HllRollup]]'s distinct-count rollup.
  *
  * Why this exists when Spark has `percentile`/`approx_percentile`:
  * neither yields a STORABLE summary. At 100 TB the winning pattern is
  * to keep a tiny sketch column per partition/group (built once, at
  * ingest), then answer any later quantile query — per group, or
  * rolled up across arbitrary group subsets — by merging sketches:
  * O(#sketches · k) work instead of a full rescan of the raw rows.
  * KLL gives a proven worst-case rank error of ~1.65% at the default
  * k=200 (single-sided, 99% confidence) that survives arbitrary
  * merging (Karnin/Lang/Liberty, FOCS'16).
  *
  * Like every compacting quantile sketch (and unlike HLL register-max
  * union), KLL estimates depend on compaction coin flips and merge
  * order, so results are approximate and not run-to-run identical at
  * compacting scale; the rank-error contract is what's asserted
  * (SketchSpec), and the demo query is rows-only at the driver gate.
  *
  * Both aggregates plan as ObjectHashAggregate with partial merge:
  * map-side sketching, O(k) bytes per group per task on the shuffle.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"kll_sketch_agg: k must be in [8, 65535], got $k")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input (cast first), got ${t.sql}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Union of serialized KLL sketches (binary column -> merged binary
  * sketch): the rollup step. Merging preserves the KLL error bound, so
  * group sketches re-aggregate to any coarser grouping without
  * touching the raw data.
  */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"kll_merge_agg: k must be in [8, 65535], got $k")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary KLL sketch input, got ${t.sql}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** Quantile extraction from a serialized KLL sketch:
  * `kll_quantiles(sketch, array(0.5, 0.95, ...))` -> array<double>
  * (INCLUSIVE search criterion, matching DataSketches' default).
  * Runs on already-aggregated rows (one per group), so interpreted
  * eval is fine — this is never the hot path.
  */
case class KllQuantiles(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantiles"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, array<double>), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(sketchBytes: Any, ranks: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) return null
    val rs = ranks.asInstanceOf[ArrayData].toDoubleArray()
    val qs = sk.getQuantiles(rs, QuantileSearchCriteria.INCLUSIVE)
    new GenericArrayData(qs)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantiles =
    copy(left = newLeft, right = newRight)
}

object KllExpressions {
  /** Default k: rank error ~1.65% worst case, ~0.7 KB serialized. */
  val DefaultK = 200

  def kll_sketch_agg(e: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(
      KllSketchAgg(ColumnBridge.expression(e), k).toAggregateExpression())

  def kll_merge_agg(e: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(
      KllMergeAgg(ColumnBridge.expression(e), k).toAggregateExpression())

  def kll_quantiles(sketch: Column, ranks: Column): Column =
    ColumnBridge.column(KllQuantiles(
      ColumnBridge.expression(sketch), ColumnBridge.expression(ranks)))
}
