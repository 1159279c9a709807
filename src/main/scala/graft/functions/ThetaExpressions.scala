package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{AnotB, Intersection, SetOperation, Sketch, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Theta sketches (DataSketches) — distinct counting with
  * SET ALGEBRA, the capability the HLL rollup (`a19_hll_rollup`)
  * cannot provide: HLL register-max union supports union only, while
  * Theta sketches intersect and difference. The 100 TB pattern:
  * sketch each segment's keys once at ingest, then answer "how many
  * users are in BOTH segments / in A but not B" for any segment pair
  * by driver-side set algebra over KB-sized blobs — no rescan, no
  * giant exact distinct-join.
  *
  * Below ~2^lgK distinct values a Theta sketch is in exact mode: the
  * estimate is exact and deterministic (th1's oracle relies on this
  * at gate scale); past it, the relative standard error is
  * ~1/sqrt(2^lgK) per operand (intersections compound error — see
  * ThetaSpec's estimation-regime test).
  *
  * Aggregates plan as ObjectHashAggregate with partial merge: map-side
  * sketching, O(2^lgK) bytes per group per task on the shuffle.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"theta_sketch_agg: lgK must be in [4, 26], got $lgK")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral or string input, got ${t.sql}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    child.eval(input) match {
      case null => ()
      case b: Byte => buf.update(b.toLong)
      case s: Short => buf.update(s.toLong)
      case i: Int => buf.update(i.toLong)
      case l: Long => buf.update(l)
      // update with the raw bytes, NOT update(String): DataSketches'
      // update(String) is a documented no-op for "" which would silently
      // exclude empty strings from the distinct count, diverging from
      // exact COUNT(DISTINCT) (and from the integral path, where every
      // non-null value counts). update(byte[]) hashes "" like any value.
      case s: UTF8String => buf.update(s.getBytes)
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any =
    buf.getResult.toByteArray // compact, ordered — canonical form

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Union of serialized Theta sketches (binary -> merged binary): the
  * rollup step, same shape as `kll_merge_agg`/`hll_union_agg`.
  */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"theta_union_agg: lgK must be in [4, 26], got $lgK")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_union_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary theta sketch input, got ${t.sql}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

private[functions] trait ThetaBinarySetOp
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two binary theta sketches, got (${l.sql}, ${r.sql})")
    }
  protected def wrap(v: Any): Sketch =
    Sketch.wrap(Memory.wrap(v.asInstanceOf[Array[Byte]]))
}

/** `theta_intersect(a, b)`: sketch of the intersection. Runs on
  * already-aggregated rows, so interpreted eval is fine.
  */
case class ThetaIntersect(left: Expression, right: Expression)
    extends ThetaBinarySetOp with BinaryLike[Expression] {
  override def prettyName: String = "theta_intersect"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val i: Intersection = SetOperation.builder().buildIntersection()
    i.intersect(wrap(a)); i.intersect(wrap(b))
    i.getResult.toByteArray
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersect =
    copy(left = newLeft, right = newRight)
}

/** `theta_a_not_b(a, b)`: sketch of the set difference A \ B. */
case class ThetaANotB(left: Expression, right: Expression)
    extends ThetaBinarySetOp with BinaryLike[Expression] {
  override def prettyName: String = "theta_a_not_b"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val op: AnotB = SetOperation.builder().buildANotB()
    op.setA(wrap(a)); op.notB(wrap(b))
    op.getResult(true).toByteArray
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaANotB =
    copy(left = newLeft, right = newRight)
}

/** `theta_estimate(sketch)`: estimated distinct count (exact below the
  * sketch's nominal entries).
  */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback with UnaryLike[Expression] {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary theta sketch, got ${t.sql}")
  }
  override def nullSafeEval(v: Any): Any =
    Sketch.wrap(Memory.wrap(v.asInstanceOf[Array[Byte]])).getEstimate
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

object ThetaFunctions {
  /** Default lgK: 2^12 nominal entries, ~1.6% RSE in estimation mode,
    * <=32 KB blobs.
    */
  val DefaultLgK = 12

  def theta_sketch_agg(e: Column, lgK: Int = DefaultLgK): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(e), lgK).toAggregateExpression())

  def theta_union_agg(e: Column, lgK: Int = DefaultLgK): Column =
    ColumnBridge.column(
      ThetaUnionAgg(ColumnBridge.expression(e), lgK).toAggregateExpression())

  def theta_intersect(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaIntersect(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def theta_a_not_b(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaANotB(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def theta_estimate(sketch: Column): Column =
    ColumnBridge.column(ThetaEstimate(ColumnBridge.expression(sketch)))
}
