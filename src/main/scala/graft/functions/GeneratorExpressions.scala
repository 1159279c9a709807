package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Shared frame arithmetic for the two frame generators: ceil-div
  * frame count (computed in Long — `len + frameBytes - 1` overflows
  * Int for large frameBytes) and the every-Nth sampling filter. One
  * definition keeps the [[graft.plans.PruneFrameBytes]] rewrite's
  * result-identity guarantee trivially true.
  */
sealed trait FrameGenerator extends Generator with CodegenFallback {
  def payload: Expression
  def frameBytes: Int
  def everyNth: Int

  require(frameBytes > 0, s"$prettyName: frameBytes must be positive")
  require(everyNth > 0, s"$prettyName: everyNth must be positive")

  override def children: Seq[Expression] = Seq(payload)

  override def checkInputDataTypes(): TypeCheckResult = payload.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary payload, got ${t.sql}")
  }

  protected final def frameIndices(len: Int): Iterator[Int] = {
    val nFrames = ((len.toLong + frameBytes - 1) / frameBytes).toInt
    Iterator.range(0, nFrames).filter(_ % everyNth == 0)
  }
}

/** Native table-valued function (Catalyst `Generator`) — the §2.11
  * UDTF surface: `split_frames(payload, frameBytes, everyNth)` emits
  * one `(frame_idx, frame)` row per sampled fixed-size window of a
  * binary payload. Usable wherever Spark accepts generators:
  * `select(posexplode-like)`, SQL `LATERAL VIEW`, or
  * `SELECT split_frames(...) FROM t`.
  *
  * This is the generator dual of
  * [[graft.multimodal.Multimodal.sampleFrames]] (a typed flatMap):
  * same frame arithmetic, but as a Catalyst expression it composes in
  * SQL, keeps column pruning (only `payload` is read), and fans out
  * inside the scan stage with no Dataset encoder round-trip.
  * Generators evaluate row-at-a-time ([[CodegenFallback]], like most
  * of Spark's own non-explode generators); the per-row work here is
  * O(payload/frameBytes) slice copies — the codec stub boundary.
  */
case class SplitFrames(
    payload: Expression,
    frameBytes: Int,
    everyNth: Int)
  extends FrameGenerator {

  override def prettyName: String = "split_frames"

  override def elementSchema: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = payload.eval(input)
    if (v == null) Iterator.empty
    else {
      val bytes = v.asInstanceOf[Array[Byte]]
      frameIndices(bytes.length).map { idx =>
        val from = idx * frameBytes
        val until = math.min(from.toLong + frameBytes, bytes.length).toInt
        new GenericInternalRow(Array[Any](
          idx, java.util.Arrays.copyOfRange(bytes, from, until)))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SplitFrames =
    copy(payload = newChildren.head)
}

/** Size-only sibling of [[SplitFrames]]: emits `(frame_idx,
  * frame_bytes)` with pure integer arithmetic — NO byte copies, and no
  * dependence on the payload CONTENT at all, only its length. The
  * optimizer rule [[graft.plans.PruneFrameBytes]] swaps this in when a
  * query provably consumes at most `length(frame)` — at 100 TB of
  * media that turns a full payload slice-and-copy pass into per-row
  * integer math.
  */
case class SplitFrameSizes(
    payload: Expression,
    frameBytes: Int,
    everyNth: Int)
  extends FrameGenerator {

  override def prettyName: String = "split_frame_sizes"

  override def elementSchema: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_bytes", IntegerType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = payload.eval(input)
    if (v == null) Iterator.empty
    else {
      val len = v.asInstanceOf[Array[Byte]].length
      frameIndices(len).map { idx =>
        new GenericInternalRow(Array[Any](
          idx, math.min(frameBytes.toLong, len - idx.toLong * frameBytes).toInt))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SplitFrameSizes =
    copy(payload = newChildren.head)
}

object GeneratorFunctions {
  /** `split_frames(payload, frameBytes, everyNth)` as a Column for the
    * DataFrame API (`df.select(col("id"), split_frames(...))`).
    */
  def split_frames(payload: Column, frameBytes: Int, everyNth: Int): Column =
    ColumnBridge.column(SplitFrames(
      ColumnBridge.expression(payload), frameBytes, everyNth))
}
