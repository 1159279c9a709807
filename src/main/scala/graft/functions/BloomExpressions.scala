package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Bloom-filter join pruning — the explicit, plan-deterministic form of
  * Spark's own runtime row-level filtering (`InjectRuntimeFilter`).
  *
  * At 100 TB the standard pattern for a selective dim→fact join is:
  * aggregate the dim-side join keys into a bloom filter (one small
  * binary blob), broadcast it, and drop fact rows whose key cannot be
  * in the dim BEFORE they reach the join exchange. False positives are
  * removed by the exact join that follows; false negatives cannot occur,
  * so the composed result is identical to the plain join — which is
  * what makes the operator oracle-checkable.
  *
  * Spark's automatic runtime filter only fires under specific plan
  * shapes/thresholds and can't persist the filter across jobs; this
  * explicit aggregate also covers the cross-job case (build once,
  * store the blob, prune tomorrow's load) — the same "publish state,
  * reuse on next run" shape as the reference's lastmod tracking
  * (`lib/lastmod.py:49-66`).
  *
  * Blob layout: 4-byte big-endian numHashes header + the bitset bytes
  * (numBits = 8 * (len - 4)). Carrying k in the blob means the probe
  * side cannot be mis-parameterized against the build side.
  */
object BloomUtil {
  /** splitmix64 finalizer: avalanches raw keys so plain ids (0,1,2,…)
    * spread uniformly — callers need not pre-hash.
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Kirsch-Mitzenmacher double hashing: position i = h1 + i*h2. */
  def setBits(bits: Array[Byte], headerBytes: Int, key: Long, numHashes: Int): Unit = {
    val numBits = (bits.length - headerBytes).toLong * 8L
    val h1 = mix64(key)
    val h2 = mix64(h1 ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % numBits
      bits((headerBytes + (pos >>> 3)).toInt) =
        (bits((headerBytes + (pos >>> 3)).toInt) | (1 << (pos & 7L).toInt)).toByte
      i += 1
    }
  }

  /** Probe a serialized filter (4-byte k header + bitset). Called from
    * both interpreted eval and generated code.
    *
    * The blob is arbitrary binary input (a column value), so the header
    * is validated, not trusted: a blob too short to hold header+bitset
    * is rejected, and numHashes is clamped to [1,16] — a zero/corrupt
    * header would otherwise silently disable pruning (k=0 ⇒ always
    * true) or spin ~2^31 probe iterations per row.
    */
  def mightContain(blob: Array[Byte], key: Long): Boolean = {
    require(blob.length >= 5,
      s"bloom probe: blob too short (${blob.length} B; need 4 B header + bitset)")
    val rawK = ((blob(0) & 0xff) << 24) | ((blob(1) & 0xff) << 16) |
      ((blob(2) & 0xff) << 8) | (blob(3) & 0xff)
    require(rawK >= 1 && rawK <= 16,
      s"bloom probe: corrupt header numHashes=$rawK (expected 1..16)")
    val numHashes = rawK
    val numBits = (blob.length - 4).toLong * 8L
    val h1 = mix64(key)
    val h2 = mix64(h1 ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % numBits
      if ((blob((4 + (pos >>> 3)).toInt) & (1 << (pos & 7L).toInt)) == 0) return false
      i += 1
    }
    true
  }
}

/** `bloom_agg(key, numBits, numHashes)`: mergeable bloom-filter
  * aggregate over integral keys. Partial buffers are fixed-size byte
  * arrays that merge by OR — shuffle cost is numBits/8 bytes per
  * group per task regardless of input row count (the sketch-rollup
  * property, like the HLL/KLL aggregates).
  *
  * Sizing: fpp ≈ (1 - e^{-k·n/m})^k; m = 10 bits/key, k = 7 gives
  * ~0.8% — the classic default. Exact-result composition is immune to
  * the fpp either way; it only tunes pruning power.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(numBits > 0 && numBits % 8 == 0,
    s"bloom_agg: numBits must be a positive multiple of 8, got $numBits")
  require(numHashes > 0 && numHashes <= 16,
    s"bloom_agg: numHashes must be in [1,16], got $numHashes")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral key, got ${t.sql}")
  }

  // buffer IS the final blob: [k header][bitset], OR-mergeable in place
  override def createAggregationBuffer(): Array[Byte] = {
    val buf = new Array[Byte](4 + numBits / 8)
    buf(0) = (numHashes >>> 24).toByte; buf(1) = (numHashes >>> 16).toByte
    buf(2) = (numHashes >>> 8).toByte; buf(3) = numHashes.toByte
    buf
  }

  private def keyOf(v: Any): Long = v match {
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.setBits(buf, 4, keyOf(v), numHashes)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 4 // headers are identical (same k); OR the bitsets
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
}

/** `might_contain(bloom, key)`: false ⇒ key definitely absent from the
  * build set; true ⇒ probably present. Codegen keeps the probe inside
  * whole-stage codegen so the fact-scan filter stays a tight loop.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ByteType | ShortType | IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, integral), got ${l.sql} / ${r.sql}")
    }

  private def keyOf(v: Any): Long = v match {
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(blob: Any, key: Any): Any =
    BloomUtil.mightContain(blob.asInstanceOf[Array[Byte]], keyOf(key))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (blob, key) => {
      s"${ev.value} = graft.functions.BloomUtil.mightContain($blob, (long) $key);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomFunctions {
  /** Aggregate a key column into a broadcastable bloom blob. */
  def bloom_agg(key: Column, numBits: Int, numHashes: Int = 7): Column =
    ColumnBridge.column(
      BloomFilterAgg(ColumnBridge.expression(key), numBits, numHashes)
        .toAggregateExpression())

  def might_contain(bloom: Column, key: Column): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(key)))
}
