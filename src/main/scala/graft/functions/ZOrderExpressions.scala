package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Z-order (Morton) interleaved sort keys — the columnar replacement
  * for the reference's multi-column B-tree indexes
  * (`tests/sql/wow_original_create_bldgs_table.sql:54-55`; SURVEY §2.1
  * S8). Sorting a table by ONE column makes parquet min/max row-group
  * stats tight on that column only; sorting by the bit-interleaved key
  * of K columns makes the stats usefully tight on ALL K, so a scan
  * filtered on ANY of them skips most row groups. At 100 TB that is
  * the difference between reading a slice and reading the table, for
  * every secondary-dimension query — with zero read-path machinery
  * (plain parquet pushdown does the skipping).
  *
  * Write-path usage: `df.repartitionByRange(n, zorder_key(a, b))
  * .sortWithinPartitions(zorder_key(a, b))` (or via
  * [[graft.catalog.TableLayout]] clusterBy/sortBy on a materialized
  * key column).
  */
object ZOrderUtil {
  /** MSB-first round-robin bit interleave of K ints into a 4K-byte
    * array whose unsigned-lexicographic order IS the z-order. Each
    * value's sign bit is flipped first so signed ints compare in
    * natural order (two's-complement order != unsigned order).
    */
  /** Two-column Morton key as a SIGNED long whose natural order equals
    * the byte form's unsigned-lexicographic order: per-input sign-bit
    * flips, MSB-first interleave, then a final top-bit flip to map the
    * unsigned 64-bit word onto signed ordering. A plain integer, so
    * range partitioners, window frames — and a DuckDB oracle — can
    * consume it directly.
    */
  def interleave2(x: Int, y: Int): Long = {
    val xa = x ^ Int.MinValue
    val ya = y ^ Int.MinValue
    var r = 0L
    var level = 31
    while (level >= 0) {
      r = (r << 1) | ((xa >>> level) & 1)
      r = (r << 1) | ((ya >>> level) & 1)
      level -= 1
    }
    r ^ Long.MinValue
  }

  def interleave(vals: Array[Int]): Array[Byte] = {
    val k = vals.length
    val out = new Array[Byte](4 * k)
    var bit = 0 // output bit cursor
    var level = 31
    while (level >= 0) {
      var c = 0
      while (c < k) {
        val v = vals(c) ^ Int.MinValue // flip sign bit: order-preserving map to unsigned
        if (((v >>> level) & 1) != 0)
          out(bit >>> 3) = (out(bit >>> 3) | (0x80 >>> (bit & 7))).toByte
        bit += 1
        c += 1
      }
      level -= 1
    }
    out
  }
}

/** `zorder_key(c1, c2, ...)`: binary Morton key over 2..8 integral
  * columns. NULL in any input yields NULL (null rows sort together at
  * the layout edge, which is what a layout key wants).
  */
case class ZOrderKey(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zorder_key"
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2 || children.size > 8)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes 2..8 columns, got ${children.size}")
    else if (children.forall(_.dataType match {
      case ByteType | ShortType | IntegerType => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires int32-or-narrower inputs (range-bucket wider " +
        s"types first), got ${children.map(_.dataType.sql).mkString(", ")}")

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Int](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      vals(i) = v match {
        case b: Byte => b.toInt
        case s: Short => s.toInt
        case n: Int => n
      }
      i += 1
    }
    ZOrderUtil.interleave(vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val vals = ctx.freshName("zvals")
    val anyNull = ctx.freshName("zAnyNull")
    val fill = children.zip(evals).zipWithIndex.map { case ((c, e), i) =>
      val load = c.dataType match {
        case IntegerType => e.value.toString
        case _ => s"(int) ${e.value}"
      }
      s"""
         |${e.code}
         |if (${e.isNull}) { $anyNull = true; } else { $vals[$i] = $load; }
       """.stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
         |boolean $anyNull = false;
         |int[] $vals = new int[${children.size}];
         |$fill
         |boolean ${ev.isNull} = $anyNull;
         |byte[] ${ev.value} = null;
         |if (!$anyNull) {
         |  ${ev.value} = graft.functions.ZOrderUtil.interleave($vals);
         |}
       """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** `zorder_i64(x, y)`: two-column Morton key as an order-equivalent
  * signed BIGINT (see [[ZOrderUtil.interleave2]]).
  */
case class ZOrderKey64(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_i64"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ByteType | ShortType | IntegerType,
            ByteType | ShortType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires int32-or-narrower inputs, got ${l.sql} / ${r.sql}")
    }

  private def toInt(v: Any): Int = v match {
    case b: Byte => b.toInt
    case s: Short => s.toInt
    case n: Int => n
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderUtil.interleave2(toInt(a), toInt(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderUtil.interleave2((int) $a, (int) $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderFunctions {
  def zorder_key(cols: Column*): Column =
    ColumnBridge.column(ZOrderKey(cols.map(ColumnBridge.expression)))

  def zorder_i64(x: Column, y: Column): Column =
    ColumnBridge.column(ZOrderKey64(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
