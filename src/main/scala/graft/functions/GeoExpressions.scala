package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the geospatial containment verify
  * (geo3): even-odd ray casting of a point against a polygon given as
  * parallel vertex-coordinate arrays.
  *
  * Why an expression and not a HOF fold: the crossing test reads TWO
  * adjacent vertices per step (current and previous), which an
  * `aggregate` lambda can only express by re-extracting both array
  * elements through interpreted `element_at` calls per edge —
  * measured 10-40× slower on the vector kernels (VectorExpressions
  * scaladoc), and it would also re-evaluate the captured point
  * coordinates per element. This evaluates as one tight JVM loop per
  * candidate row and emits the same loop under whole-stage codegen,
  * so the containment verify stays inside the join's codegen stage.
  *
  * Arithmetic contract (cross-engine bit-identity with the DuckDB
  * oracle): the crossing test is evaluated EXACTLY as
  * `px < (x2 - x1) * (py - y1) / (y2 - y1) + x1` with (x1, y1) the
  * CURRENT vertex and (x2, y2) the PREVIOUS vertex in array order —
  * IEEE double ops in this order are deterministic on both engines,
  * so inside/outside can only diverge for points exactly ON an edge
  * (measure zero for hash-derived coordinates). Strict `>` on both
  * y-comparisons: a horizontal edge never counts as a crossing.
  */
case class PointInPolygon(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_in_polygon"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (DoubleType, DoubleType,
          ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, double, array<double>, " +
          s"array<double>), got ${a.sql} / ${b.sql} / ${c.sql} / ${d.sql}")
    }

  // Vertex elements must be NON-NULL: ArrayData.getDouble reads a
  // null slot as 0.0, which would silently teleport a vertex to the
  // axis — the same silent-wrong-verdict class the parallel-length
  // check guards, so both are enforced at runtime (cheap: one bitmap
  // probe per vertex against a per-candidate loop of double math).
  override def nullSafeEval(pxA: Any, pyA: Any, xsA: Any, ysA: Any): Any = {
    val px = pxA.asInstanceOf[Double]
    val py = pyA.asInstanceOf[Double]
    val xs = xsA.asInstanceOf[ArrayData]
    val ys = ysA.asInstanceOf[ArrayData]
    if (xs.numElements() != ys.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: xs has ${xs.numElements()} vertices but ys has " +
          s"${ys.numElements()} — the coordinate arrays must be parallel")
    val n = xs.numElements()
    var k = 0
    while (k < n) {
      if (xs.isNullAt(k) || ys.isNullAt(k))
        throw new IllegalArgumentException(
          s"$prettyName: null vertex coordinate at index $k — polygon " +
            "arrays must not contain nulls")
      k += 1
    }
    var inside = false
    var j = n - 1
    var i = 0
    while (i < n) {
      val yi = ys.getDouble(i); val yj = ys.getDouble(j)
      if ((yi > py) != (yj > py)) {
        val xi = xs.getDouble(i); val xj = xs.getDouble(j)
        if (px < (xj - xi) * (py - yi) / (yj - yi) + xi) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (px, py, xs, ys) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val yi = ctx.freshName("yi")
      val yj = ctx.freshName("yj")
      val inside = ctx.freshName("inside")
      s"""
         |if ($xs.numElements() != $ys.numElements()) {
         |  throw new IllegalArgumentException(
         |    "point_in_polygon: xs has " + $xs.numElements() +
         |    " vertices but ys has " + $ys.numElements() +
         |    " — the coordinate arrays must be parallel");
         |}
         |int $n = $xs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($xs.isNullAt($i) || $ys.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "point_in_polygon: null vertex coordinate at index " + $i +
         |      " — polygon arrays must not contain nulls");
         |  }
         |}
         |boolean $inside = false;
         |int $j = $n - 1;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $yi = $ys.getDouble($i);
         |  double $yj = $ys.getDouble($j);
         |  if (($yi > $py) != ($yj > $py)) {
         |    if ($px < ($xs.getDouble($j) - $xs.getDouble($i))
         |          * ($py - $yi) / ($yj - $yi) + $xs.getDouble($i)) {
         |      $inside = !$inside;
         |    }
         |  }
         |  $j = $i;
         |}
         |${ev.value} = $inside;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Column-level facade. */
object GeoFunctions {
  /** True iff point (px, py) falls inside the polygon whose vertices
    * are (xs(i), ys(i)) in order (closed implicitly), by even-odd ray
    * casting.
    */
  def point_in_polygon(px: Column, py: Column, xs: Column, ys: Column): Column =
    ColumnBridge.column(PointInPolygon(
      ColumnBridge.expression(px), ColumnBridge.expression(py),
      ColumnBridge.expression(xs), ColumnBridge.expression(ys)))
}
