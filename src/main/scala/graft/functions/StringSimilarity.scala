package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen expression — the
  * fuzzy-match primitive Spark lacks (it ships only `levenshtein`
  * and `soundex`). Semantics pinned to the textbook algorithm as
  * DuckDB implements it (`jaro_winkler_similarity`), verified
  * value-for-value including the corner convention that BOTH-empty
  * returns 0.0 (not 1.0): match window `max(|a|,|b|)/2 - 1` (floored
  * at 0), half-transposition count, Winkler prefix boost `l·0.1·(1-j)`
  * with `l ≤ 4` applied only when the Jaro score exceeds 0.7.
  *
  * Entity-resolution context (the reference normalizes and joins
  * landlord/contact names across datasets — see
  * `/root/reference/lib/dbtool.py` table plumbing): blocking keeps the
  * candidate set linear, this expression scores the survivors. Codegen
  * emits a call to the static [[StringSimilarity.jaroWinkler]] loop —
  * one JVM call per row inside WholeStageCodegen, no boxing, no
  * interpreted fallback. Operates on UTF-16 code units (exact for the
  * BMP; the corpus here is ASCII).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (string, string), got (${a.sql}, ${b.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarity.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Call the object's static-forwarder mirror class: the `object`
    // compiles to `StringSimilarity$` (instance under MODULE$) plus a
    // mirror class `StringSimilarity` whose members are plain statics —
    // Janino resolves only the latter (referencing MODULE$ on the
    // mirror class fails to compile and silently drops the whole stage
    // to the interpreted path).
    val helper = StringSimilarity.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $helper.jaroWinkler($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringSimilarity {
  /** Column-API entry point. */
  def jaro_winkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** The scoring loop (called from generated code — must stay a plain
    * static-shaped method on this module). Scratch arrays are O(|a|+|b|)
    * per call; name-scale strings make that allocation noise next to
    * the row handling around it.
    */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0 // DuckDB convention: ""/"" -> 0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && b.charAt(j) == a.charAt(i)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val dm = m.toDouble
    val jaro = (dm / la + dm / lb + (dm - t) / dm) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxPrefix = math.min(4, math.min(la, lb))
    while (l < maxPrefix && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
