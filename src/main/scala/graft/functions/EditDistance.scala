package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Thresholded Levenshtein as a native codegen expression:
  * `lev_within(a, b, k)` returns the exact edit distance when it is
  * ≤ k, else k+1. Spark's built-in `levenshtein` fills the FULL
  * O(|a|·|b|) DP matrix even when the caller only asks
  * `levenshtein(a,b) <= k` — at fuzzy-join scale (rl1/lev1 blocked
  * candidate pairs) nearly every pair is far apart, so the
  * Ukkonen-banded DP here does O(k·min) work and abandons a pair the
  * moment a full band row exceeds k. Same early-exit trick every
  * production matcher (Lucene, OpenRefine) ships; same result values,
  * capped — `lev_within(a,b,k) <= k  ⇔  levenshtein(a,b) <= k`, so
  * DuckDB's plain `levenshtein` stays a valid oracle.
  *
  * Codegen calls the static mirror-class loop (the StringSimilarity
  * Janino lesson) — one JVM call per row inside WholeStageCodegen.
  * UTF-16 code units, exact for the BMP.
  */
case class LevenshteinWithin(left: Expression, right: Expression,
    bound: Expression) extends TernaryExpression {
  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = bound
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lev_within"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType, bound.dataType) match {
      case (StringType, StringType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"lev_within requires (string, string, int), got " +
          s"(${a.sql}, ${b.sql}, ${c.sql})")
    }

  override def nullSafeEval(a: Any, b: Any, k: Any): Any =
    EditDistance.levWithin(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = EditDistance.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b, k) =>
      s"${ev.value} = $helper.levWithin($a, $b, $k);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(left = newFirst, right = newSecond, bound = newThird)
}

object EditDistance {
  /** Column-API entry point. */
  def lev_within(a: Column, b: Column, k: Int): Column =
    ColumnBridge.column(LevenshteinWithin(
      ColumnBridge.expression(a), ColumnBridge.expression(b),
      Literal(k, IntegerType)))

  /** Banded DP (called from generated code — plain static-shaped
    * method). Rows iterate the shorter string; each row touches only
    * the [i−k, i+k] band; the running band minimum aborts the pair as
    * soon as no cell can get back under k. Space O(min+1), time
    * O(k·min) vs the builtin's O(|a|·|b|).
    */
  def levWithin(ua: UTF8String, ub: UTF8String, k: Int): Int = {
    if (k < 0) return 0
    var a = ua.toString
    var b = ub.toString
    if (a.length > b.length) { val t = a; a = b; b = t }
    val la = a.length
    val lb = b.length
    if (lb - la > k) return k + 1
    if (la == 0) return math.min(lb, k + 1)
    // prev(i) = distance for a[0..i) vs b[0..j) at the previous column
    val prev = new Array[Int](la + 1)
    val cur = new Array[Int](la + 1)
    var i = 0
    while (i <= la) { prev(i) = i; i += 1 }
    var j = 1
    while (j <= lb) {
      val lo = math.max(1, j - k)
      val hi = math.min(la, j + k)
      cur(0) = j
      if (lo > 1) cur(lo - 1) = k + 1 // cell left of the band: sentinel
      var rowMin = if (lo == 1) cur(0) else Int.MaxValue
      i = lo
      while (i <= hi) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        val del = if (i - 1 >= lo - 1) cur(i - 1) + 1 else k + 2
        val ins = if (i <= math.min(la, j - 1 + k)) prev(i) + 1 else k + 2
        val sub = prev(i - 1) + cost
        var v = sub
        if (del < v) v = del
        if (ins < v) v = ins
        if (v > k + 1) v = k + 1
        cur(i) = v
        if (v < rowMin) rowMin = v
        i += 1
      }
      if (hi < la) cur(hi + 1) = k + 1 // sentinel above the band
      if (rowMin > k) return k + 1    // no path back under the bound
      System.arraycopy(cur, 0, prev, 0, la + 1)
      j += 1
    }
    math.min(prev(la), k + 1)
  }
}
