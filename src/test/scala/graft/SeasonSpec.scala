package graft

import org.apache.spark.sql.functions._

import graft.queries.Season

/** Seasonal batch: Holt–Winters fold vs a driver-side sequential
  * replay (same requantization), STL decomposition identities.
  */
class SeasonSpec extends SparkSpec {

  private def round9(v: Double): Double =
    BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hw1: in-plan fold equals a sequential Holt-Winters replay") {
    val daily = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("rev"))
      .orderBy(col("day")).collect()
      .map(_.getDecimal(1))
    assert(daily.length >= 15, "needs two init weeks + fold")
    val ys = daily.map(_.doubleValue())
    val m1 = round9(daily.take(7).map(BigDecimal(_)).sum.toDouble / 7)
    val m2 = round9(daily.slice(7, 14).map(BigDecimal(_)).sum
      .toDouble / 7)
    var l = m1
    var b = round9((m2 - m1) / 7)
    var s = ys.take(7).map(v => round9(v - m1)).toVector
    for (x <- ys.drop(7)) {
      val lv = round9(0.5 * (x - s(0)) + 0.5 * (l + b))
      val bv = round9(0.5 * b + 0.5 * (lv - l))
      val sv = round9(0.5 * (x - lv) + 0.5 * s(0))
      l = lv; b = bv; s = s.tail :+ sv
    }
    val r = Season.hw1HoltWinters(spark, sf).collect()(0)
    assert(r.getInt(0) == ys.length)
    assert(math.abs(r.getAs[Double]("level6") - round6(l)) < 1e-9)
    assert(math.abs(r.getAs[Double]("trend6") - round6(b)) < 1e-9)
    assert(math.abs(r.getAs[Double]("season6") - round6(s(0))) < 1e-9)
    assert(math.abs(r.getAs[Double]("forecast6") -
      round6(l + b + s(0))) < 1e-9)
  }

  test("hw1: degenerate short series match the oracle's recursive-CTE " +
      "edges (0 rows < 7 days; NULL trend/forecast at 7; defined at 8)") {
    import spark.implicits._
    def series(n: Int) = (1 to n)
      .map(i => (java.sql.Date.valueOf(f"2024-01-$i%02d"), BigDecimal(i * 10)))
      .toDF("day", "rev")
      .select(col("day"), col("rev").cast("decimal(18,2)").as("rev"))
    // < 7 days: the oracle's recursion starts at t=7 and never reaches
    // t=c, yielding ZERO rows — so must we
    assert(Season.holtWinters(series(6)).count() == 0)
    // exactly 7: one row, level = week-1 mean, but the week-2 slice is
    // EMPTY -> m2 NULL (the oracle's scalar-subquery sum), NOT 0 —
    // trend and forecast are NULL, level/season defined
    val r7 = Season.holtWinters(series(7)).collect()(0)
    assert(r7.getInt(0) == 7)
    assert(!r7.isNullAt(1) && r7.isNullAt(2) && !r7.isNullAt(3) &&
      r7.isNullAt(4), s"7-day series must carry NULL trend/forecast, got $r7")
    assert(math.abs(r7.getAs[Double]("level6") - 40.0) < 1e-9) // mean 10..70
    // 8 days: week-2 slice partial but non-empty -> all defined (the
    // oracle's partial scalar sum is non-NULL there too)
    val r8 = Season.holtWinters(series(8)).collect()(0)
    assert(!r8.isNullAt(1) && !r8.isNullAt(4),
      s"8-day series must be defined, got $r8")
  }

  test("stl1: residual identity holds; seasonal recentres to ~0; " +
      "edges carry NULL trend") {
    val rows = Season.stl1Decompose(spark, sf).collect()
    assert(rows.nonEmpty)
    val withTrend = rows.filter(!_.isNullAt(3))
    assert(withTrend.nonEmpty)
    withTrend.foreach { r =>
      val resid = r.getAs[Double]("rev2") - r.getAs[Double]("trend6") -
        r.getAs[Double]("seasonal6")
      assert(math.abs(resid - r.getAs[Double]("resid6")) < 2e-2,
        s"residual identity broke at ${r.get(0)}")
    }
    val seas = withTrend.map(r => r.getInt(1) ->
      r.getAs[Double]("seasonal6")).toMap
    assert(seas.size == 7)
    assert(math.abs(seas.values.sum) < 1e-5)
    // first and last 3 calendar days cannot have a full centered window
    val days = rows.map(_.getDate(0)).sortBy(_.getTime)
    val nullDays = rows.filter(_.isNullAt(3)).map(_.getDate(0)).toSet
    assert((days.take(3) ++ days.takeRight(3)).forall(nullDays.contains))
  }
}
