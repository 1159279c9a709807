package graft

import org.apache.spark.sql.functions._

import graft.queries.Growth

/** Batch-six round-11 operators: ranking-metric goldens on planted
  * lists, LTV/growth conservation laws, and the Holt fold against a
  * driver-side sequential replay.
  */
class GrowthSpec extends SparkSpec {
  import spark.implicits._

  private def t(day: Int, hour: Int = 12) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("ndcg1: hand-solved planted rankings") {
    val dir = java.nio.file.Files.createTempDirectory("ndcg1").toString
    // u1: relevant item at rank 1 of 3 -> ndcg=1, rr=1
    // u2: single relevant at rank 2 -> dcg=1/log2(3), idcg=1, rr=1/2
    // u3: no purchase -> excluded
    val rows = Seq(
      (1L, 1L, "purchase", 30.0), (2L, 1L, "click", 20.0),
      (3L, 1L, "view", 10.0),
      (4L, 2L, "click", 30.0), (5L, 2L, "purchase", 20.0),
      (6L, 3L, "view", 9.0))
    rows.map { case (id, u, ty, v) => (id, t(1), u, ty, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Growth.ndcg1RankingMetrics(spark, dir).collect()(0)
    assert(r.getLong(0) == 2)
    val ndcg2 = 1.0 / (math.log(3.0) / math.log(2.0))
    assert(math.abs(r.getAs[Double]("ndcg10_6") - (1.0 + ndcg2) / 2) < 1e-6)
    assert(math.abs(r.getAs[Double]("mrr6") - 0.75) < 1e-9)
  }

  test("ndcg1: corpus metrics live in (0,1]; users with purchases counted") {
    val r = Growth.ndcg1RankingMetrics(spark, sf).collect()(0)
    val buyers = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().count()
    assert(r.getLong(0) == buyers)
    assert(r.getAs[Double]("ndcg10_6") > 0 && r.getAs[Double]("ndcg10_6") <= 1)
    assert(r.getAs[Double]("mrr6") > 0 && r.getAs[Double]("mrr6") <= 1)
  }

  test("ltv1: the curve is non-decreasing in age and conserves total revenue") {
    val out = Growth.ltv1CohortLtv(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getAs[Double]("ltv_per_user6")))
    out.groupBy(_._1).foreach { case (_, rows) =>
      val curve = rows.sortBy(_._2).map(_._4)
      assert(curve.zip(curve.tail).forall { case (a, b) => b >= a - 1e-9 })
    }
    // last-age LTV x cohort size summed over cohorts ~= total purchase revenue
    val total = out.groupBy(_._1).map { case (_, rows) =>
      val last = rows.maxBy(_._2); last._4 * last._3 }.sum
    val expect = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double"))
      .head().getDouble(0)
    assert(math.abs(total - expect) / expect < 1e-4)
  }

  test("wow1: growth replays from the weekly revenues; first week null") {
    val out = Growth.wow1WeeklyGrowth(spark, sf).collect().sortBy(_.getInt(0))
    assert(out.head.isNullAt(2))
    out.sliding(2).foreach {
      case Array(a, b) =>
        val g = (b.getAs[Double]("rev2") - a.getAs[Double]("rev2")) /
          a.getAs[Double]("rev2")
        assert(math.abs(b.getAs[Double]("growth6") - g) < 1e-4)
      case _ =>
    }
  }

  test("hol1: the in-plan fold equals a driver-side sequential replay") {
    val daily = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("y"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getDouble(1)))
      .sortBy(_._1).map(_._2)
    var l = daily(0); var b = daily(1) - daily(0)
    daily.drop(2).foreach { y =>
      val ln = 0.5 * y + 0.5 * (l + b)
      b = 0.5 * b + 0.5 * (ln - l)
      l = ln
    }
    val r = Growth.hol1HoltSmoothing(spark, sf).collect()(0)
    assert(r.getInt(0) == daily.length)
    assert(r.getAs[Double]("level6") ==
      BigDecimal(l).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("trend6") ==
      BigDecimal(b).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("hol1: a perfectly linear planted series is recovered exactly") {
    val dir = java.nio.file.Files.createTempDirectory("hol1").toString
    // y = 64 + 8*t: dyadic numbers -> the fold is exact, trend = 8
    val rows = (1 to 12).map { day =>
      (day.toLong, t(day), 1L, "purchase", 64.0 + 8.0 * day, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Growth.hol1HoltSmoothing(spark, dir).collect()(0)
    assert(r.getInt(0) == 12)
    // Holt tracks a linear series asymptotically: replay the dyadic
    // recursion (exact in doubles) and require convergence toward 8
    val ys = (1 to 12).map(day => 64.0 + 8.0 * day)
    var l = ys(0); var b = ys(1) - ys(0)
    ys.drop(2).foreach { y =>
      val ln = 0.5 * y + 0.5 * (l + b)
      b = 0.5 * b + 0.5 * (ln - l)
      l = ln
    }
    assert(r.getAs[Double]("level6") ==
      BigDecimal(l).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("trend6") ==
      BigDecimal(b).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(math.abs(r.getAs[Double]("trend6") - 8.0) < 0.5)
    assert(math.abs(r.getAs[Double]("forecast6") - (64.0 + 8.0 * 13)) < 5.0)
  }
}
