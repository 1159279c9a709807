package graft

import org.apache.spark.sql.functions._

import graft.queries.Warp

/** Batch-eight round-11 operators: the in-plan DTW fold against a
  * driver-side DP replay, runs-test counting laws, and the weighted-
  * median pick.
  */
class WarpSpec extends SparkSpec {
  import spark.implicits._

  private def t(day: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  private def dtwRef(a: Seq[Double], b: Seq[Double]): Double = {
    val big = 1e308
    var prev = 0.0 +: Array.fill(b.length)(big).toSeq
    a.foreach { av =>
      val cur = Array.fill(b.length + 1)(big)
      var j = 1
      while (j <= b.length) {
        cur(j) = math.abs(av - b(j - 1)) +
          math.min(math.min(prev(j - 1), prev(j)), cur(j - 1))
        j += 1
      }
      prev = cur.toSeq
    }
    prev.last
  }

  test("dtw1: the nested fold equals a driver-side DP replay on the corpus") {
    val daily = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"),
        pmod(col("user_id"), lit(2)).cast("int").as("g"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("y"))
      .collect().map(r => (r.getInt(1), r.getDate(0).toLocalDate, r.getDouble(2)))
    val ya = daily.filter(_._1 == 1).sortBy(_._2.toEpochDay).map(_._3).toSeq
    val yb = daily.filter(_._1 == 0).sortBy(_._2.toEpochDay).map(_._3).toSeq
    val r = Warp.dtw1SeriesWarp(spark, sf).collect()(0)
    assert(r.getInt(0) == ya.length && r.getInt(1) == yb.length)
    val expect = BigDecimal(dtwRef(ya, yb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("dtw6") == expect)
  }

  test("dtw1: identical planted series warp to zero; shifted series don't") {
    val dir = java.nio.file.Files.createTempDirectory("dtw1").toString
    // both groups see the same daily totals -> DTW 0
    val rows = (1 to 6).flatMap { day =>
      Seq((day.toLong * 2, t(day), 1L, "purchase", 10.0 + day, "{}"),
        (day.toLong * 2 + 1, t(day), 2L, "purchase", 10.0 + day, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Warp.dtw1SeriesWarp(spark, dir).collect()(0)
    assert(r.getAs[Double]("dtw6") == 0.0)
  }

  test("run1: runs count and moments on a planted alternating series") {
    val dir = java.nio.file.Files.createTempDirectory("run1").toString
    // strictly alternating up/down: revenue 10,20,10,20,... -> every
    // change is a new run: n_changes=7, runs=7
    val vals = Seq(10.0, 20.0, 10.0, 20.0, 10.0, 20.0, 10.0, 20.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, t(i + 1), 1L, "purchase", v, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Warp.run1RunsTest(spark, dir).collect()(0)
    assert(r.getLong(0) == 7)   // 7 changes, all alternating
    assert(r.getLong(1) == 4 && r.getLong(2) == 3)
    assert(r.getAs[Double]("z6") > 0) // more runs than expected
  }

  test("run1: corpus invariants — runs between 1 and n_changes") {
    val r = Warp.run1RunsTest(spark, sf).collect()(0)
    val total = r.getLong(1) + r.getLong(2)
    assert(r.getLong(0) >= 1 && r.getLong(0) <= total)
  }

  test("wmed1: weighted median matches a driver-side cumulative pick") {
    val rows = Tables.lineitem(spark, sf)
      .select(round(col("l_extendedprice") * 100, 0).cast("long"),
        round(col("l_quantity"), 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byCents = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    val totw = byCents.map(_._2).sum
    var cum = 0L
    val med = byCents.find { case (_, w) => cum += w; cum * 2 >= totw }.get._1
    val r = Warp.wmed1WeightedMedian(spark, sf).collect()(0)
    assert(r.getAs[Double]("weighted_median2") == med / 100.0)
    assert(r.getLong(1) == totw)
  }
}
