package graft

import org.apache.spark.sql.functions._

import graft.queries.Seg

/** Ratio-CI and changepoint batch: delta-method identities, planted
  * level shifts recovered at the exact days.
  */
class SegSpec extends SparkSpec {
  import spark.implicits._

  test("rm1: both arms reported; CI brackets the ratio; ratio " +
      "replays from exact totals") {
    val rows = Seg.rm1RatioDeltaCi(spark, sf).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val ratio = r.getAs[Double]("ratio6")
      assert(r.getAs[Double]("ci_lo6") <= ratio &&
        ratio <= r.getAs[Double]("ci_hi6"))
      assert(r.getAs[Double]("se6") > 0)
    }
  }

  test("seg1: two planted level shifts are recovered at the exact " +
      "days") {
    val dir = java.nio.file.Files.createTempDirectory("seg1").toString
    def t(day: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // 24 days: level 100 (d1-8), 500 (d9-16), 100 (d17-24)
    val rows = (1 to 24).map { day =>
      val v = if (day >= 9 && day <= 16) 500.0 else 100.0
      (day.toLong, t(day), day.toLong, "purchase", v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val segs = Seg.seg1BinarySegmentation(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getAs[Double]("mean6"))).sortBy(_._1)
    // depth-2 segmentation must isolate the middle block: cuts at
    // day 8 and day 16 appear among the boundaries
    val starts = segs.map(_._2).toSet
    assert(starts.contains("2024-01-09"), s"segments: ${segs.toSeq}")
    assert(starts.contains("2024-01-17"), s"segments: ${segs.toSeq}")
    val mid = segs.find(_._2 == "2024-01-09").get
    assert(mid._3 == 8 && math.abs(mid._4 - 500.0) < 1e-6)
  }

  test("seg1 on the real corpus: segments partition the days") {
    val segs = Seg.seg1BinarySegmentation(spark, sf).collect()
    val nDays = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(to_date(col("ts"))).distinct().count()
    assert(segs.map(_.getLong(2)).sum == nDays)
    assert(segs.length >= 2 && segs.length <= 4)
  }
}
