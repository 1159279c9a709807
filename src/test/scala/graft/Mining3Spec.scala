package graft

import org.apache.spark.sql.functions._

import graft.queries.Mining3

/** Batch-three round-10 operators: imputation median replay, planted
  * CUSUM changepoint, temperature-flattening direction, QQ decile
  * replay.
  */
class Mining3Spec extends SparkSpec {
  import spark.implicits._

  test("imp1: ~10% defined-missing, imputed rows carry the hand-computed lower median") {
    val rows = Mining3.imp1MedianImpute(spark, sf).collect()
    val missRate = rows.count(_.getAs[Int]("miss") == 1).toDouble / rows.length
    assert(missRate > 0.05 && missRate < 0.15)
    // replay one type's lower median from the raw table
    val raw = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def missing(id: Long): Boolean =
      ((id * 2654435761L) % 4294967296L) % 10 == 0
    val present = raw.filter(r => !missing(r._1) && r._2 == "purchase")
      .map(_._3).sorted
    val med = present((present.length + 1) / 2 - 1) // lower median, 1-based ceil(n/2)
    val imputed = rows.filter(r => r.getAs[Int]("miss") == 1 &&
      r.getString(1) == "purchase").map(_.getAs[Double]("value_imputed"))
    assert(imputed.nonEmpty && imputed.forall(_ == med.toDouble / 100))
    // non-missing rows keep their original value
    val orig = raw.map(r => r._1 -> r._3).toMap
    rows.filter(_.getAs[Int]("miss") == 0).take(100).foreach { r =>
      assert(r.getAs[Double]("value_imputed") ==
        orig(r.getLong(0)).toDouble / 100)
    }
  }

  test("cpt1: planted mean shift is located; exactly one changepoint flagged") {
    val dir = java.nio.file.Files.createTempDirectory("cpt1").toString
    val rows = (1 to 40).flatMap { day =>
      val v = if (day <= 20) 10.0 else 50.0
      (1 to 3).map(k => (day.toLong * 10 + k,
        java.sql.Timestamp.valueOf(f"2024-01-01 00:00:00")
          .toLocalDateTime.plusDays(day - 1).atZone(
            java.time.ZoneOffset.UTC).toInstant,
        1L, "click", v, "{}"))
    }
    rows.map { case (id, ts, u, t, v, p) =>
      (id, java.sql.Timestamp.from(ts), u, t, v, p)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Mining3.cpt1CusumChangepoint(spark, dir).collect()
    assert(out.count(_.getAs[Int]("is_changepoint") == 1) == 1)
    val cp = out.find(_.getAs[Int]("is_changepoint") == 1).get
      .getAs[java.sql.Date]("day").toLocalDate
    // |CUSUM| peaks at the last pre-shift day (2024-01-20)
    assert(cp == java.time.LocalDate.of(2024, 1, 20))
  }

  test("mix3: flattening direction — the dominant source is down-weighted relative to its share") {
    val dir = java.nio.file.Files.createTempDirectory("mix3").toString
    val docs =
      (1 to 900).map(i => (i.toLong, "big", (1 to 20).map(j => s"w$j").mkString(" "))) ++
        (901 to 1000).map(i => (i.toLong, "small", (1 to 20).map(j => s"w$j").mkString(" ")))
    docs.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val keyed = Mining3.mix3TemperatureSample(spark, dir)
      .select("source", "keep_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keyed("big") == 900000L) // dominant source anchors the scale
    // token share ratio is 9:1; sqrt-flattened keep ratio must be 3:1
    val ratio = keyed("big").toDouble / keyed("small")
    assert(math.abs(ratio - 3.0) < 0.01)
    // keeps are deterministic
    val k1 = Mining3.mix3TemperatureSample(spark, dir)
      .filter(col("keep") === 1).count()
    val k2 = Mining3.mix3TemperatureSample(spark, dir)
      .filter(col("keep") === 1).count()
    assert(k1 == k2 && k1 > 0)
  }

  test("qq1: deciles replay against a driver-side sort") {
    val raw = Tables.events(spark, sf)
      .select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def dec(et: String, q: Int): Long = {
      val xs = raw.filter(_._1 == et).map(_._2).sorted
      xs((q * xs.length + 9) / 10 - 1)
    }
    val out = Mining3.qq1QuantilePairs(spark, sf).collect()
    assert(out.length == 9)
    out.foreach { r =>
      val q = r.getLong(0).toInt
      assert(r.getAs[Long]("purchase_cents") == dec("purchase", q))
      assert(r.getAs[Long]("click_cents") == dec("click", q))
      assert(r.getAs[Long]("shift_cents") ==
        dec("purchase", q) - dec("click", q))
    }
  }
}
