package graft

import org.apache.spark.sql.functions._

import graft.queries.Panel

/** Panel/validation batch: fixed-effects identities on planted
  * confounding, CV fold algebra and the sufficient-statistics
  * complement identity.
  */
class PanelSpec extends SparkSpec {
  import spark.implicits._

  test("pid1: entity confounding that fools pooled OLS is removed by " +
      "the within estimator") {
    val dir = java.nio.file.Files.createTempDirectory("pid1").toString
    // two customers over 6 months; within each, spend = 100*x + noise0;
    // customer 2 has BOTH higher baseline spend and lower x -> pooled
    // OLS slope is dragged negative-ward, FE recovers ~100
    val rows = for {
      (ck, base, xs) <- Seq((1L, 0.0, Seq(3, 4, 5, 3, 4, 5)),
        (2L, 5000.0, Seq(1, 1, 2, 1, 2, 1)))
      (x, m) <- xs.zipWithIndex
      i <- 1 to x
    } yield (ck * 1000 + m * 10 + i, ck,
      java.sql.Timestamp.valueOf(f"2024-${m + 1}%02d-05 00:00:00"),
      (base + 100.0 * x) / x) // per-order price -> monthly sum = base+100x
    rows.map { case (ok, ck, ts, price) =>
      (ok, ck, "O", price, ts, "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val fe = Panel.pid1PanelFixedEffects(spark, dir).collect()(0)
    assert(fe.getLong(0) == 12)
    assert(math.abs(fe.getAs[Double]("fe_slope6") - 100.0) < 1e-3,
      s"FE slope ${fe.getAs[Double]("fe_slope6")} should recover 100")
  }

  test("cv1: folds partition the events; each fold's model equals an " +
      "OLS trained on its complement (driver replay)") {
    val rows = Panel.cv1KfoldOls(spark, sf).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Long]("n_test")).sum ==
      Tables.events(spark, sf).count())
    // driver replay for fold 0: OLS on all rows NOT in fold 0
    val base = Tables.events(spark, sf)
      .select((floor(col("ts").cast("long") / 3600) - lit(473352L))
        .as("x"), col("value").as("y"),
        pmod(col("event_id") * lit(2654435761L) + lit(11L),
          lit(4294967296L)).mod(5).cast("int").as("fold"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val train = base.filter(_._3 != 0)
    val n = train.length.toDouble
    val sx = train.map(_._1.toDouble).sum
    val sy = train.map(t => BigDecimal(t._2).setScale(2,
      BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val sxx = train.map(t => t._1.toDouble * t._1).sum
    val sxy = train.map(t => (BigDecimal(t._1) * BigDecimal(t._2)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP))).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val f0 = rows.find(_.getInt(0) == 0).get
    assert(math.abs(f0.getAs[Double]("slope6") - slope) < 1e-4,
      s"fold-0 slope ${f0.getAs[Double]("slope6")} vs replay $slope")
    rows.foreach(r => assert(r.getAs[Double]("mse6") > 0))
  }
}
