package graft

import org.apache.spark.sql.functions._

import graft.queries.Fit

/** Robust-fit batch: Huber vs OLS under a planted outlier, Spearman
  * invariance under monotone transforms, histogram/pair conservation.
  */
class FitSpec extends SparkSpec {
  import spark.implicits._

  private def t(day: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("hub1: a planted outlier day drags OLS but barely moves the " +
      "Huber slope") {
    val dir = java.nio.file.Files.createTempDirectory("hub1").toString
    // clean line y = 100 + 10x over 20 days, one wild day at x=10
    val rows = (1 to 20).flatMap { day =>
      val base = 100.0 + 10.0 * (day - 1)
      val v = if (day == 11) base + 20000.0 else base
      Seq((day.toLong, t(day), day.toLong, "purchase", v, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Fit.hub1HuberTrend(spark, dir).collect()(0)
    assert(r.getLong(0) == 20)
    val ols = r.getAs[Double]("ols_slope6")
    val hub = r.getAs[Double]("hub_slope6")
    assert(math.abs(hub - 10.0) < 1.0,
      s"huber slope $hub should hug the clean 10.0")
    assert(math.abs(ols - 10.0) > 3 * math.abs(hub - 10.0),
      s"OLS $ols should be dragged far harder than Huber $hub")
  }

  test("srk1: rho in [-1, 1]; a perfectly monotone pairing gives " +
      "rho 1 through any monotone transform") {
    val r = Fit.srk1SpearmanRank(spark, sf).collect()(0)
    val rho = r.getAs[Double]("rho6")
    assert(rho >= -1.0 && rho <= 1.0)
    // planted: v2 = exp-ish monotone of v1 (with ties) -> rho = 1
    val dir = java.nio.file.Files.createTempDirectory("srk1").toString
    (1L to 40L).map(i => (i, i / 2 * 1.0, "X"))
      .toDF("o_orderkey", "o_totalprice", "o_orderpriority")
      .withColumn("o_custkey", col("o_orderkey"))
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderdate", lit(t(1)))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    (1L to 40L).map(i => (i, s"c$i", 1, ((i / 2) * (i / 2)).toDouble,
      "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val rp = Fit.srk1SpearmanRank(spark, dir).collect()(0)
    assert(rp.getLong(0) == 40)
    assert(math.abs(rp.getAs[Double]("rho6") - 1.0) < 1e-9,
      s"monotone pairing must give rho 1, got ${rp.getAs[Double]("rho6")}")
  }

  test("dd15: bucket histogram conserves the dd7 pair count; buckets " +
      "sit in [0.8, 1.0]") {
    val hist = Fit.dd15ThresholdSweep(spark, sf).collect()
    val total = hist.map(_.getAs[Long]("n_pairs")).sum
    val dd7 = graft.dedup.Dedup.exactJaccardPairs(
      Tables.documents(spark, sf), "doc_id", "text",
      threshold = 0.8).count()
    assert(total == dd7)
    hist.foreach { r =>
      val lo = r.getAs[Double]("lo")
      assert(lo >= 0.8 - 1e-9 && lo <= 1.0 + 1e-9, s"bucket lo $lo")
    }
  }
}
