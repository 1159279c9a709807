package graft

import org.apache.spark.sql.functions._

import graft.queries.Robust

/** Causal/uncertainty batch: banded matching on a hand-solved toy +
  * caliper guarantees, stratified-ATE identities, conformal coverage
  * and a driver-side rank replay.
  */
class RobustSpec extends SparkSpec {
  import spark.implicits._

  test("nearestWithinCaliper: hand-solved toy — nearest wins, ties " +
      "break by control id, out-of-caliper stays unmatched") {
    val treated = Seq((1L, 10.0, 5L), (2L, 500.0, 7L))
      .toDF("id", "score", "y")
    val controls = Seq((10L, 7.0, 1L), (11L, 12.0, 2L),
      (12L, 8.0, 3L), (13L, 12.0, 4L))
      .toDF("id", "score", "y")
    val m = Robust.nearestWithinCaliper(treated, controls, 100.0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(4), r.getAs[Double]("adiff"))).toMap
    // id 1 (score 10): cands at |3|,|2|,|2|,|2| -> adiff 2 tie between
    // controls 11 and 13 -> lower id 11 wins
    assert(m(1) == (11L, 2.0))
    // id 2 (score 500): every control > 100 away -> unmatched
    assert(!m.contains(2L))
  }

  test("psm1: matched subset of treated; distance within caliper") {
    val r = Robust.psm1PropensityMatch(spark, sf).collect()(0)
    val nT = r.getLong(0); val nM = r.getLong(1)
    assert(nT > 0 && nM > 0 && nM <= nT)
    assert(r.getAs[Double]("avg_match_dist6") <= 100.0)
  }

  test("ate1: strata partition the customers; p6 = n_treated/n; " +
      "gap identity") {
    val rows = Robust.ate1StratifiedAte(spark, sf).collect()
    assert(rows.length == 10)
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == Tables.customer(spark, sf).count())
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("p6") -
        r.getAs[Long]("n_treated").toDouble / r.getAs[Long]("n"))
        < 1e-5)
      if (!r.isNullAt(r.fieldIndex("gap6"))) {
        assert(math.abs(r.getAs[Double]("gap6") -
          (r.getAs[Double]("yt_mean6") - r.getAs[Double]("yc_mean6")))
          < 1e-9)
      }
    }
  }

  test("conf1: qhat replays as the ceil(0.9(n+1))-th calibration " +
      "residual; coverage near the guarantee") {
    val rows = Robust.conf1SplitConformal(spark, sf).collect()
    assert(rows.length == 5)
    // driver-side replay for one segment
    val seg = rows.head.getString(0)
    val ords = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === seg)
      .select(col("o_orderkey").as("k"),
        col("o_totalprice").cast("decimal(18,2)").cast("double")
          .as("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val cal = ords.filter(_._1 % 2 == 0)
    val yhat = rows.head.getAs[Double]("yhat6")
    val rs = cal.map { case (k, v) =>
      (BigDecimal(math.abs(v - yhat)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, k)
    }.sorted
    val k9 = (cal.length * 9 + 18) / 10
    assert(math.abs(rows.head.getAs[Double]("qhat6") -
      rs(k9 - 1)._1) < 1e-6)
    rows.foreach { r =>
      val cov = r.getAs[Double]("cov6")
      assert(cov >= 0.8 && cov <= 1.0, s"${r.getString(0)}: $cov")
    }
  }
}
