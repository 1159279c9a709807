package graft

import org.apache.spark.sql.functions._

import graft.queries.Exp

/** Experimentation batch: SPRT trace replay, CUPED variance-shrink
  * law, SRM partition identity.
  */
class ExpSpec extends SparkSpec {

  test("sprt1: the LLR trace replays driver-side; decisions follow " +
      "the Wald boundaries") {
    val rows = Exp.sprt1SequentialLlr(spark, sf).collect()
      .sortBy(_.getDate(0).getTime)
    assert(rows.nonEmpty)
    def r6(v: Double) = BigDecimal(v).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    var llr = BigDecimal(0)
    val bound = math.log(19.0)
    rows.foreach { r =>
      val term = if (r.getInt(1) == 1) r6(math.log(0.55 / 0.5))
        else r6(math.log(0.45 / 0.5))
      llr += BigDecimal(term)
      assert(math.abs(r.getAs[Double]("llr6") - llr.toDouble) < 1e-9)
      val want = if (llr.toDouble >= bound) "accept_h1"
        else if (llr.toDouble <= -bound) "accept_h0" else "continue"
      assert(r.getString(3) == want)
    }
  }

  test("cuped1: adjustment shrinks the variance in BOTH arms and " +
      "users partition") {
    val rows = Exp.cuped1VarianceReduction(spark, sf).collect()
    assert(rows.length == 2)
    val buyers = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == buyers)
    // theta minimizes the POOLED residual variance (the guarantee);
    // per-arm shrink holds up to random-split noise
    rows.foreach { r =>
      assert(r.getAs[Double]("var_adj4") <=
        r.getAs[Double]("var_post4") * 1.1 + 1e-9,
        s"arm ${r.getInt(0)}: CUPED inflated an arm's variance >10%")
    }
    val pooled = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(when(dayofmonth(col("ts")) <= 15, col("value"))
        .otherwise(0.0)).as("pre"),
        sum(when(dayofmonth(col("ts")) > 15, col("value"))
          .otherwise(0.0)).as("post"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val n = pooled.length.toDouble
    val xb = pooled.map(_._1).sum / n
    val yb = pooled.map(_._2).sum / n
    val cov = pooled.map(t => (t._1 - xb) * (t._2 - yb)).sum
    val vx = pooled.map(t => (t._1 - xb) * (t._1 - xb)).sum
    val theta = cov / vx
    val vPost = pooled.map(t => (t._2 - yb) * (t._2 - yb)).sum
    val vAdj = pooled.map { case (x, y) =>
      val a = y - theta * (x - xb)
      (a - yb) * (a - yb)
    }.sum
    assert(vAdj <= vPost + 1e-6, "pooled CUPED variance must shrink")
  }

  test("srm1: arms partition the distinct users; chi2 >= 0") {
    val r = Exp.srm1SampleRatio(spark, sf).collect()(0)
    val users = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(r.getLong(0) + r.getLong(1) == users)
    assert(r.getAs[Double]("chi2_6") >= 0)
    assert(Set(0, 1).contains(r.getInt(3)))
  }
}
