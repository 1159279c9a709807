package graft

import org.apache.spark.sql.functions._

import graft.queries.Strat

/** Stratified-test batch: log-rank null behavior on symmetric arms,
  * planted separation detection; CMH identities on planted
  * confounding.
  */
class StratSpec extends SparkSpec {
  import spark.implicits._

  private def t(day: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("lr1: variance positive, z finite on the real corpus; O-E " +
      "sums replay driver-side") {
    val r = Strat.lr1LogRank(spark, sf).collect()(0)
    assert(r.getLong(0) > 0)
    assert(r.getAs[Double]("v_sum6") > 0)
    assert(!r.getAs[Double]("z6").isNaN)
    // |z| should be modest on a hash split (no real arm difference)
    assert(math.abs(r.getAs[Double]("z6")) < 4.0,
      s"null split z ${r.getAs[Double]("z6")}")
  }

  test("lr1: a planted fast-converting arm drives |z| large") {
    val dir = java.nio.file.Files.createTempDirectory("lr1").toString
    // choose user ids by their REAL knuth arm so the planted
    // difference aligns with the query's own hash split
    def arm(u: Long) = ((u * 2654435761L + 23L) % 4294967296L % 2).toInt
    val armA = (1L to 400L).filter(arm(_) == 0).take(60)
    val armB = (1L to 400L).filter(arm(_) == 1).take(60)
    // arm 0 converts on day 2; arm 1 never converts (censored)
    val rows =
      armA.zipWithIndex.flatMap { case (u, i) => Seq(
        (i * 2L, t(1), u, "view", 1.0, "{}"),
        (i * 2L + 1, t(3), u, "purchase", 1.0, "{}")) } ++
      armB.zipWithIndex.map { case (u, i) =>
        (10000L + i, t(1), u, "view", 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Strat.lr1LogRank(spark, dir).collect()(0)
    assert(math.abs(r.getAs[Double]("z6")) > 5.0,
      s"planted separation must be detected, z=${r.getAs[Double]("z6")}")
    assert(r.getLong(1) == 60) // all observed deaths are arm 0's
  }

  test("cmh1: chi2 >= 0; OR positive; a planted stratified " +
      "association is detected with OR on the right side") {
    val real = Strat.cmh1MantelHaenszel(spark, sf).collect()(0)
    assert(real.getAs[Double]("cmh_chi2_6") >= 0)
    val dir = java.nio.file.Files.createTempDirectory("cmh1").toString
    // two strata; within EACH, exposed customers have open orders at
    // 3x the rate -> OR_MH > 1 and chi2 large
    val custRows = (1L to 400L).map { i =>
      val stratum = (i % 2).toInt
      val exposed = i % 4 < 2
      (i, s"c$i", stratum, 0.0,
        if (exposed) "BUILDING" else "MACHINERY")
    }
    custRows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment").write.mode("overwrite")
      .parquet(s"$dir/customer.parquet")
    val orderRows = custRows.zipWithIndex.flatMap { case ((i, _, _, _,
        seg), k) =>
      val exposed = seg == "BUILDING"
      val hasOpen = if (exposed) i % 10 < 6 else i % 10 < 2
      if (hasOpen) Seq((k.toLong, i, "O", 10.0, t(2), "1-URGENT"))
      else Seq.empty
    }
    orderRows.toDF("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Strat.cmh1MantelHaenszel(spark, dir).collect()(0)
    assert(r.getLong(0) == 2)
    assert(r.getAs[Double]("or_mh6") > 3.0,
      s"planted OR ${r.getAs[Double]("or_mh6")}")
    assert(r.getAs[Double]("cmh_chi2_6") > 10.0)
  }
}
