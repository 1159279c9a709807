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

  test("yuen1: planted extreme outliers cannot move the trimmed " +
      "means; null split t is finite and modest on the corpus") {
    val real = Strat.yuen1TrimmedTtest(spark, sf).collect()(0)
    assert(real.getLong(0) > 0 && real.getLong(1) > 0)
    if (!real.isNullAt(real.fieldIndex("yuen_t6")))
      assert(math.abs(real.getAs[Double]("yuen_t6")) < 4.0)
    def armOf(u: Long) = ((u * 2654435761L + 23L) % 4294967296L % 2).toInt
    val dir = java.nio.file.Files.createTempDirectory("yuen").toString
    // both arms: values 1..50 (identical); arm 0 additionally gets 5
    // enormous outliers that 20% trimming must erase entirely
    val a0 = (1L to 300L).filter(armOf(_) == 0).take(55)
    val a1 = (1L to 300L).filter(armOf(_) == 1).take(50)
    val rows =
      a0.take(50).zipWithIndex.map { case (u, i) =>
        (i.toLong, t(1), u, "purchase", (i % 50 + 1).toDouble, "{}") } ++
      a0.drop(50).zipWithIndex.map { case (u, i) =>
        (1000L + i, t(1), u, "purchase", 1.0e6, "{}") } ++
      a1.zipWithIndex.map { case (u, i) =>
        (2000L + i, t(1), u, "purchase", (i % 50 + 1).toDouble, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Strat.yuen1TrimmedTtest(spark, dir).collect()(0)
    // the five 1e6 outliers sit far outside arm 0's kept band, so the
    // trimmed means stay close despite a poisoned raw mean
    assert(math.abs(r.getAs[Double]("tm_a6") -
      r.getAs[Double]("tm_b6")) < 10.0,
      s"trimmed means ${r.get(2)} vs ${r.get(3)}")
  }
}
