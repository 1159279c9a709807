package graft

import org.apache.spark.sql.functions._

import graft.queries.Behavior

/** Batch-one round-11 operators: attribution routing on a planted
  * journey, Welch t-test algebra, Benford/WOE invariants, and the
  * leave-one-out identity.
  */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  test("att1: planted journeys route purchases to the preceding touch") {
    val dir = java.nio.file.Files.createTempDirectory("att1").toString
    def t(day: Int, hour: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")
    // u1: click -> purchase (10) -> view -> purchase (20)
    // u2: purchase with no preceding touch -> direct
    // u3: checkout (non-touch) then purchase after a click: still click
    val rows = Seq(
      (1L, t(1, 1), 1L, "click", 1.0, "{}"),
      (2L, t(1, 2), 1L, "purchase", 10.0, "{}"),
      (3L, t(1, 3), 1L, "view", 1.0, "{}"),
      (4L, t(1, 4), 1L, "purchase", 20.0, "{}"),
      (5L, t(2, 1), 2L, "purchase", 5.0, "{}"),
      (6L, t(3, 1), 3L, "click", 1.0, "{}"),
      (7L, t(3, 2), 3L, "checkout", 1.0, "{}"),
      (8L, t(3, 3), 3L, "purchase", 7.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Behavior.att1LastTouch(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map(
      "click" -> ((2L, 17.0)), "view" -> ((1L, 20.0)),
      "direct" -> ((1L, 5.0))))
  }

  test("att1: every purchase is attributed exactly once on the real corpus") {
    val total = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    val out = Behavior.att1LastTouch(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum == total)
    assert(out.map(_.getString(0)).toSet.subsetOf(
      Set("click", "view", "direct")))
  }

  test("tt1: t/df reproduce a driver-side Welch computation") {
    val r = Behavior.tt1WelchTtest(spark, sf).collect()(0)
    val raw = Tables.events(spark, sf)
      .select(pmod(col("user_id"), lit(2)).cast("int"), col("value"))
      .collect().map(x => (x.getInt(0), BigDecimal(x.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    def stats(g: Int) = {
      val xs = raw.filter(_._1 == g).map(_._2)
      val n = xs.length
      val m = (xs.sum / n).toDouble
      val v = ((xs.map(x => x * x).sum).toDouble - m * xs.sum.toDouble) / (n - 1)
      (n, m, v)
    }
    val (n0, m0, v0) = stats(0); val (n1, m1, v1) = stats(1)
    val t = (m1 - m0) / math.sqrt(v0 / n0 + v1 / n1)
    val df = math.pow(v0 / n0 + v1 / n1, 2) /
      ((v0 / n0) * (v0 / n0) / (n0 - 1) + (v1 / n1) * (v1 / n1) / (n1 - 1))
    assert(r.getLong(0) == n0 && r.getLong(1) == n1)
    assert(math.abs(r.getAs[Double]("t6") - t) < 1e-5)
    assert(math.abs(r.getAs[Double]("df6") - df) < 1e-3)
    // df is between min(n)-1 and n0+n1-2 by construction
    assert(r.getAs[Double]("df6") >= math.min(n0, n1) - 1 &&
      r.getAs[Double]("df6") <= n0 + n1 - 2)
  }

  test("ben1: frequencies sum to 1, digits are 1-9, expected matches log10 law") {
    val out = Behavior.ben1Benford(spark, sf).collect()
    val digits = out.map(_.getInt(0)).sorted
    assert(digits.forall(dd => dd >= 1 && dd <= 9))
    assert(math.abs(out.map(_.getAs[Double]("freq6")).sum - 1.0) < 1e-4)
    out.foreach { r =>
      val d0 = r.getInt(0)
      assert(math.abs(r.getAs[Double]("benford6") -
        math.log10(1.0 + 1.0 / d0)) < 1e-6)
      assert(r.getAs[Double]("chi6") >= 0.0)
    }
  }

  test("woe1: IV contributions are non-negative and woe signs track rates") {
    val out = Behavior.woe1WeightOfEvidence(spark, sf).collect()
    val gTot = out.map(_.getLong(1)).sum.toDouble
    val bTot = out.map(_.getLong(2)).sum.toDouble
    out.foreach { r =>
      val gr = r.getLong(1) / gTot; val br = r.getLong(2) / bTot
      val woe = r.getAs[Double]("woe6")
      assert(math.abs(woe - math.log(gr / br)) < 1e-5)
      assert(r.getAs[Double]("iv6") >= -1e-9)
      assert((gr >= br) == (woe >= 0.0))
    }
  }

  test("te1: the leave-one-out identity holds per segment") {
    val out = Behavior.te1TargetEncode(spark, sf)
    val raw = Tables.orders(spark, sf).join(
        Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val bySeg = raw.groupBy(_._2).map { case (k, v) =>
      k -> ((v.map(_._3).sum, v.length)) }
    val got = out.collect().map(r =>
      r.getLong(0) -> ((r.getString(1), r.getAs[Double]("loo6")))).toMap
    assert(got.size == raw.length)
    raw.take(500).foreach { case (k, seg, x) =>
      val (s, n) = bySeg(seg)
      val expect = ((s - x) / (n - 1)).toDouble
      assert(got(k)._1 == seg)
      assert(math.abs(got(k)._2 - expect) < 1e-5)
    }
  }
}
