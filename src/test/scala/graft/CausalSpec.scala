package graft

import org.apache.spark.sql.functions._

import graft.queries.Causal

/** Batch-six round-10 operators: DiD cell algebra, Kaplan-Meier on a
  * hand-solvable planted cohort, UCB1 invariants.
  */
class CausalSpec extends SparkSpec {
  import spark.implicits._

  test("did1: the estimate is exactly the four-cell identity; cells replay") {
    val r = Causal.did1DiffInDiff(spark, sf).collect()(0)
    val (pt, pot, pc, poc) = (r.getAs[Double]("pre_treat6"),
      r.getAs[Double]("post_treat6"), r.getAs[Double]("pre_ctrl6"),
      r.getAs[Double]("post_ctrl6"))
    val did = r.getAs[Double]("did6")
    assert(math.abs(did - ((pot - pt) - (poc - pc))) < 5e-6)
    val raw = Tables.events(spark, sf)
      .select(col("value"), pmod(col("user_id"), lit(2)).cast("int"),
        (col("ts") >= expr("TIMESTAMP '2024-01-16 00:00:00'")).cast("int"))
      .collect().map(r => (r.getDouble(0), r.getInt(1), r.getInt(2)))
    def mean(t: Int, p: Int) = {
      val xs = raw.filter(x => x._2 == t && x._3 == p).map(_._1)
      BigDecimal(xs.map(BigDecimal(_)).sum.toDouble / xs.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(math.abs(pt - mean(1, 0)) < 1e-9)
    assert(math.abs(poc - mean(0, 1)) < 1e-9)
  }

  test("surv1: planted cohort reproduces the hand-solved KM curve; censoring respected") {
    val dir = java.nio.file.Files.createTempDirectory("surv1").toString
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00")
    // 4 users all start day 1. u1 buys day 2 (t=1), u2 buys day 4
    // (t=3), u3 and u4 never buy (censored at 2024-01-31, t=30).
    val rows = Seq(
      (1L, t(1), 1L, "click", 1.0, "{}"), (2L, t(2), 1L, "purchase", 1.0, "{}"),
      (3L, t(1), 2L, "click", 1.0, "{}"), (4L, t(4), 2L, "purchase", 1.0, "{}"),
      (5L, t(1), 3L, "click", 1.0, "{}"), (6L, t(9), 3L, "view", 1.0, "{}"),
      (7L, t(1), 4L, "view", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Causal.surv1KaplanMeier(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getAs[Double]("s6")))).toMap
    // death times: t=1 (n=4,d=1 -> S=0.75), t=3 (n=3,d=1 -> S=0.5)
    assert(out.keySet == Set(1L, 3L))
    assert(out(1L) == ((4L, 1L, 0.75)))
    assert(out(3L) == ((3L, 1L, 0.5)))
  }

  test("surv1: S is non-increasing in (0,1] on the real corpus") {
    val s = Causal.surv1KaplanMeier(spark, sf).collect()
      .sortBy(_.getLong(0)).map(_.getAs[Double]("s6"))
    assert(s.nonEmpty && s.forall(x => x >= 0.0 && x <= 1.0))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a })
  }

  test("ucb1: one best arm; bonus positive and shrinking in n") {
    val rows = Causal.ucb1BanditScores(spark, sf).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Int]("best")).sum == 1)
    rows.foreach { r =>
      val bonus = r.getAs[Double]("ucb6") - r.getAs[Double]("mean6")
      assert(bonus > 0.0)
      val n = r.getAs[Long]("n")
      val bigN = rows.map(_.getAs[Long]("n")).sum
      val expected = math.sqrt(math.log(bigN.toDouble) * 2 / n)
      assert(math.abs(bonus - expected) < 1e-5)
    }
  }
}
