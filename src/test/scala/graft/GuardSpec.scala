package graft

import org.apache.spark.sql.functions._

import graft.queries.Guard

/** Governance batch: fairness-rate identities, PSI drift laws on
  * planted shift.
  */
@graft.tags.Slow
class GuardSpec extends SparkSpec {
  import spark.implicits._

  test("fair1: reference group scores di 1.0; rates are exact-count " +
      "rationals") {
    val rows = Guard.fair1BiasAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    val refRow = rows.maxBy(r => (r.getLong(1), // max n, ties by lang
      -r.getString(0).codePointAt(0)))
    val byN = rows.sortBy(r => (-r.getLong(1), r.getString(0))).head
    assert(math.abs(byN.getAs[Double]("di_ratio6") - 1.0) < 1e-9,
      s"reference group ${byN.getString(0)} must have DI exactly 1")
    rows.foreach { r =>
      val n = r.getLong(1)
      assert(r.getAs[Double]("sel_rate6") >= 0 &&
        r.getAs[Double]("sel_rate6") <= 1)
      assert(n > 0)
    }
    assert(refRow != null)
  }

  test("psi1: identical halves give ~zero PSI; a planted shift " +
      "trips the 0.2 flag") {
    val dir = java.nio.file.Files.createTempDirectory("psi").toString
    def t(day: Int, i: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:${i % 60}%02d:00")
    // 'stable': same uniform values both halves -> PSI ~ 0
    // 'shifted': reference uniform 0-99, current shifted +200
    val rows = (0 until 600).flatMap { i =>
      val day = if (i % 2 == 0) 5 else 20
      Seq(
        (i.toLong * 2, t(day, i), i.toLong, "stable",
          (i % 100).toDouble, "{}"),
        (i.toLong * 2 + 1, t(day, i), i.toLong, "shifted",
          (if (day <= 15) i % 100 else 200 + i % 100).toDouble, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Guard.psi1Stability(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("stable").getAs[Double]("psi6") < 0.05,
      s"stable PSI ${out("stable").getAs[Double]("psi6")}")
    assert(out("shifted").getAs[Double]("psi6") > 0.2)
    assert(out("shifted").getAs[Int]("drift_flag") == 1)
    assert(out("stable").getAs[Int]("drift_flag") == 0)
  }

  test("psi1 on the real corpus: every event counted once") {
    val rows = Guard.psi1Stability(spark, sf).collect()
    val total = rows.map(r => r.getAs[Long]("n_ref") +
      r.getAs[Long]("n_cur")).sum
    assert(total == Tables.events(spark, sf).count())
  }
}
