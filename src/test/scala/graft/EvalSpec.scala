package graft

import org.apache.spark.sql.functions._

import graft.queries.Eval

/** Model-eval suite: per-slice AUC rank-sum replay, PR/lift curve
  * algebra and tie-inclusive threshold semantics.
  */
class EvalSpec extends SparkSpec {

  test("auc2: one slice's AUC replays via the driver rank-sum; all slices in (0,1)") {
    val out = Eval.auc2SlicedAuc(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("auc6")).toMap
    assert(out.size == 7)
    assert(out.values.forall(a => a > 0.0 && a < 1.0))
    val raw = Tables.events(spark, sf)
      .select(dayofweek(col("ts")).cast("long").as("slice"), col("value"),
        (col("event_type") === "purchase").cast("int").as("pos"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val slice = raw.head._1
    val xs = raw.filter(_._1 == slice)
    val pos = xs.filter(_._3 == 1).map(_._2)
    val neg = xs.filter(_._3 == 0).map(_._2)
    var s = 0.0
    pos.foreach { p =>
      neg.foreach { n =>
        s += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
      }
    }
    val expected = BigDecimal(s / (pos.length.toLong * neg.length))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(slice) - expected) < 1e-9)
  }

  test("prc1: PR algebra, monotone recall, tie-inclusive thresholds, one best-F1") {
    val rows = Eval.prc1PrLiftCurve(spark, sf).collect().sortBy(_.getLong(0))
    assert(rows.length == 9)
    assert(rows.map(_.getAs[Int]("best_f1")).sum == 1)
    val recalls = rows.map(_.getAs[Double]("recall6"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b })
    val raw = Tables.events(spark, sf)
      .select(round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").cast("int").as("pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val n = raw.length
    val nPos = raw.count(_._2 == 1)
    rows.foreach { r =>
      val t = r.getAs[Long]("thresh_cents")
      val sel = raw.filter(_._1 >= t) // tie-inclusive by construction
      assert(r.getAs[Long]("n_selected") == sel.length.toLong)
      assert(r.getAs[Long]("tp") == sel.count(_._2 == 1).toLong)
      // selected count stays within one decile's tie-slack of the target
      val q = r.getLong(0)
      assert(sel.length >= (q * n + 9) / 10 - (n / 10))
      val lift = r.getAs[Double]("lift6")
      val expLift = BigDecimal(sel.count(_._2 == 1).toDouble * n /
        (sel.length.toDouble * nPos))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(lift - expLift) < 1e-9)
    }
  }
}
