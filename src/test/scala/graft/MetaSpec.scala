package graft

import org.apache.spark.sql.functions._

import graft.queries.Meta

/** Meta-analysis batch: BH step-up law and driver replay, shrinkage
  * bounds and direction.
  */
class MetaSpec extends SparkSpec {

  test("bh1: p in [0,1]; rejections are a prefix of the p-sorted " +
      "battery and replay the BH rule") {
    val rows = Meta.bh1FdrBattery(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getAs[Double]("p6"),
        r.getInt(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, p, rej) =>
      assert(p >= 0 && p <= 1.0 + 1e-9)
      assert(rej == 0 || rej == 1)
    }
    val sorted = rows.sortBy(t => (t._3, t._1, t._2))
    // prefix property
    val firstKeep = sorted.indexWhere(_._4 == 0)
    if (firstKeep >= 0)
      assert(sorted.drop(firstKeep).forall(_._4 == 0),
        "rejections must form a prefix in p-order")
    // BH replay
    val m = sorted.length
    val ks = sorted.zipWithIndex.collect {
      case ((_, _, p, _), i) if p <= (i + 1).toDouble * 0.05 / m => i
    }
    val k = if (ks.nonEmpty) ks.max + 1 else 0
    assert(sorted.count(_._4 == 1) == k,
      s"BH cut $k vs ${sorted.count(_._4 == 1)} rejections")
  }

  test("eb1: weights in [0,1]; every shrunk mean sits between its " +
      "raw mean and the grand mean") {
    val rows = Meta.eb1ShrunkMeans(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getAs[Double]("raw_mean6"), r.getAs[Double]("weight6"),
        r.getAs[Double]("shrunk6")))
    assert(rows.length == 25)
    val totN = rows.map(_._2).sum.toDouble
    val grand = rows.map(t => t._3 * t._2).sum / totN
    rows.foreach { case (b, _, raw, w, shrunk) =>
      assert(w >= 0 && w <= 1, s"$b weight $w")
      val lo = math.min(raw, grand) - 1e-4
      val hi = math.max(raw, grand) + 1e-4
      assert(shrunk >= lo && shrunk <= hi,
        s"$b: shrunk $shrunk outside [$lo, $hi]")
    }
  }
}
