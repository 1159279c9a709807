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

  test("eb1: planted between-group variance -> partial shrinkage, " +
      "small groups shrink harder") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("eb1").toString
    // brands A (big, mean 100) and B (small, mean 900), within-noise
    // +-10: tau2 >> 0, so weights sit strictly inside (0, 1) and the
    // small group shrinks harder
    val rows =
      (1 to 400).map(i => (i.toLong, 1L, 100.0 + (i % 21) - 10)) ++
      (1 to 20).map(i => (400L + i, 2L, 900.0 + (i % 21) - 10))
    rows.toDF("l_orderkey", "l_partkey", "l_extendedprice")
      .select(col("l_orderkey"), col("l_partkey"), lit(1L).as("l_suppkey"),
        lit(1).as("l_linenumber"), lit(1.0).as("l_quantity"),
        col("l_extendedprice"), lit(0.0).as("l_discount"),
        lit(0.0).as("l_tax"), lit("N").as("l_returnflag"),
        lit("O").as("l_linestatus"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
          .as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "big", "BrandA", "t", 1, 1.0), (2L, "small", "BrandB",
      "t", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = Meta.eb1ShrunkMeans(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("raw_mean6"),
        r.getAs[Double]("weight6"), r.getAs[Double]("shrunk6"))).toMap
    val (rawB, wB, shrB) = out("BrandB")
    val (rawA, wA, shrA) = out("BrandA")
    assert(wA > 0.9 && wB > 0 && wB < 1 && wA > wB,
      s"weights A=$wA B=$wB: bigger group must trust its raw mean more")
    assert(shrB < rawB && shrB > rawA,
      "the small group's mean shrinks toward (not past) the grand")
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
