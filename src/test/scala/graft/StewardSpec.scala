package graft

import org.apache.spark.sql.functions._

import graft.queries.Steward

/** Batch-seven round-11 operators: privacy-audit laws, Laplace-noise
  * algebra, and survivorship rules on planted duplicate groups.
  */
class StewardSpec extends SparkSpec {
  import spark.implicits._

  test("anon1: group sizes sum to the table; risky flags exactly k<5") {
    val out = Steward.anon1KAnonymity(spark, sf).collect()
    assert(out.map(_.getLong(2)).sum == Tables.customer(spark, sf).count())
    out.foreach { r =>
      assert((r.getInt(4) == 1) == (r.getLong(2) < 5))
      assert(r.getLong(3) <= r.getLong(2)) // l-diversity <= group size
      assert(r.getLong(3) >= 1)
    }
  }

  test("dp1: noise is deterministic, zero-mean-bounded, count-independent") {
    val a = Steward.dp1NoisyCounts(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getAs[Double]("noise6"),
        r.getAs[Double]("n_noisy6")))).toMap
    val b = Steward.dp1NoisyCounts(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("noise6")).toMap
    a.foreach { case (k, (n, noise, noisy)) =>
      assert(b(k) == noise)                       // rerun-deterministic
      assert(math.abs(noisy - (n + noise)) < 1e-6)
      assert(math.abs(noise) < 20.0)              // Laplace(1) tail sanity
    }
  }

  test("dp1: the same type gets the same noise at both scales (key-derived)") {
    val small = Steward.dp1NoisyCounts(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("noise6")).toMap
    val big = Steward.dp1NoisyCounts(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("noise6")).toMap
    small.keySet.intersect(big.keySet).foreach { k =>
      assert(small(k) == big(k))
    }
  }

  test("gld1: planted duplicates merge by the survivorship rules") {
    val dir = java.nio.file.Files.createTempDirectory("gld1").toString
    Seq(
      (7L, "red widget", "acme", "t", 4, 10.00),
      (3L, "red widget", "acme", "t", 8, 12.50),
      (9L, "red widget", "bolt", "t", 6, 11.00),
      (5L, "lone gear", "zeta", "t", 2, 3.25))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = Steward.gld1GoldenRecord(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getInt(4), r.getAs[Double]("max_price2")))).toMap
    // golden id = min key; brand mode = acme (2 votes); median size of
    // {4,6,8} = 6 (lower median); price = max
    assert(out("red widget") == ((3L, 3L, "acme", 6, 12.50)))
    assert(out("lone gear") == ((5L, 1L, "zeta", 2, 3.25)))
  }

  test("gld1: one golden record per distinct name; ids exist in the source") {
    val out = Steward.gld1GoldenRecord(spark, sf)
    val names = Tables.part(spark, sf).select(col("p_name")).distinct().count()
    assert(out.count() == names)
    val ids = out.select(col("golden_id")).as[Long].collect().toSet
    val keys = Tables.part(spark, sf).select(col("p_partkey")).as[Long]
      .collect().toSet
    assert(ids.subsetOf(keys))
  }
}
