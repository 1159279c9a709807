package graft

import org.apache.spark.sql.functions._

import graft.queries.Signals

/** Batch-five round-11 operators: PPR mass conservation and locality,
  * feature-hashing width/sign laws, degree-distribution consistency,
  * and Otsu on a hand-solvable bimodal histogram.
  */
class SignalsSpec extends SparkSpec {
  import spark.implicits._

  private def t(day: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("ppr1: seed holds the max score; total mass stays in (0, 1]") {
    val out = Signals.ppr1PersonalizedPagerank(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("score6")).toMap
    assert(out.nonEmpty)
    val seed = out.keys.min  // the builder seeds min(node)... verify below
    val top = out.maxBy { case (n, s) => (s, -n) }
    assert(top._1 == seed || out(seed) >= 0.15 - 1e-6,
      s"seed $seed score ${out.get(seed)}")
    val mass = out.values.sum
    assert(mass > 0.0 && mass <= 1.0 + 1e-6)
  }

  test("ppr1: on a planted triangle plus far clique, mass stays on the seed side") {
    val dir = java.nio.file.Files.createTempDirectory("ppr1").toString
    // two disconnected cliques; seed = min node = 1 -> clique {7,8,9}
    // must score 0
    val li = Seq(
      (101L, 1L), (101L, 2L), (101L, 3L),
      (102L, 1L), (102L, 2L), (102L, 3L),
      (103L, 7L), (103L, 8L), (103L, 9L),
      (104L, 7L), (104L, 8L), (104L, 9L))
    li.map { case (ok, pk) =>
        (ok, pk, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t(1)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Signals.ppr1PersonalizedPagerank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("score6")).toMap
    assert(out.keySet.subsetOf(Set(1L, 2L, 3L)))
    assert(out(1L) > out.getOrElse(2L, 0.0))
  }

  test("fh1: buckets in [0,64); weights bounded by doc token count") {
    val out = Signals.fh1FeatureHash(spark, sf)
    assert(out.agg(min(col("bucket"))).head().getLong(0) >= 0)
    assert(out.agg(max(col("bucket"))).head().getLong(0) < 64)
    val perDoc = out.groupBy("doc_id")
      .agg(sum(abs(col("weight"))).as("aw"), count(lit(1)).as("nb"))
    val toks = Tables.documents(spark, sf).select(col("doc_id"),
      size(split(lower(trim(col("text"))), "\\s+")).as("nt"))
    val joined = perDoc.join(toks, "doc_id").collect()
    joined.foreach { r =>
      assert(r.getAs[Long]("aw") <= r.getAs[Int]("nt"))
      assert(r.getAs[Long]("nb") <= 64)
    }
  }

  test("fh1: same word always lands in the same (bucket, sign)") {
    val toks = Signals.fh1FeatureHash(spark, sf)
    // determinism across two independent evaluations
    val a = toks.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Signals.fh1FeatureHash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("deg1: histogram mass equals node count; slope constant across rows") {
    val out = Signals.deg1DegreeDistribution(spark, sf).collect()
    val nodes = out.map(r => r.getLong(1)).sum
    val g = graft.queries.Trend.lp1LabelProp(spark, sf).count()
    assert(nodes == g)
    assert(out.map(_.getAs[Double]("slope6")).distinct.length == 1)
  }

  test("ots1: a planted bimodal histogram cuts between the modes") {
    val dir = java.nio.file.Files.createTempDirectory("ots1").toString
    val rows = ((1 to 50).map(i => 10.5) ++ (1 to 50).map(i => 90.5))
      .zipWithIndex.map { case (v, i) =>
        (i.toLong, t(1 + i % 28), 1L, "click", v, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Signals.ots1OtsuThreshold(spark, dir).collect()(0)
    val thr = r.getInt(0)
    assert(thr >= 10 && thr < 90, s"threshold $thr")
    assert(r.getLong(1) == 50L && r.getLong(2) == 50L)
  }

  test("ots1: real corpus returns one row with complementary class sizes") {
    val r = Signals.ots1OtsuThreshold(spark, sf).collect()
    assert(r.length == 1)
    val total = Tables.events(spark, sf).count()
    assert(r(0).getLong(1) + r(0).getLong(2) == total)
  }
}
