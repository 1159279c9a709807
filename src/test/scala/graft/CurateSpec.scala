package graft

import org.apache.spark.sql.functions._

import graft.queries.Curate

/** Corpus-curation batch: sorted-neighborhood window/threshold laws,
  * temperature-mixing algebra, and the logistic trainer on a
  * separable plant.
  */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  private def docsDF(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))

  test("snm1: adjacent near-identical docs pair up; a far doc inside " +
      "the window is cut by the threshold; pairs respect the window") {
    // blocking prefix groups the two aaa-docs next to each other
    val docs = docsDF(Seq(
      (1L, "aaaa bbbb cccc dddd eeee", "en"),
      (2L, "aaaa bbbb cccc dddd eeXe", "en"), // lev 1 from doc 1
      (3L, "zzzz yyyy xxxx wwww vvvv", "en"), // far from everything
      (4L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk", "en")))
    val pairs = Curate.snmPairs(docs, w = 4, k = 5, bkLen = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // sorted order by 24-char prefix: 1, 2, 4 share "aaaa bbbb cccc dddd eee"
    // prefixes; only (1,2) is within lev 5 (doc 4 is 27 chars longer)
    assert(pairs.map(p => (p._1, p._2)) == Set((1L, 2L)))
    assert(pairs.head._3 == 1)
  }

  test("snm1: every doc compares against at most w following " +
      "neighbors — candidate count is linear by construction") {
    val docs = docsDF((1L to 30L).map(i => (i, s"doc number $i", "en")))
    // k large enough that every compared pair passes: the output IS
    // the candidate set
    val n = Curate.snmPairs(docs, w = 3, k = 200, bkLen = 24).count()
    // exactly sum_{i=1..n-1} min(3, n-i) = 3*(30-2) + 2 + 1
    assert(n == 3 * 27 + 2 + 1)
  }

  test("mix1: weights sum to 1, sqrt-temperature boosts the minority " +
      "language and damps the majority") {
    val dir = java.nio.file.Files.createTempDirectory("mix1").toString
    val docs = docsDF(
      (1L to 80L).map(i => (i, "w " * 10 + "x", "en")) ++
        (81L to 100L).map(i => (i, "w " * 10 + "x", "fr")))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curate.mix1MixtureWeights(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("weight9"), r.getAs[Double]("boost6"))).toMap
    val wSum = out.values.map(_._1).sum
    assert(math.abs(wSum - 1.0) < 1e-6, s"weights sum $wSum")
    // shares 0.8/0.2 -> sqrt ratio 2:1 -> weights 2/3, 1/3
    assert(math.abs(out("en")._1 - 2.0 / 3) < 1e-6)
    assert(math.abs(out("fr")._1 - 1.0 / 3) < 1e-6)
    assert(out("fr")._2 > 1.0 && out("en")._2 < 1.0,
      "temperature must boost the minority and damp the majority")
  }

  test("lrq1 trainer: a linearly separable plant is classified " +
      "perfectly and the learned slope points the right way") {
    val feat = ((1 to 40).map(i => (1.0, 5.0 + (i % 3) * 0.1, 0.9)) ++
      (1 to 40).map(i => (0.0, 2.0 + (i % 3) * 0.1, 0.3)))
      .toDF("y", "f1", "f2")
      .select(col("y"), round(col("f1"), 6).as("f1"),
        round(col("f2"), 6).as("f2"))
    val b = Curate.logisticTrain(feat, rounds = 3).collect()(0)
    val (b0, b1, b2) = (b.getAs[Double]("b0"), b.getAs[Double]("b1"),
      b.getAs[Double]("b2"))
    // positive class sits at larger f1/f2: learned slopes positive
    assert(b1 > 0 || b2 > 0, s"slopes ($b1, $b2) must separate upward")
    val correct = feat.withColumn("eta",
        lit(b0) + col("f1") * lit(b1) + col("f2") * lit(b2))
      .filter((col("eta") >= 0 && col("y") === 1.0) ||
        (col("eta") < 0 && col("y") === 0.0)).count()
    assert(correct == 80L, s"separable plant: $correct/80 correct")
  }

  test("snm1 pairs and lrq1 betas are invariant to input partitioning " +
      "(the GlobalRank + exact-DECIMAL disciplines hold end-to-end)") {
    val docs = Tables.documents(spark, sf)
    def pairSet(parts: Int) =
      Curate.snmPairs(docs.repartition(parts), w = 4, k = 20, bkLen = 24)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairSet(1) == pairSet(7))
    val feat = Curate.docFeatures(docs)
    def betas(parts: Int) =
      Curate.logisticTrain(feat.repartition(parts), rounds = 3)
        .collect()(0) match {
        case r => (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      }
    assert(betas(1) == betas(5))
  }

  test("lrq1 on the corpus: one row, finite betas, accuracy at least " +
      "the majority-class share") {
    val r = Curate.lrq1LogisticQuality(spark, sf).collect()
    assert(r.length == 1)
    val acc = r(0).getAs[Double]("acc6")
    val n = r(0).getAs[Long]("n")
    assert(n > 0 && acc >= 0.0 && acc <= 1.0)
    assert(!r(0).getAs[Double]("b1_6").isNaN)
  }

  test("mix4 UniMax: multi-round waterfilling — a mid-size language " +
      "binds only after the first round's caps free budget; " +
      "allocations exhaust the budget up to integer division") {
    // tokens a=10, b=50, c=100; B = 160*3/4 = 120. Round 1: t=40
    // binds only a; round 2: t=(120-10)/2=55 binds b; round 3: c
    // takes the waterline 60. 10+50+60 = 120 exactly.
    val dir = java.nio.file.Files.createTempDirectory("mix4").toString
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    Seq((1L, words(10), "aa"), (2L, words(50), "bb"), (3L, words(100), "cc"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curate.mix4Unimax(spark, dir, epochs = 1,
        budgetNum = 3, budgetDen = 4).collect()
      .map(r => r.getString(0) ->
        (r.getBoolean(3), r.getLong(4), r.getAs[Double]("epochs6"))).toMap
    assert(out("aa") == ((true, 10L, 1.0)))
    assert(out("bb") == ((true, 50L, 1.0)))
    assert(out("cc")._1 == false && out("cc")._2 == 60L)
    assert(out.values.map(_._2).sum == 120L)
    // no language ever exceeds its epoch ceiling
    assert(out.values.forall(_._3 <= 1.0))
  }

  test("mix4 kernel converges to the true fixed point on a cascade " +
      "catalog needing 10 binding rounds (the old rounds=6 loop left " +
      "four languages over-allocated)") {
    // constructed so exactly one language binds per round: each cap
    // sits just above the previous round's threshold and below the
    // budget the previous cap frees; the 10M filler never caps
    val toks = Seq(1580987L, 2634980L, 2740379L, 2752090L, 2753554L,
      2753763L, 2753798L, 2753804L, 2753805L, 2753806L, 10000000L)
    val la = toks.zipWithIndex.map { case (t, i) => (f"l$i%02d", t) }
    val rows = Curate.unimaxAlloc(la, epochs = 1,
      budgetNum = 4, budgetDen = 5)
    // the no-upsampling invariant: NO language is ever allocated past
    // its epoch cap — the exact invariant a truncated loop violated
    // (langs l06-l09 got the uncapped share 2813803 > their ~2753800
    // caps when only 6 rounds ran)
    rows.foreach { case (l, _, cap, _, alloc) =>
      assert(alloc <= cap, s"$l allocated $alloc over cap $cap")
    }
    // it IS a fixed point: every uncapped language's cap strictly
    // exceeds the final uniform share (else it should have capped)
    val budget = toks.sum * 4 / 5
    val cappedSum = rows.collect { case (_, _, c, true, _) => c }.sum
    val nu = rows.count(!_._4)
    val share = budget - cappedSum
    rows.filter(!_._4).foreach { case (l, _, cap, _, _) =>
      assert(cap > share / nu, s"$l uncapped but cap $cap <= share")
    }
    // all ten cascade languages cap; only the filler stays uncapped
    assert(rows.count(_._4) == 10 && !rows.last._4)
    // budget is exhausted up to integer division
    val alloc = rows.map(_._5).sum
    assert(alloc <= budget && budget - alloc < nu)
  }
}
