package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.functions.VectorFunctions
import graft.queries.Select
import graft.similarity.Similarity

class SelectSpec extends SparkSpec {
  import spark.implicits._

  // ---- ArraySqDist kernel -------------------------------------------

  test("array_sqdist equals the sequential HOF fold bit-for-bit on " +
      "float and double inputs") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat()),
        Array.fill(64)((rnd.nextDouble() - 0.5) * 3))
    }.toDF("id", "fv", "dv")
    val hof = aggregate(
      zip_with(col("fv"), col("dv"),
        (x, y) => x.cast("double") - y.cast("double")),
      lit(0.0), (acc, v) => acc + v * v)
    // note: fold order differs ((x-y)*(x-y) inline vs squared later)
    // — must still be IDENTICAL because each term is the same double
    val got = rows.select(
      VectorFunctions.array_sqdist(col("fv"), col("dv")).as("a"),
      hof.as("b")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  // ---- kcenterGreedy -------------------------------------------------

  test("kcenterGreedy on three planted far clusters: the first three " +
      "centers land in three distinct clusters, seed is min id, and " +
      "the result is invariant to input partitioning") {
    val rnd = new scala.util.Random(11)
    // cluster c at (100c, 0, ...) with tiny jitter; ids interleaved
    val pts = (0 until 90).map { i =>
      val c = i % 3
      val v = Array.tabulate(8)(j =>
        (if (j == 0) 100.0 * c else 0.0) + rnd.nextDouble() * 0.01)
      (i.toLong, v)
    }
    def run(parts: Int) =
      Select.kcenterGreedy(
        pts.toDF("vec_id", "embedding").repartition(parts),
        "vec_id", "embedding", k = 6)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val a = run(1)
    assert(a.head._2 == 0L) // seed = min id
    val firstThreeClusters = a.take(3).map(_._2 % 3).toSet
    assert(firstThreeClusters.size == 3,
      s"first 3 centers must cover all clusters: ${a.toSeq}")
    // after all clusters are covered, max-min-dist drops by ~1e4
    assert(a(2)._3 > 9000 && a(3)._3 < 1.0)
    assert(a.toSeq == run(7).toSeq)
  }

  // ---- dsir1 ---------------------------------------------------------

  test("dsir1 planted target: sources rich in target-distinctive " +
      "tokens score higher mean importance weight") {
    // target (en) over-uses 'zq'; raw background is uniform 'aa bb'
    val docs = ((1 to 40).map(i =>
      (i.toLong, "zq zq aa bb", "en", "srcT")) ++
      (41 to 80).map(i => (i.toLong, "aa bb aa bb", "de", "srcB")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val res = Select.dsir1ImportanceWeights(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    // smoothing (add-V with V=256 over a 3-token plant) shifts the
    // absolute level; the contract is the ORDER, and a clear margin
    assert(res("srcT") > res("srcB") + 1.0,
      s"target-like source must out-weigh background: $res")
  }

  test("dsir1 on the corpus: 20 sources, vocab_tokens <= total tokens, " +
      "weights finite") {
    val rows = Select.dsir1ImportanceWeights(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // n_pos <= n_docs
      assert(!r.getDouble(4).isNaN && !r.getDouble(4).isInfinite)
    }
  }

  // ---- clb1 ----------------------------------------------------------

  test("clb1 cluster-balanced sample: every cluster is represented, " +
      "ranks are contiguous from 1, each cluster's picks are its " +
      "closest vectors, and the result is deterministic across runs") {
    val rows = Select.clb1ClusterBalanced(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byCluster = rows.groupBy(_._1)
    assert(byCluster.keySet == (0 until 8).toSet,
      s"all 8 clusters must contribute: ${byCluster.keySet}")
    byCluster.foreach { case (c, rs) =>
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks == (1L to ranks.length).toSeq,
        s"cluster $c ranks must be 1..n: $ranks")
      // picks are ordered by (dist2, id): rank order == sort order
      val sorted = rs.sortBy(r => (r._4, r._3)).map(_._2).toSeq
      assert(sorted == sorted.sorted, s"cluster $c rank/dist mismatch")
    }
    // budget: quotas are round(64 * sqrt-share) with a min of 1, so
    // the total lands near 64 (rounding can move it a few either way)
    assert(rows.length >= 56 && rows.length <= 72, s"${rows.length}")
    val again = Select.clb1ClusterBalanced(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSet == again.toSet)
  }

  // ---- ccnet1 --------------------------------------------------------

  test("ccnet1 terciles: per source the three buckets partition the " +
      "docs near-evenly, means are monotone head<=middle<=tail, and " +
      "the result is invariant to input partitioning") {
    val res = Select.ccnet1PerplexityBuckets(spark, sf)
    val rows = res.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val bySrc = rows.groupBy(_._1)
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, rs) =>
      assert(rs.map(_._2).sorted.toSeq == Seq(0L, 1L, 2L),
        s"$src must have buckets 0,1,2")
      val counts = rs.sortBy(_._2).map(_._3)
      assert(counts.max - counts.min <= 1,
        s"$src tercile sizes must differ by <=1: ${counts.toSeq}")
      val means = rs.sortBy(_._2).map(_._4)
      assert(means(0) <= means(1) && means(1) <= means(2),
        s"$src bucket means must be monotone: ${means.toSeq}")
    }
    // partitioning invariance of the underlying rank kernel
    val again = Select.ccnet1PerplexityBuckets(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSet == again.toSet)
  }

  // ---- rho1: excess-loss selection ------------------------------------

  test("rho1: structured (bigram-compressible) docs outscore " +
      "same-unigram token soup and land in the selected quarter") {
    // all 8 docs have IDENTICAL token counts (12 x, 12 y), so the
    // unigram NLL is the same for every doc — the excess signal is
    // carried ENTIRELY by bigram structure. Docs 1-2 alternate
    // strictly (one dominant bigram each way); docs 3-8 mix in
    // doubled letters (rarer bigrams -> higher bigram NLL -> lower
    // excess).
    val alt = Array.fill(12)("x y").mkString(" ")
    def soup(seed: Int): String = {
      val xs = List.fill(12)("x"); val ys = List.fill(12)("y")
      // deterministic interleave that varies per doc: rotate the
      // doubled-pair pattern by seed
      val merged = (xs.grouped(2) zip ys.grouped(2))
        .flatMap { case (a, b) => if (seed % 2 == 0) a ++ b else b ++ a }
        .toList
      (merged.drop(seed % 5) ++ merged.take(seed % 5)).mkString(" ")
    }
    val dir = java.nio.file.Files.createTempDirectory("rho1").toString
    ((1L to 2L).map(i => (i, alt, "en", "s")) ++
      (3L to 8L).map(i => (i, soup(i.toInt), "en", "s")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Select.rho1ExcessLoss(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.length == 8)
    val byRank = out.sortBy(_._3)
    // the two alternating docs take ranks 1-2 and exactly the top
    // quarter (8/4 = 2) is selected
    assert(byRank.take(2).map(_._1).toSet == Set(1L, 2L),
      s"expected docs 1,2 on top, got ${byRank.toSeq}")
    assert(out.count(_._4) == 2)
    assert(out.filter(_._4).forall(_._3 <= 2))
    // excess is strictly higher for the structured docs
    val exTop = byRank.take(2).map(_._2).min
    val exRest = byRank.drop(2).map(_._2).max
    assert(exTop > exRest, s"structured $exTop must beat soup $exRest")
  }

  // ---- qc1: learned quality classifier ------------------------------

  test("qc1 learns the planted label: AUC over held-together corpus " +
      "clears the floor, and the base-rate threshold splits sanely") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = Select.qc1ScoredOn(spark, docs)
      .collect().map(r => (r.getInt(1), r.getDouble(2)))
    val pos = rows.filter(_._1 == 1).map(_._2)
    val neg = rows.filter(_._1 == 0).map(_._2)
    assert(pos.nonEmpty && neg.nonEmpty,
      s"degenerate labels: ${pos.length} pos / ${neg.length} neg")
    // Mann–Whitney AUC: P(score_pos > score_neg) + ties/2
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val auc = wins / (pos.length.toDouble * neg.length)
    assert(auc >= 0.8, s"AUC $auc below floor (pos=${pos.length}, " +
      s"neg=${neg.length})") // measured 0.869 at sf0.001
    // at the base-rate operating point the split must be non-trivial
    // in both directions (an untrained model puts everything on one
    // side)
    val thr = pos.length.toDouble / rows.length
    val predPos = rows.count(_._2 > thr)
    assert(predPos > rows.length / 5 && predPos < rows.length * 4 / 5,
      s"degenerate threshold split: $predPos of ${rows.length}")
    // ...and most predicted positives are true positives-ish: recall
    // at this operating point cleared 0.8 when pinned
    val recall = rows.count(t => t._1 == 1 && t._2 > thr).toDouble /
      pos.length
    assert(recall >= 0.7, s"recall $recall")
  }

  test("qc1 summary is consistent with the per-doc scores and covers " +
      "every (lang, label) cell") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val summary = Select.qc1On(spark, docs).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val scored = Select.qc1ScoredOn(spark, docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("y"),
        r.getAs[Double]("score")))
    val thr = scored.count(_._2 == 1).toDouble / scored.length
    val expect = scored.groupBy(t => (t._1, t._2)).map { case (k, xs) =>
      k -> (xs.length.toLong, xs.count(_._3 > thr).toLong)
    }
    assert(summary === expect)
    assert(summary.keySet.map(_._1).size >= 3, "needs several langs")
  }
}
