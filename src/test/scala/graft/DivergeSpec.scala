package graft

import org.apache.spark.sql.functions._

import graft.queries.Diverge

/** Batch-two round-11 operators: divergence bounds, the Zipf fit
  * against a driver-side OLS replay, Naive Bayes on a planted
  * separable corpus, and edit-distance blocking invariants.
  */
@graft.tags.Slow
class DivergeSpec extends SparkSpec {
  import spark.implicits._

  test("kld1: KL >= 0, 0 <= JSD <= ln 2, one row per source") {
    val out = Diverge.kld1SourceDivergence(spark, sf).collect()
    val nSrc = Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    assert(out.length == nSrc)
    out.foreach { r =>
      assert(r.getAs[Double]("kl6") >= -1e-9)
      val jsd = r.getAs[Double]("jsd6")
      assert(jsd >= -1e-9 && jsd <= math.log(2.0) + 1e-9)
    }
  }

  test("kld1: an identical-to-corpus source has ~zero divergence") {
    val dir = java.nio.file.Files.createTempDirectory("kld1").toString
    // two sources with the SAME word distribution -> each source's
    // distribution equals the corpus distribution exactly
    val rows = Seq(
      (1L, "a a b", "en", "s1", 5L), (2L, "a a b", "en", "s2", 5L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Diverge.kld1SourceDivergence(spark, dir).collect()
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("kl6")) < 1e-9)
      assert(math.abs(r.getAs[Double]("jsd6")) < 1e-9)
    }
  }

  test("zipf1: slope matches a driver-side OLS replay and is negative") {
    val r = Diverge.zipf1RankFrequency(spark, sf).collect()(0)
    val freq = Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .groupBy("w").count().collect()
      .map(x => (x.getString(0), x.getLong(1)))
      .sortBy(x => (-x._2, x._1)).take(100)
    val pts = freq.zipWithIndex.map { case ((_, c), i) =>
      (math.log(i + 1.0), math.log(c.toDouble)) }
    val n = pts.length
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(r.getLong(0) == n)
    assert(math.abs(r.getAs[Double]("slope6") - slope) < 1e-4)
    assert(r.getAs[Double]("slope6") < 0.0)
  }

  test("nb1: a separable planted corpus classifies perfectly; matrix sums to n") {
    val dir = java.nio.file.Files.createTempDirectory("nb1").toString
    val rows = (
      (1 to 8).map(i => (i.toLong, "apple banana apple", "en", "s", 3L)) ++
      (9 to 16).map(i => (i.toLong, "chat chien chat", "fr", "s", 3L))
    )
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Diverge.nb1NaiveBayes(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("en", "en") -> 8L, ("fr", "fr") -> 8L))
  }

  test("nb1: confusion matrix covers every document exactly once") {
    val out = Diverge.nb1NaiveBayes(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(out.map(_.getLong(2)).sum == total)
    val langs = Tables.documents(spark, sf)
      .select(col("lang")).distinct().collect().map(_.getString(0)).toSet
    assert(out.map(_.getString(1)).toSet.subsetOf(langs))
  }

  test("lev1: planted near names count each other; min_dist is the true DP") {
    val dir = java.nio.file.Files.createTempDirectory("lev1").toString
    Seq((1L, "red widget"), (2L, "bed widget"), (3L, "hydraulic pump"))
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = Diverge.lev1EditDistance(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(3)))).toMap
    assert(out(1L) == ((1L, 1)))
    assert(out(2L) == ((1L, 1)))
    assert(out(3L) == ((0L, -1)))
  }

  test("lev1: every part appears once; counts bounded by the name domain") {
    val out = Diverge.lev1EditDistance(spark, sf)
    val nParts = Tables.part(spark, sf).count()
    val nNames = Tables.part(spark, sf)
      .select(col("p_name")).distinct().count()
    assert(out.count() == nParts)
    assert(out.agg(max(col("n_near"))).head().getLong(0) < nNames)
  }
}
