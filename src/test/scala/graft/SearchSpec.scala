package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.ops.TimeSeries
import graft.text.Search

class SearchSpec extends SparkSpec {
  import spark.implicits._

  // ---- deletion-neighborhood edit-distance ----

  test("deletionVariants: the term itself plus every single-char deletion") {
    val out = Seq("abc").toDF("t")
      .select(Search.deletionVariants(col("t"))).as[Seq[String]].head()
    assert(out.toSet === Set("abc", "bc", "ac", "ab"))
  }

  test("editDistanceOnePairs == naive all-pairs levenshtein (incl. " +
    "transposition false-candidates that must be filtered out)") {
    // ab/ba share deletion variants {a,b} but levenshtein=2 -> excluded;
    // cold/old (deletion), red/rod (substitution), seat/sea (deletion)
    val vocab = Seq("cold", "old", "red", "rod", "ab", "ba", "seat", "sea")
      .toDF("term").withColumn("n", lit(1L))
    val got = Search.editDistanceOnePairs(vocab)
      .select("w1", "w2").as[(String, String)].collect().toSet
    val words = vocab.select("term").as[String].collect()
    val naive = (for {
      a <- words; b <- words if a < b
      if org.apache.commons.text.similarity.LevenshteinDistance
        .getDefaultInstance.apply(a, b) <= 1
    } yield (a, b)).toSet
    assert(got === naive)
    assert(got.contains(("cold", "old")) && got.contains(("red", "rod")))
    assert(!got.contains(("ab", "ba")))
  }

  // ---- inverted index ----

  test("invertedIndex: tf per (term,doc), df per term, thresholds applied") {
    val docs = Seq(
      (1L, "spark spark hadoop"),
      (2L, "spark flink"),
      (3L, "hadoop io")
    ).toDF("doc_id", "text")
    val idx = Search.invertedIndex(docs, minTermLen = 3, minDf = 2L)
      .select("term", "doc_id", "tf", "df")
      .as[(String, Long, Long, Long)].collect().toSet
    // io dropped (len<3); flink dropped (df=1)
    assert(idx === Set(
      ("spark", 1L, 2L, 2L), ("spark", 2L, 1L, 2L),
      ("hadoop", 1L, 1L, 2L), ("hadoop", 3L, 1L, 2L)))
  }

  // ---- BM25 ----

  test("bm25TopK: hand-computed score on a 3-doc corpus; rank order " +
    "deterministic") {
    val docs = Seq(
      (1L, "cat dog cat"), // tf(cat)=2, dl=3
      (2L, "cat fish"),    // tf(cat)=1, dl=2
      (3L, "bird bird")    // no hit
    ).toDF("doc_id", "text")
    val rows = Search.bm25TopK(docs, Seq("cat"), k = 10)
      .select("rank", "doc_id", "score", "n_terms_hit")
      .as[(Int, Long, Double, Long)].collect()
    val n = 3.0; val df = 2.0; val avgdl = 7.0 / 3.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def sc(tf: Double, dl: Double): Double =
      BigDecimal(idf * (tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.map(_._2).toSeq === Seq(1L, 2L)) // doc 3 never scores
    assert(rows(0) === ((1, 1L, sc(2, 3), 1L)))
    assert(rows(1) === ((2, 2L, sc(1, 2), 1L)))
  }

  test("bm25TopK plan: top-k is TakeOrdered (distributed per-partition " +
    "heads), not a full-sort window; corpus filter lands pre-aggregation") {
    val docs = Seq((1L, "cat dog")).toDF("doc_id", "text")
    val plan = Search.bm25TopK(docs, Seq("cat"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
  }

  // ---- time-series gap fill ----

  test("gapFillDaily: dense grid, forward fill, leading nulls preserved") {
    val ev = Seq(
      ("a", "2024-01-01 10:00:00", 1.5),
      ("a", "2024-01-01 11:00:00", 2.5), // day total 4.0
      ("a", "2024-01-04 09:00:00", 7.0), // gap of 2 days
      ("b", "2024-01-03 01:00:00", 9.0)  // b starts late: leading nulls
    ).toDF("k", "ts", "value").withColumn("ts", to_timestamp(col("ts")))
    val out = TimeSeries.gapFillDaily(ev, "k", "ts", "value")
      .select("k", "day", "filled_total", "observed")
      .as[(String, Date, Option[Double], Boolean)].collect()
      .map(r => (r._1, r._2.toString, r._3, r._4)).toSet
    assert(out === Set(
      ("a", "2024-01-01", Some(4.0), true),
      ("a", "2024-01-02", Some(4.0), false), // filled
      ("a", "2024-01-03", Some(4.0), false), // filled
      ("a", "2024-01-04", Some(7.0), true),
      ("b", "2024-01-01", None, false),      // before first observation
      ("b", "2024-01-02", None, false),
      ("b", "2024-01-03", Some(9.0), true),
      ("b", "2024-01-04", Some(9.0), false)))
  }

  test("gapFillDaily: sum is combine-order-proof (decimal of rounded " +
    "values), grid spans exactly observed min..max") {
    val ev = (1 to 500).map(i =>
      ("x", s"2024-02-0${1 + i % 3} 00:00:0${i % 10}", 0.1))
      .toDF("k", "ts", "value").withColumn("ts", to_timestamp(col("ts")))
    val out = TimeSeries.gapFillDaily(ev.repartition(13), "k", "ts", "value")
      .select("day", "filled_total").as[(Date, Double)].collect().toMap
    // 500 rows of 0.1 over 3 days: decimal sum gives exact totals
    val d1 = out(Date.valueOf("2024-02-01"))
    assert(d1 * 10 === math.rint(d1 * 10), s"non-exact decimal sum: $d1")
    assert(out.size === 3)
  }
}
