package graft

import org.apache.spark.sql.functions._

import graft.text.TextFunctions

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii masks emails and phone-shaped digit runs, leaves prose") {
    val df = Seq(
      "mail me at jane.doe+x@example.co.uk thanks",
      "call +1 (555) 123-4567 now",
      "order 12 items for 34 dollars", // short digit runs survive
      "plain text"
    ).toDF("text")
    val out = df.select(TextFunctions.redactPii(col("text"))).as[String].collect()
    assert(out(0) === "mail me at <EMAIL> thanks")
    assert(out(1) === "call <PHONE> now")
    assert(out(2) === "order 12 items for 34 dollars")
    assert(out(3) === "plain text")
  }

  test("lineRepetitionRatio: fraction of duplicated lines") {
    val df = Seq(
      "a\nb\nc",          // all distinct -> 0
      "a\na\na\nb",       // 4 lines, 2 distinct -> 0.5
      "single line"       // 1 line -> 0
    ).toDF("text")
    val out = df.select(TextFunctions.lineRepetitionRatio(col("text")))
      .as[Double].collect()
    assert(out(0) === 0.0)
    assert(out(1) === 0.5)
    assert(out(2) === 0.0)
  }

  test("normalize_unicode folds decomposed accents to composed NFC") {
    import graft.functions.HashFunctions.normalize_unicode
    val composed = "caf\u00e9"        // e-acute as one code point
    val decomposed = "cafe\u0301"     // e + combining acute
    val df = Seq(decomposed, composed, "plain").toDF("text")
    val out = df.select(normalize_unicode(col("text"), "NFC")).as[String].collect()
    assert(out(0) === composed)
    assert(out(1) === composed)
    assert(out(2) === "plain")
    // exact dedup sees the two spellings as one document after NFC
    val hashes = df.select(sha2(normalize_unicode(col("text"), "NFC"), 256))
      .as[String].collect()
    assert(hashes(0) === hashes(1))
    assert(hashes(0) !== hashes(2))
  }

  test("fingerprint: portable rolling hash — hand-computed, order-sensitive") {
    import graft.text.TextFunctions
    val df = Seq("ab c", "c ab", "ab c", "").toDF("text")
    val fps = df.select(TextFunctions.fingerprint(col("text")).as("fp"))
      .collect().map(_.getLong(0)).toSeq
    // reference arithmetic any engine reproduces
    val M = 2147483647L
    def tok(t: String) = t.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % M)
    def fp(s: String) = s.trim.split("\\s+").toSeq
      .foldLeft(0L)((acc, t) => (acc * 131 + tok(t)) % M)
    assert(fps(0) === fp("ab c"))
    assert(fps(1) === fp("c ab"))
    assert(fps(0) !== fps(1)) // order-sensitive: permuted tokens differ
    assert(fps(0) === fps(2)) // deterministic
    assert(fps(3) === 0L)     // empty text -> zero fingerprint
  }

  test("langId picks the marker-dominant language, und when none") {
    val df = Seq(
      "the cat and the dog is in that house it",
      "der hund und die katze ist nicht ein zu",
      "xyzzy qwerty"
    ).toDF("text")
    val out = df.select(TextFunctions.langId(col("text"))).as[String].collect()
    assert(out.toSeq === Seq("en", "de", "und"))
  }

  test("t16: top-n-gram fractions — counts, tie-break, overlap > 1, " +
      "and short docs emit nothing") {
    val dir = java.nio.file.Files.createTempDirectory("t16").toString
    val docs = Seq(
      (1L, "x y x y x y z"), // overlapping repeats; trigram tie
      (2L, "a b c d e"),     // all grams distinct -> pure tie-break
      (3L, "hi")             // 1 token: no n-gram for any n in 2..4
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.Extensions.t16TopNgramFrac(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3), r.getDouble(4))).toMap
    // doc 1: "x y" appears 3x (9 of 13 chars); the trigram tie between
    // "x y x" and "y x y" (2 each) breaks to the binary-larger gram;
    // the 4-gram "x y x y" appears 2x OVERLAPPING, so its char mass
    // exceeds the doc's (14/13) — fractions are occurrence-weighted by
    // definition, not a coverage measure
    assert(out((1L, 2)) === (("x y", 3L, math.rint(9.0 / 13 * 1e6) / 1e6)))
    assert(out((1L, 3)) === (("y x y", 2L, math.rint(10.0 / 13 * 1e6) / 1e6)))
    assert(out((1L, 4)) === (("x y x y", 2L, math.rint(14.0 / 13 * 1e6) / 1e6)))
    // doc 2: every gram count is 1 -> the lexicographically largest wins
    assert(out((2L, 2)) === (("d e", 1L, math.rint(3.0 / 9 * 1e6) / 1e6)))
    assert(out((2L, 3)) === (("c d e", 1L, math.rint(5.0 / 9 * 1e6) / 1e6)))
    assert(out((2L, 4)) === (("b c d e", 1L, math.rint(7.0 / 9 * 1e6) / 1e6)))
    assert(!out.keySet.exists(_._1 == 3L))
    assert(out.size === 6)
  }

  test("t17: duplicate-n-gram fractions — a pasted 6-token block is " +
      "caught at n<=6, longer grams are clean, short docs emit nothing") {
    val dir = java.nio.file.Files.createTempDirectory("t17").toString
    val docs = Seq(
      (1L, "p q r s t u p q r s t u"), // the 6-gram pasted twice
      (2L, "a b c d")                  // 4 tokens: below every n
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.Extensions.t17DupNgramFrac(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // 23 joined chars; n=5: two grams appear twice (the window slides
    // into the repeat), 2x2x9 chars; n=6: exactly the pasted block,
    // 2x11 chars; n>=7: the period-6 stream has no repeats
    assert(out((1L, 5)) === ((2L, math.rint(36.0 / 23 * 1e6) / 1e6)))
    assert(out((1L, 6)) === ((1L, math.rint(22.0 / 23 * 1e6) / 1e6)))
    for (n <- 7 to 10) assert(out((1L, n)) === ((0L, 0.0)))
    assert(!out.keySet.exists(_._1 == 2L)) // 4 tokens < every n
    assert(out.size === 6)
  }
}
