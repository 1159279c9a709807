package graft

import org.apache.spark.sql.functions._

import graft.sampling.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("stratified sample respects per-stratum quotas and is seeded-deterministic") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val totals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fractions = Map("en" -> 0.5, "de" -> 1.0, "zh" -> 0.1)
    val sampled = Sampling.stratifiedSample(docs, "lang", fractions)
    val counts = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === fractions.keySet) // unlisted strata dropped
    assert(counts("de") === totals("de")) // fraction 1.0 keeps all
    val enRatio = counts("en").toDouble / totals("en")
    assert(enRatio > 0.3 && enRatio < 0.7, s"en ratio $enRatio")
    // same seed -> identical sample
    val again = Sampling.stratifiedSample(docs, "lang", fractions)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again === sampled.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("stratifiedSampleByHash: quota adherence, determinism, portable-arith equivalence") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val totals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fractions = Map("en" -> 0.5, "de" -> 1.0, "zh" -> 0.1)
    val sampled = Sampling.stratifiedSampleByHash(
      docs, "lang", col("doc_id"), fractions)
    val counts = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === fractions.keySet)
    assert(counts("de") === totals("de")) // fraction 1.0 keeps all
    val enRatio = counts("en").toDouble / totals("en")
    assert(enRatio > 0.4 && enRatio < 0.6, s"en ratio $enRatio")
    // the kept set is exactly the rows whose portable hash clears the
    // per-stratum threshold — the arithmetic any SQL engine reproduces
    val manual = docs.filter(
      pmod(col("doc_id").cast("long") * lit(2654435761L) + lit(42L),
        lit(4294967296L)) <
        when(col("lang") === "en", (0.5 * 4294967296.0).toLong)
          .when(col("lang") === "de", 4294967296L)
          .when(col("lang") === "zh", (0.1 * 4294967296.0).toLong))
      .select("doc_id")
    assert(sampled.select("doc_id").except(manual).count() === 0)
    assert(manual.except(sampled.select("doc_id")).count() === 0)
  }

  test("sampleKPerGroup: exactly k per group, equals sort-based bottom-k, order-independent") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val prio = Sampling.knuthPriority(col("doc_id"), 42L)
    val sampled = Sampling.sampleKPerGroup(
      docs, Seq("lang"), prio, Seq("doc_id" -> col("doc_id")), k = 5)
    val counts = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 5L), counts)

    // oracle: window-sort bottom-k by the same priority
    val expected = docs
      .withColumn("__p", prio)
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(col("__p"), col("doc_id"))))
      .filter(col("__rk") <= 5)
      .select("lang", "doc_id")
    assert(sampled.select("lang", "doc_id").except(expected).count() === 0)
    assert(expected.except(sampled.select("lang", "doc_id")).count() === 0)

    // order-independence: a repartitioned, differently-ordered input
    // yields the identical sample (priority sampling is a function of
    // the DATA, not the partitioning)
    val shuffled = Sampling.sampleKPerGroup(
      docs.repartition(7, col("doc_id")).sortWithinPartitions(desc("text")),
      Seq("lang"), prio, Seq("doc_id" -> col("doc_id")), k = 5)
    assert(shuffled.select("lang", "doc_id").except(expected).count() === 0)
    assert(expected.except(shuffled.select("lang", "doc_id")).count() === 0)
  }

  test("weightedPriority: weight-proportional draw, window-sort equivalence") {
    val df = ((1L to 100L).map(i => (i, 1L)) ++
        (101L to 200L).map(i => (i, 10L)))
      .toDF("id", "w").withColumn("g", lit("all"))
    val prio = Sampling.weightedPriority(col("id"), col("w"), 3L)
    val sampled = Sampling.sampleKPerGroup(
      df, Seq("g"), prio, Seq("id" -> col("id")), k = 40)
    val ids = sampled.select("id").as[Long].collect().toSet
    assert(ids.size === 40)
    // weight-10 ids should dominate a 40-of-200 draw (E ≈ 36); the
    // draw is seeded-deterministic so this bound cannot flake
    val heavy = ids.count(_ > 100L)
    assert(heavy > 25, s"heavy=$heavy")
    val expected = df.withColumn("__p", prio)
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy(col("__p"), col("id"))))
      .filter(col("__rk") <= 40)
      .select("id").as[Long].collect().toSet
    assert(ids === expected)
  }

  test("knuthPriority is injective on distinct keys (odd multiplier mod 2^32)") {
    val n = (1L to 10000L).toDF("id")
    val distinctPrios = n.select(Sampling.knuthPriority(col("id"), 7L).as("p"))
      .distinct().count()
    assert(distinctPrios === 10000L)
  }

  test("trainingOrder: exact seeded permutation, stable under input " +
      "partitioning, distributed rank == driver-side sort") {
    val docs = Tables.documents(spark, sf)
    val got = Sampling.trainingOrder(docs, "doc_id", seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // a permutation: ranks are exactly 0..n-1, one per doc
    assert(got.map(_._2).sorted.toSeq === (0L until got.length).toSeq)
    // equals the driver-side sort by (knuth priority, id)
    val want = got.map(_._1).sorted
      .sortBy(id => (((id + 42L) * 2654435761L) % 4294967296L, id))
      .zipWithIndex.map { case (id, i) => (id, i.toLong) }.toSet
    assert(got.toSet === want)
    // input partitioning must not change the permutation
    val reparted = Sampling.trainingOrder(
      docs.repartition(17, col("lang")), "doc_id", seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reparted === want)
    // a different seed is a different permutation
    val other = Sampling.trainingOrder(docs, "doc_id", seed = 43L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(other !== want)
  }

  test("weightedMix unions weighted samples of each source") {
    val a = (1L to 100L).toDF("id").withColumn("src", lit("a"))
    val b = (101L to 200L).toDF("id").withColumn("src", lit("b"))
    val mix = Sampling.weightedMix(Seq(a -> 1.0, b -> 0.2))
    val bySrc = mix.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("a") === 100L)
    assert(bySrc("b") > 2 && bySrc("b") < 60, bySrc)
    intercept[IllegalArgumentException] {
      Sampling.weightedMix(Seq(a -> 1.5))
    }
  }
}
