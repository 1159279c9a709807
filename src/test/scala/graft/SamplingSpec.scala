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
