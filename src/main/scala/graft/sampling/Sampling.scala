package graft.sampling

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus sampling / mixing for training-data pipelines: seeded
  * stratified sampling (per-language quotas) and weighted multi-source
  * mixing — the standard "data recipe" operations applied before
  * training. Both are thin, deterministic wrappers over Spark's
  * Bernoulli samplers: a pure map over the scan (no shuffle), so they
  * run at full scan speed on any corpus size.
  */
object Sampling {

  /** Keep each stratum of `stratumCol` with its own fraction
    * (unlisted strata are dropped). Seeded => reproducible data
    * recipes.
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      fractions: Map[String, Double],
      seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Weighted mix of sources: sample each source at its weight (<= 1.0)
    * and union — e.g. 100% wiki + 30% web + 5% forums.
    */
  def weightedMix(
      sources: Seq[(DataFrame, Double)],
      seed: Long = 42L): DataFrame = {
    require(sources.nonEmpty)
    sources.zipWithIndex.map { case ((df, w), i) =>
      require(w > 0 && w <= 1.0, s"weight must be in (0,1]: $w")
      if (w >= 1.0) df else df.sample(withReplacement = false, w, seed + i)
    }.reduce(_ unionByName _)
  }
}
