package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming mixture monitor — the ingest-time dual of mix1
  * (`queries/Curate.mix1MixtureWeights`): per event-time window, the
  * arriving documents' per-language token shares against the
  * committed target mixture weights. An upstream source drifting off
  * its mixture budget shows up window-by-window, before it skews the
  * training corpus.
  *
  * Scale notes: the language catalog is BOUNDED (it is the target
  * mixture table), so every language folds as a conditional
  * aggregate inside ONE stateful windowed aggregation — the
  * ExpMonitor shape — and the per-language unpivot (`stack`) is
  * stateless projection after it. State per window = |catalog|+1
  * counters; the watermark evicts closed windows. ONE definition
  * serves batch and stream (the StreamingSpec dual-proof pattern).
  */
object MixMonitor {

  /** Stream-source row shape (encoder convenience for tests/ingest). */
  final case class TimedDoc(ts: java.sql.Timestamp, lang: String,
      text: String)

  /** `docs` needs (ts, lang, text). `target` is the committed
    * mixture (lang, weight) — e.g. mix1's weight9 column — collected
    * to a literal list because it parameterizes the aggregate
    * schema; languages not in the target are counted in the window
    * total but get no drift row (they are a schema change upstream,
    * caught by total vs sum-of-rows).
    */
  def windowedMixDrift(docs: DataFrame, target: Seq[(String, Double)],
      window_ : String = "1 day", trip: Double = 0.1): DataFrame = {
    require(target.nonEmpty, "target mixture must be non-empty")
    val nw = size(split(trim(col("text")), "\\s+")).cast("long")
    val aggs = target.zipWithIndex.map { case ((l, _), i) =>
      sum(when(col("lang") === l, nw).otherwise(0L)).as(s"__tok_$i") }
    val agged = docs
      .groupBy(window(col("ts"), window_).as("w"))
      .agg(sum(nw).as("__tot"), aggs: _*)
    val stackExpr = target.zipWithIndex
      .map { case ((l, w9), i) => s"'${l.replace("'", "''")}', __tok_$i, CAST($w9 AS DOUBLE)" }
      .mkString(s"stack(${target.size}, ", ", ", ") AS (lang, tokens, weight)")
    agged.select(col("w.start").as("window_start"),
        col("__tot").as("total_tokens"), expr(stackExpr))
      .withColumn("share6", round(col("tokens").cast("double") /
        col("total_tokens").cast("double"), 6))
      .withColumn("drift6", round(col("share6") - col("weight"), 6))
      .select(col("window_start"), col("lang"), col("tokens"),
        col("total_tokens"), col("share6"), col("weight"), col("drift6"),
        (abs(col("drift6")) > trip).as("off_target"))
  }

  /** Streaming wiring: watermark so closed windows finalize in
    * append mode.
    */
  def streamingMixDrift(docs: DataFrame, target: Seq[(String, Double)],
      window_ : String = "1 day", delay: String = "2 hours",
      trip: Double = 0.1): DataFrame =
    windowedMixDrift(docs.withWatermark("ts", delay), target, window_, trip)
}
