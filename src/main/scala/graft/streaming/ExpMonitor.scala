package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming experiment monitor — the live dual of ab1's two-
  * proportion z-test: per event-time window, each arm's users and
  * conversions (purchase events) and the pooled two-proportion z for
  * the window. A drifting arm shows up window-by-window while the
  * experiment runs, not at readout.
  *
  * Scale notes: ONE definition serves batch and stream (the
  * StreamingSpec dual proof pattern); state is four counters per
  * window (one conditional aggregate — the single stateful operator
  * a streaming chain allows), and the watermark evicts closed
  * windows. The arm comes from the same knuth hash every batch
  * experiment operator uses, so a row's assignment is identical
  * in-flight and at rest.
  */
object ExpMonitor {

  /** `events` needs (ts, user_id, event_type) columns. Counts are
    * event-level; the pooled two-proportion z uses exact counts in
    * both modes.
    */
  def windowedArmZ(events: DataFrame,
      window_ : String = "1 day"): DataFrame = {
    val arm = pmod(col("user_id") * lit(2654435761L) + lit(23L),
      lit(4294967296L)).mod(2).cast("int")
    // ONE aggregation (the only stateful operator a stream allows in
    // a chain): both arms fold as conditional aggregates per window
    events.withColumn("arm", arm)
      .groupBy(window(col("ts"), window_).as("w"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 0 &&
          col("event_type") === "purchase", 1L).otherwise(0L))
          .as("ca"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
        sum(when(col("arm") === 1 &&
          col("event_type") === "purchase", 1L).otherwise(0L))
          .as("cb"))
      .select(col("w.start").as("window_start"),
        col("na"), col("ca"), col("nb"), col("cb"),
        round({
          val pa = col("ca").cast("double") / nullif(col("na"), lit(0L))
          val pb = col("cb").cast("double") / nullif(col("nb"), lit(0L))
          val p = (col("ca") + col("cb")).cast("double") /
            (col("na") + col("nb"))
          // nullif: a window with p=0 or p=1 has no variance — its z
          // is undefined (NULL), not a crash (ANSI divide-by-zero)
          (pa - pb) / nullif(sqrt(p * (lit(1.0) - p) *
            (lit(1.0) / nullif(col("na"), lit(0L)) +
              lit(1.0) / nullif(col("nb"), lit(0L)))), lit(0.0))
        }, 6).as("z6"))
  }

  /** Streaming wiring: watermark so closed windows finalize in append
    * mode; per-window state is the four counters only.
    */
  def streamingWindowedArmZ(events: DataFrame,
      window_ : String = "1 day",
      delay: String = "2 hours"): DataFrame =
    windowedArmZ(events.withWatermark("ts", delay), window_)
}
