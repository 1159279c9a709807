package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming split-conformal outlier gate — the ingest-time dual of
  * `Robust.conf1SplitConformal`: every incoming (segment, value) row
  * is flagged `surprising` iff its absolute residual against the
  * batch calibration predictor exceeds that segment's conformal
  * quantile. By the conformal guarantee, in-distribution traffic
  * trips the gate at most ~10% of the time; a drifted source trips
  * it much more — the QC signal for training-data ingest.
  *
  * Scale notes: STATELESS — one broadcast stream-static join against
  * the (segments-bounded) calibration table and a projection; the
  * stream never shuffles and no state store exists, so the gate adds
  * zero to checkpoint size and survives any throughput the source
  * sustains. Flags equal the batch operator's residual test by
  * construction (same rounded residual, same qhat; asserted in
  * StreamingSpec).
  */
object ConformalGate {

  /** `stream` needs (segment, value) columns (any extra columns pass
    * through); `calibration` is a batch DataFrame with (segment,
    * yhat, qhat) — e.g. the stats x qhat tables of conf1's
    * calibration half.
    *
    * LEFT join on segment: a row whose segment has no calibration
    * entry (e.g. conf1 drops segments with n_cal < 18, or a brand-new
    * source appears mid-stream) is the MOST surprising traffic a QC
    * gate can see — it must surface, not vanish. Such rows get
    * resid = NULL and surprising = true.
    */
  def streamingConformalGate(stream: DataFrame,
      calibration: DataFrame): DataFrame =
    stream
      .join(broadcast(calibration.select(col("segment"), col("yhat"),
        col("qhat"))), Seq("segment"), "left")
      .withColumn("resid",
        round(abs(col("value").cast("double") - col("yhat")), 6))
      .withColumn("surprising",
        coalesce(col("resid") > col("qhat"), lit(true)))
}
