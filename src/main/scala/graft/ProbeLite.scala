package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated dd7/dd6 reading on an arbitrary documents parquet —
  * the single-purpose recheck used to adjudicate a full ScaleProbe's
  * heavy legs against host contention (run it alone, compare with
  * /proc/loadavg; see BASELINE.md round-17 adjudication).
  *
  * Usage: tools/run.sh graft.ProbeLite <documents-parquet-dir>
  */
object ProbeLite {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet(args(0))
    // warm on the PROBED frame itself (a bounded slice through the
    // same dd7 pipeline): compiles the same codegen, touches the same
    // parquet footers, and works on any host — a hardcoded testdata
    // path crashed elsewhere and left first-touch costs on the first
    // timed leg because it warmed a different dataset
    graft.dedup.Dedup.exactJaccardPairs(
      df.limit(500), "doc_id", "text", threshold = 0.8).count()
    val (t7, p7) = ScaleProbe.timeSec(graft.dedup.Dedup
      .exactJaccardPairs(df, "doc_id", "text", threshold = 0.8).count())
    val (t6, c6) = ScaleProbe.timeSec {
      val pairs = graft.dedup.Dedup
        .exactJaccardPairs(df, "doc_id", "text", threshold = 0.8)
      graft.dedup.Dedup.nearDupClusters(df, "doc_id", pairs)
        .groupBy(col("component")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).count()
    }
    println(f"dd7=$t7%.2f s ($p7 pairs)  dd6=$t6%.2f s ($c6 clusters)")
    spark.stop()
  }
}
