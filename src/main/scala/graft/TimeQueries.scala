package graft

import org.apache.spark.sql.SparkSession

/** Throwaway dev timer: run named SparkEntry queries once each.
  * Usage: tools/run.sh graft.TimeQueries <sfDir> q1 q2 ...
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, sfDir).count()
      System.err.println(f"[time] $n%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($rows rows)")
    }
    spark.stop()
  }
}
