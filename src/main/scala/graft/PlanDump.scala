package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool (round 14): dump `.explain("formatted")` for a named list
  * of queries into per-query files — the before/after plan evidence
  * for plans/r14/<query>_{before,after}.txt.
  *
  * Usage: tools/run.sh graft.PlanDump <sfDir> <outDir> <suffix> q1,q2,...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(',').map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      // "kernel:dd7" dumps the exact-Jaccard kernel's own plan — the
      // dd7 query surface reads the TruthSets checkpoint, so its
      // query-level plan is just an RDD scan and hides the kernel
      val df = if (n == "kernel:dd7")
        graft.dedup.Dedup.exactJaccardPairs(
          Tables.documents(spark, sfDir), "doc_id", "text", threshold = 0.8)
      else SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${n}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[plandump] $n -> ${n}_$suffix.txt")
    }
    spark.stop()
  }
}
