package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scaling probe for the round-8 corpus-analytics family: times word
  * entropy (ent1), PMI collocations (cooc1), the composite quality
  * gate (qf1), and trigram substring search (sub1) at sf0.01, sf0.1,
  * and the 10x fixed-density document replica
  * ([[ScaleProbe.ensureDocReplica]] — distinct character bijection per
  * copy, so per-capita token statistics match sf0.1 while cross-copy
  * structure stays disjoint), then fits the log-log growth exponent of
  * each op across the last two decades. All four are
  * aggregation-shaped (no pairwise joins), so the 100 TB claim is a
  * near-1.0 exponent; results feed BASELINE.md's analytics addendum.
  *
  * Usage: runMain graft.AnalyticsProbe  (env: SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_DATA_ROOT, SPARK_GRAFT_REPLICA_DIR)
  */
object AnalyticsProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = sys.env.getOrElse("SPARK_GRAFT_DATA_ROOT", "/root/testdata")
    val replicaDir = sys.env.getOrElse("SPARK_GRAFT_REPLICA_DIR",
      "/tmp/graft_sf1_replica_fd_v2")
    ScaleProbe.ensureDocReplica(spark, root, replicaDir)

    import graft.queries.Analytics
    val ops: Seq[(String, DataFrame => Long)] = Seq(
      "ent1_word_entropy" -> (d => Analytics.wordEntropyOn(d).count()),
      "cooc1_pmi" -> (d => Analytics.pmiOn(d).count()),
      "qf1_quality_rules" -> (d => Analytics.qualityRulesOn(d).count()),
      "sub1_trigram_search" ->
        (d => graft.text.Search.substringSearch(d, "vector").count()))

    val scales: Seq[(String, () => DataFrame)] = Seq(
      "sf0.01" -> (() => Tables.documents(spark, s"$root/sf0.01")),
      "sf0.1" -> (() => Tables.documents(spark, s"$root/sf0.1")),
      "sf1r" -> (() => spark.read.parquet(replicaDir)))

    // warmup pass at the smallest scale absorbs JIT/codegen
    ops.foreach { case (_, f) =>
      f(Tables.documents(spark, s"$root/sf0.001")) }

    val rows = ops.map { case (name, f) =>
      val times = scales.map { case (label, mk) =>
        val (sec, n) = ScaleProbe.timeSec(f(mk()))
        System.err.println(f"[probe] $name%-22s $label%-7s $sec%7.2f s ($n rows)")
        label -> sec
      }.toMap
      // exponent over each decade of the series
      val e1 = math.log(times("sf0.1") / times("sf0.01")) / math.log(10.0)
      val e2 = math.log(times("sf1r") / times("sf0.1")) / math.log(10.0)
      f"""{"op":"$name","sf0_01":${times("sf0.01")}%.3f,""" +
        f""""sf0_1":${times("sf0.1")}%.3f,"sf1r":${times("sf1r")}%.3f,""" +
        f""""exp_01_to_1":$e1%.2f,"exp_1_to_10":$e2%.2f}"""
    }
    println(rows.mkString("[", ",", "]"))
    spark.stop()
  }
}
