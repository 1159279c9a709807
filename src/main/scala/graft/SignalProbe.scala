package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the round-11 heavy operators: the graph family
  * (lp1 label propagation, ppr1 personalized PageRank, deg1 degree
  * distribution) on MiningProbe's fixed-density trade replica, the
  * corpus family (nb1 Naive Bayes, fh1 feature hashing) on
  * ScaleProbe's doc replica, and the event-stream family (att1
  * attribution, rol1 rolling distinct, isl1 islands) on a new
  * fixed-density events/orders replica (ten DISJOINT user/customer
  * copies — per-key density exactly sf0.1's, so growth isolates the
  * shuffle machinery). Exponents feed BASELINE.md.
  */
object SignalProbe {

  private[graft] def ensureEventsReplica(
      spark: SparkSession, root: String, dir: String): Unit = {
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "events.parquet", "_SUCCESS"))) {
      val ev = Tables.events(spark, s"$root/sf0.1")
      (0 until 10).map { k =>
        ev.select(
          (col("event_id") * 10 + lit(k)).as("event_id"),
          col("ts"),
          (col("user_id") + lit(k * 100000000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_.unionAll(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val o = Tables.orders(spark, s"$root/sf0.1")
      (0 until 10).map { k =>
        o.select(
          (col("o_orderkey") * 10 + lit(k)).as("o_orderkey"),
          (col("o_custkey") + lit(k * 100000000L)).as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority"))
      }.reduce(_.unionAll(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    }
  }

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
    val docReplica = sys.env.getOrElse("SPARK_GRAFT_REPLICA_DIR",
      "/tmp/graft_sf1_replica_fd_v2")
    val tradeReplica = sys.env.getOrElse("SPARK_GRAFT_TRADE_REPLICA_DIR",
      "/tmp/graft_sf1_trade_replica_v1")
    val eventsReplica = sys.env.getOrElse("SPARK_GRAFT_EVENTS_REPLICA_DIR",
      "/tmp/graft_sf1_events_replica_v1")
    ScaleProbe.ensureDocReplica(spark, root, docReplica)
    MiningProbe.ensureTradeReplica(spark, root, tradeReplica)
    ensureEventsReplica(spark, root, eventsReplica)

    val docDir = "/tmp/graft_sf1_docdir"
    val link = java.nio.file.Paths.get(docDir, "documents.parquet")
    java.nio.file.Files.createDirectories(link.getParent)
    if (!java.nio.file.Files.exists(link,
        java.nio.file.LinkOption.NOFOLLOW_LINKS))
      java.nio.file.Files.createSymbolicLink(link,
        java.nio.file.Paths.get(docReplica))

    val graphDir = tradeReplica
    val probes: Seq[(String, (SparkSession, String) => DataFrame, String)] =
      Seq(
        ("lp1_label_prop", graft.queries.Trend.lp1LabelProp _, graphDir),
        ("ppr1_personalized_pagerank",
          graft.queries.Signals.ppr1PersonalizedPagerank _, graphDir),
        ("deg1_degree_distribution",
          graft.queries.Signals.deg1DegreeDistribution _, graphDir),
        ("nb1_naive_bayes", graft.queries.Diverge.nb1NaiveBayes _, docDir),
        ("fh1_feature_hash", graft.queries.Signals.fh1FeatureHash _, docDir),
        ("att1_last_touch", graft.queries.Behavior.att1LastTouch _,
          eventsReplica),
        ("rol1_rolling_distinct",
          graft.queries.Series.rol1RollingDistinct _, eventsReplica),
        ("isl1_gaps_islands", graft.queries.Series.isl1GapsIslands _,
          eventsReplica))

    probes.foreach { case (name, fn, bigDir) =>
      fn(spark, s"$root/sf0.01").count() // JIT/codegen warmup
      val series = Seq(s"$root/sf0.01", s"$root/sf0.1", bigDir)
        .zip(Seq(1.0, 10.0, 100.0)).map { case (dir, n) =>
          val (sec, rows) = ScaleProbe.timeSec(fn(spark, dir).count())
          System.err.println(
            f"[probe] $name%-26s n=$n%5.0f  $sec%8.2f s  ($rows rows)")
          (math.log(n), math.log(sec))
        }
      val exp = ScaleProbe.slope(series)
      val expTail = ScaleProbe.slope(series.drop(1))
      println(f"$name%-26s exponent(all)=$exp%.2f exponent(0.1->1)=$expTail%.2f")
    }
    spark.stop()
  }
}
