package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the round-12 operators: geo1 grid radius join
  * and psm1 banded matching (both candidate-generation joins whose
  * 100 TB story is "bounded equi-join, never quadratic"), bt1's
  * duel aggregation, conf1's conformal windows, and iso1's bin
  * aggregate, on a fixed-schema 10x customer/orders/lineitem replica
  * (disjoint key ranges; the part dimension stays fixed — dimensions
  * don't grow with the corpus).
  *
  * geo1/psm1 grow their OUTPUT quadratically by construction (10x
  * points in the same space => ~100x pairs), so the probe reports
  * rows alongside seconds — the honest scale question is whether
  * time tracks candidate work (output), not input.
  */
object MatchProbe {

  private[graft] def ensureMatchReplica(
      spark: SparkSession, root: String, dir: String): Unit = {
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "customer.parquet", "_SUCCESS"))) {
      val c = Tables.customer(spark, s"$root/sf0.1")
      (0 until 10).map { k =>
        c.select(
          (col("c_custkey") + lit(k * 100000000L)).as("c_custkey"),
          col("c_name"), col("c_nationkey"), col("c_acctbal"),
          col("c_mktsegment"))
      }.reduce(_.unionAll(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      val o = Tables.orders(spark, s"$root/sf0.1")
      (0 until 10).map { k =>
        o.select(
          (col("o_orderkey") * 10 + lit(k)).as("o_orderkey"),
          (col("o_custkey") + lit(k * 100000000L)).as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority"))
      }.reduce(_.unionAll(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val li = Tables.lineitem(spark, s"$root/sf0.1")
      // l_partkey UNCHANGED: part is a fixed dimension, so the brand
      // duel space stays 25 items while duel volume grows 10x
      (0 until 10).map { k =>
        li.select(
          (col("l_orderkey") * 10 + lit(k)).as("l_orderkey"),
          col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax"), col("l_returnflag"), col("l_linestatus"),
          col("l_shipdate"))
      }.reduce(_.unionAll(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      Tables.part(spark, s"$root/sf0.1").write.mode("overwrite")
        .parquet(s"$dir/part.parquet")
    }
  }

  /** 10x embeddings replica (disjoint vec_ids, vectors/labels kept) —
    * knn2's workload is quadratic in vectors BY DESIGN (exact self
    * top-k); the probe documents that honestly, with the LSH/IVF
    * family as the corpus-scale path.
    */
  private[graft] def ensureEmbReplica(
      spark: SparkSession, root: String, dir: String): Unit = {
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "embeddings.parquet", "_SUCCESS"))) {
      val e = Tables.embeddings(spark, s"$root/sf0.1")
      (0 until 10).map { k =>
        e.select((col("vec_id") + lit(k * 100000000L)).as("vec_id"),
          col("embedding"), col("label"))
      }.reduce(_.unionAll(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
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
    val replica = sys.env.getOrElse("SPARK_GRAFT_MATCH_REPLICA_DIR",
      "/tmp/graft_sf1_match_replica_v1")
    ensureMatchReplica(spark, root, replica)

    val embReplica = sys.env.getOrElse("SPARK_GRAFT_EMB_REPLICA_DIR",
      "/tmp/graft_sf1_emb_replica_v1")
    ensureEmbReplica(spark, root, embReplica)
    val eventsReplica = sys.env.getOrElse(
      "SPARK_GRAFT_EVENTS_REPLICA_DIR",
      "/tmp/graft_sf1_events_replica_v1")
    SignalProbe.ensureEventsReplica(spark, root, eventsReplica)

    val probes: Seq[(String, (SparkSession, String) => DataFrame,
        String)] = Seq(
      ("geo1_radius_pairs", graft.queries.Geo.geo1RadiusPairs _,
        replica),
      ("geo2_kernel_density", graft.queries.Geo.geo2KernelDensity _,
        replica),
      ("psm1_propensity_match",
        graft.queries.Robust.psm1PropensityMatch _, replica),
      ("bt1_bradley_terry", graft.queries.Pref.bt1BradleyTerry _,
        replica),
      ("conf1_split_conformal",
        graft.queries.Robust.conf1SplitConformal _, replica),
      ("iso1_isotonic_rate", graft.queries.Shape.iso1IsotonicRate _,
        replica),
      ("srk1_spearman_rank", graft.queries.Fit.srk1SpearmanRank _,
        replica),
      ("pid1_panel_fe", graft.queries.Panel.pid1PanelFixedEffects _,
        replica),
      ("knn2_label_audit", graft.queries.Audit.knn2LabelAudit _,
        embReplica),
      ("cent1_class_silhouette",
        graft.queries.Audit.cent1ClassSilhouette _, embReplica),
      ("psi1_stability", graft.queries.Guard.psi1Stability _,
        eventsReplica),
      ("cuped1_variance_reduction",
        graft.queries.Exp.cuped1VarianceReduction _, eventsReplica),
      ("rm1_ratio_delta_ci", graft.queries.Seg.rm1RatioDeltaCi _,
        eventsReplica),
      ("cv1_kfold_ols", graft.queries.Panel.cv1KfoldOls _,
        eventsReplica))

    probes.foreach { case (name, fn, bigDir) =>
      fn(spark, s"$root/sf0.01").count() // JIT/codegen warmup
      val series = Seq(s"$root/sf0.01", s"$root/sf0.1", bigDir)
        .zip(Seq(1.0, 10.0, 100.0)).map { case (dir, n) =>
          val (sec, rows) = ScaleProbe.timeSec(fn(spark, dir).count())
          System.err.println(
            f"[probe] $name%-24s n=$n%5.0f  $sec%8.2f s  ($rows rows)")
          (math.log(n), math.log(sec))
        }
      val exp = ScaleProbe.slope(series)
      val expTail = ScaleProbe.slope(series.drop(1))
      println(f"$name%-24s exponent(all)=$exp%.2f exponent(0.1->1)=$expTail%.2f")
    }
    spark.stop()
  }
}
