package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the round-10 heavy operators: times
  * dd13 (containment), rec1/apr1 (basket mining), kcore1 (peel), and
  * hits1 (bipartite link analysis) at sf0.01 / sf0.1 / a
  * FIXED-DENSITY 10x replica of sf0.1, then fits log-log growth
  * exponents (ScaleProbe methodology; results feed BASELINE.md).
  *
  * Replica construction per table family:
  *  - documents: ScaleProbe's character-bijection replica (each copy's
  *    intra-copy trigram structure is exactly sf0.1's; cross-copy
  *    overlap collapses) — shared on disk.
  *  - lineitem/orders: ten DISJOINT copies with keys shifted into
  *    non-overlapping ranges (ok*10+k, pk+k*10^8, ck+k*10^8). Baskets,
  *    the co-purchase graph, and the customer-part bipartite graph
  *    each become ten isomorphic disconnected copies — per-capita
  *    density is EXACTLY sf0.1's, so the measured growth isolates the
  *    shuffle/join machinery, not a density artifact.
  */
object MiningProbe {

  private[graft] def ensureTradeReplica(
      spark: SparkSession, root: String, dir: String): Unit = {
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "lineitem.parquet", "_SUCCESS"))) {
      val li = Tables.lineitem(spark, s"$root/sf0.1")
      val o = Tables.orders(spark, s"$root/sf0.1")
      val liCopies = (0 until 10).map { k =>
        li.select(
          (col("l_orderkey") * 10 + lit(k)).as("l_orderkey"),
          (col("l_partkey") + lit(k * 100000000L)).as("l_partkey"),
          col("l_suppkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"),
          col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      }
      liCopies.reduce(_.unionAll(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val oCopies = (0 until 10).map { k =>
        o.select(
          (col("o_orderkey") * 10 + lit(k)).as("o_orderkey"),
          (col("o_custkey") + lit(k * 100000000L)).as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority"))
      }
      oCopies.reduce(_.unionAll(_)).repartition(32)
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
    ScaleProbe.ensureDocReplica(spark, root, docReplica)
    ensureTradeReplica(spark, root, tradeReplica)

    // the doc replica is a bare parquet dir of documents rows; the
    // queries expect dir/documents.parquet — symlink shim
    val docDir = "/tmp/graft_sf1_docdir"
    val link = java.nio.file.Paths.get(docDir, "documents.parquet")
    java.nio.file.Files.createDirectories(link.getParent)
    if (!java.nio.file.Files.exists(link,
        java.nio.file.LinkOption.NOFOLLOW_LINKS))
      java.nio.file.Files.createSymbolicLink(link,
        java.nio.file.Paths.get(docReplica))

    val probes: Seq[(String, (SparkSession, String) => DataFrame, Boolean)] =
      Seq(
        ("dd13_containment", graft.queries.Mining.dd13Containment _, true),
        ("rec1_item_cooc", graft.queries.Mining.rec1ItemCooc _, false),
        ("apr1_frequent_triples",
          graft.queries.Mining2.apr1FrequentTriples _, false),
        ("kcore1_kcore_peel", graft.queries.Mining.kcore1KcorePeel _, false),
        ("hits1_bipartite_hits",
          graft.queries.Mining2.hits1BipartiteHits _, false))

    probes.foreach { case (name, fn, usesDocs) =>
      val dirs = if (usesDocs)
        Seq(s"$root/sf0.01", s"$root/sf0.1", docDir)
      else Seq(s"$root/sf0.01", s"$root/sf0.1", tradeReplica)
      // warm once at the smallest scale so JIT/codegen cost stays out
      // of the fitted series
      fn(spark, dirs.head).count()
      val series = dirs.zip(Seq(1.0, 10.0, 100.0)).map { case (dir, n) =>
        val (sec, rows) = ScaleProbe.timeSec(fn(spark, dir).count())
        System.err.println(f"[probe] $name%-24s n=$n%5.0f  $sec%8.2f s  ($rows rows)")
        (math.log(n), math.log(sec))
      }
      val exp = ScaleProbe.slope(series)
      // fit on the upper pair too: small scales are overhead-dominated
      val expTail = ScaleProbe.slope(series.drop(1))
      println(f"$name%-24s exponent(all)=$exp%.2f exponent(0.1->1)=$expTail%.2f")
    }
    spark.stop()
  }
}
