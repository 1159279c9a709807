package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.Quantize
import graft.text.Bpe

/** Scaling probe for the quantized-domain family (integer k-means,
  * quantized SemDeDup) and the BPE trainer.
  *
  * Embeddings series: sf0.01, sf0.1, and a 20x replica of sf0.1 where
  * copy k gets its embedding ROTATED by k positions (vec rotation is a
  * bijection on dimensions: it preserves every norm and every
  * intra-copy dot product, so per-copy cluster/near-dup structure is
  * exactly sf0.1's, while cross-copy dots decorrelate — the same
  * fixed-density-replica rationale as ScaleProbe's document bijection).
  *
  * The design point being measured for SemDeDup: hold the TARGET
  * CLUSTER SIZE constant (k grows with n, k = n/62 — the knob a real
  * deployment turns), so candidate pairs grow as n * clusterSize / 2,
  * i.e. LINEARLY in n. An exponent near 1.0 on the pair series is the
  * scale claim; quadratic blowup would read ~2.0.
  *
  * BPE series: documents at sf0.01 / sf0.1 / the 10x bijection
  * replica. The bijections multiply the DISTINCT-WORD vocabulary ~10x
  * while total tokens also grow 10x — probing both the corpus->vocab
  * shuffle and the merge loop's aggregate on a 10x vocab.
  */
object QuantProbe {

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
    val embRepDir = sys.env.getOrElse("SPARK_GRAFT_EMB_REPLICA_DIR",
      "/tmp/graft_emb_replica_rot_v1")
    val docRepDir = sys.env.getOrElse("SPARK_GRAFT_REPLICA_DIR",
      "/tmp/graft_sf1_replica_fd_v2")

    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(embRepDir, "_SUCCESS"))) {
      val sf01 = Tables.embeddings(spark, s"$root/sf0.1")
      val copies = (0 until 20).map { k =>
        sf01.select(
          (col("vec_id") * 20 + lit(k)).as("vec_id"),
          // rotate by k: preserves norms and intra-copy dots exactly
          concat(slice(col("embedding"), lit(k + 1), lit(64 - k)),
            slice(col("embedding"), lit(1), lit(k))).as("embedding"),
          col("label"))
      }
      copies.reduce(_.unionAll(_))
        .repartition(32)
        .write.mode("overwrite").parquet(embRepDir)
    }
    ScaleProbe.ensureDocReplica(spark, root, docRepDir)

    import ScaleProbe.{timeSec, slope}

    def quantFamily(emb: DataFrame): (Long, Double, Double, Long, Long) = {
      val n = emb.count()
      val kClusters = math.max(8, (n / 62L).toInt)
      val (q, _) = Quantize.globalInt8(emb, "vec_id", "embedding")
      val qp = q.persist()
      val init = qp.orderBy(col("vec_id")).limit(kClusters)
        .collect().zipWithIndex
        .map { case (r, i) => i -> r.getSeq[Int](1).toSeq }.toSeq
      val (tKm, _) = timeSec(
        Quantize.lloydQ(qp, "vec_id", init, iters = 3)._1.count())
      val assigned = Quantize.assignQ(qp, "vec_id", init).persist()
      // candidate pairs = sum over clusters of n_c*(n_c-1)/2
      val pairs = assigned.groupBy(col("cluster")).count()
        .agg(sum(col("count") * (col("count") - 1))).head().getLong(0) / 2
      val (tSem, kept) = timeSec(
        Quantize.semDedupKeepQ(assigned, "vec_id", 40L, 100L).count())
      assigned.unpersist(); qp.unpersist()
      (n, tKm, tSem, pairs, kept)
    }

    def bpeProbe(docs: DataFrame): (Long, Long, Double) = {
      val nDocs = docs.count()
      val nVocab = Bpe.vocab(docs, "text").count()
      val (t, _) = timeSec {
        val (m, v) = Bpe.train(docs, "text", nMerges = 5)
        v.unpersist(); require(m.size == 5)
      }
      (nDocs, nVocab, t)
    }

    val embScales = Seq(
      "sf0.01" -> Tables.embeddings(spark, s"$root/sf0.01"),
      "sf0.1" -> Tables.embeddings(spark, s"$root/sf0.1"),
      "sf2rep" -> spark.read.parquet(embRepDir))
    val docScales = Seq(
      "sf0.01" -> Tables.documents(spark, s"$root/sf0.01"),
      "sf0.1" -> Tables.documents(spark, s"$root/sf0.1"),
      "sf1rep" -> spark.read.parquet(docRepDir))

    // warm kernels (codegen/JIT) at the smallest scale
    quantFamily(Tables.embeddings(spark, s"$root/sf0.001"))
    bpeProbe(Tables.documents(spark, s"$root/sf0.001"))

    val embRows = embScales.map { case (name, df) =>
      val (n, tKm, tSem, pairs, kept) = quantFamily(df)
      System.err.println(
        f"[qprobe] $name%-7s n=$n%6d km2(3 iters)=$tKm%7.2fs " +
          f"sem=$tSem%7.2fs pairs=$pairs%10d kept=$kept%6d")
      (name, n, tKm, tSem, pairs, kept)
    }
    val docRows = docScales.map { case (name, df) =>
      val (nDocs, nVocab, t) = bpeProbe(df)
      System.err.println(
        f"[qprobe] $name%-7s docs=$nDocs%6d vocab=$nVocab%8d " +
          f"bpe5=$t%7.2fs")
      (name, nDocs, nVocab, t)
    }

    val eKm = slope(embRows.map(r => (math.log(r._2.toDouble), math.log(r._3))))
    val eSem = slope(embRows.map(r => (math.log(r._2.toDouble), math.log(r._4))))
    val ePairs = slope(embRows.map(r =>
      (math.log(r._2.toDouble), math.log(r._5.toDouble))))
    val eBpe = slope(docRows.map(r => (math.log(r._2.toDouble), math.log(r._4))))

    val embJson = embRows.map { case (name, n, tKm, tSem, pairs, kept) =>
      s""""$name":{"n":$n,"km2_sec":${f"$tKm%.2f"},""" +
        s""""sem_sec":${f"$tSem%.2f"},"pairs":$pairs,"kept":$kept}"""
    }.mkString("{", ",", "}")
    val docJson = docRows.map { case (name, nDocs, nVocab, t) =>
      s""""$name":{"docs":$nDocs,"vocab":$nVocab,"bpe5_sec":${f"$t%.2f"}}"""
    }.mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"quant_probe","emb":$embJson,"docs":$docJson,""" +
      s""""km2_exponent":${f"$eKm%.3f"},"sem_exponent":${f"$eSem%.3f"},""" +
      s""""pairs_exponent":${f"$ePairs%.3f"},""" +
      s""""bpe_exponent":${f"$eBpe%.3f"}}""")
  }
}
