package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (round 14, NOT part of the driver contract): stage-level
  * decomposition of the exact-Jaccard prefix-filter kernel
  * ([[graft.dedup.Dedup.exactJaccardPairs]]) — the single largest
  * cost center of the bench (dd7 directly; pipe1/2/4/5/6 via their
  * near-dup stages). Times each stage with the noop sink (guide §1.4)
  * so the sink never pollutes the measurement, and labels jobs
  * (guide §1.5).
  *
  * Usage: tools/run.sh graft.KernelProbe [sfDir] [reps]
  */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time(name: String)(f: => Unit): Double = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[kernel] $name%-40s $sec%8.3f s")
      spark.sparkContext.setJobDescription(null)
      sec
    }

    import org.apache.spark.sql.expressions.Window
    val n = 3
    val threshold = 0.8
    val saltBuckets = 16

    // warmup JIT/codegen on the small sibling
    val small = new java.io.File(new java.io.File(sfDir).getAbsoluteFile
      .getParentFile, "sf0.01").getPath
    noop(graft.dedup.Dedup.exactJaccardPairs(
      Tables.documents(spark, small), "doc_id", "text",
      threshold = threshold))

    (1 to reps).foreach { rep =>
      System.err.println(s"=== rep $rep ===")
      val docs = Tables.documents(spark, sfDir)
      System.err.println(
        s"[kernel] scan partitions: ${docs.rdd.getNumPartitions}")

      // ---- stage decomposition (mirrors Dedup.exactJaccardPairs) ----
      val sets = docs.select(col("doc_id").as("id"),
        graft.functions.HashFunctions.char_ngram_set(
          lower(trim(col("text"))), n).as("__set"))
      time("A sets: scan+ngram_set (1 pass)")(noop(sets))

      val g = sets.select(col("id"), size(col("__set")).as("__sz"),
        explode(col("__set")).as("gram"))
      time("B g: + explode")(noop(g))

      val freq = broadcast(g.groupBy("gram").agg(count(lit(1)).as("__df")))
      time("C freq agg")(noop(g.groupBy("gram").agg(count(lit(1)).as("__df"))))

      val ranked = g.join(freq, "gram")
        .withColumn("__r", row_number().over(
          Window.partitionBy("id").orderBy(col("__df"), col("gram"))))
      val prefix = ranked
        .filter(col("__r") <= col("__sz") - ceil(lit(threshold) * col("__sz")) + 1)
        .select(col("id"), col("gram"), col("__sz"), col("__r"))
      time("D prefix: freq-join + window + filter")(noop(prefix))

      val tOver1t = threshold / (1.0 + threshold)
      val cands = graft.ops.Ops.saltedJoin(
        prefix.select(col("id").as("id_a"), col("gram"),
          col("__sz").as("__sza"), col("__r").as("__ra")),
        prefix.select(col("id").as("id_b"), col("gram"),
          col("__sz").as("__szb"), col("__r").as("__rb")),
        Seq("gram"), saltBuckets)
        .filter(col("id_a") < col("id_b"))
        .filter(col("__szb") >= ceil(lit(threshold) * col("__sza")) &&
          col("__sza") >= ceil(lit(threshold) * col("__szb")))
        .filter(lit(1) + least(col("__sza") - col("__ra"),
            col("__szb") - col("__rb")) >=
          ceil(lit(tOver1t) * (col("__sza") + col("__szb"))))
        .select(col("id_a"), col("id_b"))
        .distinct()
      time("E cands: salted self-join + distinct")(noop(cands))

      val hsets = sets.select(col("id"),
        sort_array(transform(col("__set"), g0 => xxhash64(g0))).as("__h"))
      val jac = {
        val inter = graft.functions.VectorFunctions
          .sorted_intersect_count(col("__ha"), col("__hb")).cast("double")
        inter / (size(col("__ha")) + size(col("__hb")) - inter)
      }
      val full = cands
        .join(hsets.select(col("id").as("id_a"), col("__h").as("__ha")), Seq("id_a"))
        .join(hsets.select(col("id").as("id_b"), col("__h").as("__hb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"), jac.as("jaccard"))
        .filter(col("jaccard") >= threshold)
      time("F full kernel end-to-end")(noop(full))

      // the as-shipped call for reference
      time("G Dedup.exactJaccardPairs (shipped)")(noop(
        graft.dedup.Dedup.exactJaccardPairs(docs, "doc_id", "text",
          threshold = threshold)))

      // hypothesis: spread the single-partition scan across cores
      val spreadDocs = docs.repartition(32, col("doc_id"))
      time("H shipped kernel on 32-way spread input")(noop(
        graft.dedup.Dedup.exactJaccardPairs(spreadDocs, "doc_id", "text",
          threshold = threshold)))
    }
    spark.stop()
  }
}
