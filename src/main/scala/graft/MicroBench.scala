package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timings for the dedup hot path (not part of
  * the driver contract). Usage: tools/run.sh graft.MicroBench <sfDir>
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[micro] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    import graft.dedup.Dedup
    val docs = Tables.documents(spark, sfDir)
    time("docs.count")(docs.count())

    val toks = docs.select(col("doc_id").as("id"),
      Dedup.tokens(col("text")).as("__toks"))
    time("tokenize")(toks.count())

    val shingled = toks.select(col("id"),
      Dedup.wordShinglesFromTokens(col("__toks"), 3).as("__shingles"))
    time("shingle")(shingled.select(sum(size(col("__shingles")))).head())

    val signed = shingled.select(col("id"),
      Dedup.minhashSignature(col("__shingles"), 64).as("sig"))
    time("sign(sig)")(signed.select(sum(pmod(element_at(col("sig"), 1), lit(1000000)))).head())

    time("sign x2")(signed.select(sum(pmod(element_at(col("sig"), 1), lit(1000000)))).head())

    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.2)
    time("minhashPairs full")(pairs.count())

    val pairs15 = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.15)
    time("minhashPairs t=0.15")(pairs15.count())

    val ngp = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      threshold = 0.5, candidateThreshold = 0.15)
    time("ngramJaccardPairs")(ngp.count())

    // pipe1 stage decomposition
    {
      import graft.text.TextFunctions
      val quality = docs.filter(TextFunctions.qualityScore(col("text")) > 0.3)
      time("pipe1: quality filter")(quality.count())
      val kept = quality.join(
        Dedup.exactKeepIds(quality, "doc_id", "text"), Seq("doc_id"), "left_semi")
      time("pipe1: exact dedup semi-join")(kept.count())
      val keptP = kept.persist()
      time("pipe1: persist materialize")(keptP.count())
      val nearPairs = Dedup.exactJaccardPairs(keptP, "doc_id", "text",
        threshold = 0.9)
      time("pipe1: exactJaccardPairs(cached)")(nearPairs.count())
      val fin = Dedup.keepAfterPairs(keptP, "doc_id", nearPairs)
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"),
          TextFunctions.langId(col("text")).as("predicted_lang"))
      time("pipe1: final anti+project")(fin.count())
      // drop the stage cache so the end-to-end number measures a COLD
      // run (pipe1's internal persist would otherwise hit this entry)
      keptP.unpersist(blocking = true)
      time("pipe1: full query (cold)")(
        graft.queries.Extensions.pipe1CorpusClean(spark, sfDir).count())
    }

    spark.stop()
  }
}
