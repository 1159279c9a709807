package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.export.CorpusExport
import graft.ingest.JsonlSource

class ExportSpec extends SparkSpec {
  import spark.implicits._

  test("JSONL shard export round-trips through the declared-schema source") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
    val dir = Files.createTempDirectory("graft-export").toString + "/jsonl"
    CorpusExport.writeJsonlShards(docs, dir,
      maxRecordsPerShard = 100, partitionByCols = Seq("lang"),
      numTasks = Some(4), compression = "none")

    // shard-size contract: no file exceeds the record budget
    val files = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".json"))
    assert(files.nonEmpty)
    assert(files.forall(f =>
      scala.io.Source.fromFile(f).getLines().size <= 100))

    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)))
    val back = JsonlSource("docs", dir, schema).read(spark)
    assert(back.count() === docs.count())
    def contentHash(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum(pmod(xxhash64(col("doc_id"), col("text")), lit(1000000007L))))
        .head().getLong(0)
    assert(contentHash(docs.select(col("doc_id"), col("text"))) ===
      contentHash(back))
  }

  test("weightedInterleave: prefix ratios approximate the weights; deterministic") {
    val a = (1 to 900).map(i => (s"a$i", "web")).toDF("id", "src")
    val b = (1 to 300).map(i => (s"b$i", "code")).toDF("id", "src")
    val mixed = CorpusExport.weightedInterleave(Seq(a -> 3, b -> 1))
    val prefix = mixed.limit(400).collect().map(_.getString(1))
    val webFrac = prefix.count(_ == "web").toDouble / prefix.length
    assert(webFrac > 0.6 && webFrac < 0.9, s"webFrac=$webFrac")
    // deterministic across runs
    val again = CorpusExport.weightedInterleave(Seq(a -> 3, b -> 1))
      .limit(50).collect().map(_.getString(0)).toSeq
    val first = mixed.limit(50).collect().map(_.getString(0)).toSeq
    assert(again === first)
  }
}
