package graft

import org.apache.spark.sql.functions._

import graft.queries.Audit

/** Label-audit batch: planted mislabels are the suspects; separated
  * clusters score silhouette near 1.
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  /** 3 well-separated clusters of 7 vectors; vec 20 carries label 0
    * but sits in cluster 2 (a planted annotation error).
    */
  private lazy val plantedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("audit").toString
    val rows = for {
      c <- 0 to 2
      j <- 0 to 6
    } yield {
      val id = c * 7 + j
      val base = Array.fill(8)(0.0f)
      base(c) = 10.0f
      base(3 + c) = j * 0.1f // slight within-cluster spread
      val label = if (id == 20) 0 else c
      (id.toLong, base.toSeq, label)
    }
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("knn2: the planted mislabel is its class's only suspect; " +
      "clean classes are pure") {
    val rows = Audit.knn2LabelAudit(spark, plantedDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getAs[Double]("purity6"))).toMap
    // label 0 has 8 members (7 clean + the planted stray): 1 suspect
    assert(rows(0)._1 == 8 && rows(0)._2 == 1)
    assert(rows(1) == ((7L, 0L, 1.0)))
    assert(rows(2)._2 == 0)
  }

  test("cent1: separated clusters -> silhouette near 1; the " +
      "mislabeled class scores lowest") {
    val rows = Audit.cent1ClassSilhouette(spark, plantedDir).collect()
      .map(r => r.getInt(0) -> r.getAs[Double]("mean_sil6")).toMap
    assert(rows(1) > 0.8 && rows(2) > 0.5)
    assert(rows(0) < rows(1), "the class holding the stray must " +
      "score below a clean class")
  }

  test("knn2/cent1 on the real corpus: every vector audited, " +
      "silhouette in [-1, 1]") {
    val n = Tables.embeddings(spark, sf).count()
    val knn = Audit.knn2LabelAudit(spark, sf).collect()
    assert(knn.map(_.getLong(1)).sum == n)
    val sil = Audit.cent1ClassSilhouette(spark, sf).collect()
    assert(sil.map(_.getLong(1)).sum == n)
    sil.foreach(r => assert(math.abs(r.getAs[Double]("mean_sil6"))
      <= 1.0))
  }
}
