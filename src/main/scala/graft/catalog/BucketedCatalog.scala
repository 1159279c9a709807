package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed managed tables — the co-located-join path for fact tables
  * repeatedly joined on the same key (SURVEY §4 "indexes on hot keys" /
  * the build brief's bucketing directive).
  *
  * `bucketBy(n, key)` + `sortBy(key)` at write means BOTH sides of a
  * future equi-join on `key` are already hash-partitioned identically
  * at rest: Spark plans the join with ZERO Exchange (asserted in
  * BucketedJoinSpec). At 100 TB this converts every repeated
  * orders⋈lineitem-style join from a full shuffle of both tables into
  * a local merge per bucket — typically the single largest cost
  * removal available to a star-schema pipeline.
  *
  * Bucketed layout requires the session catalog (bucket metadata lives
  * in the metastore, not parquet footers), so this is a separate
  * surface from the manifest-pointer [[Warehouse]]; pick it for
  * bucket-joined facts, the Warehouse for everything else.
  */
final class BucketedCatalog(spark: SparkSession, database: String = "graft") {

  def init(): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")

  def publishBucketed(
      name: String,
      df: DataFrame,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    init()
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(s"$database.$name")
  }

  def table(name: String): DataFrame = spark.table(s"$database.$name")

  def drop(name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $database.$name")
}
