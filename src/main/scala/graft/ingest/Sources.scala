package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Declarative source specs — the reference's per-dataset file registry
  * (`load_dataset.py:92-118`: each dataset owns URLs/files with declared
  * schemas; schemas are never inferred in production, SURVEY §1.2).
  */
trait SourceSpec {
  def name: String
  def read(spark: SparkSession): DataFrame
}

/** Parquet at rest (the engine's native format). */
final case class ParquetSource(name: String, path: String) extends SourceSpec {
  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** CSV with a DECLARED schema — S3 in SURVEY §2.1 (`load_dataset.py:367`
  * delegates to nycdb's schema-driven COPY; never `inferSchema`).
  */
final case class CsvSource(
    name: String,
    path: String,
    schema: StructType,
    header: Boolean = true,
    delimiter: String = ",") extends SourceSpec {
  def read(spark: SparkSession): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .csv(path)
}

/** JSON-Lines with a DECLARED schema — the de-facto interchange format
  * of training-data pipelines (one JSON document per line, splittable,
  * append-friendly). Schema is declared, never inferred (inference
  * costs a full extra pass over 100 TB and is non-deterministic under
  * ragged keys); unparseable lines are captured in a `_corrupt_record`
  * column when the schema declares one, PERMISSIVE-mode default
  * otherwise.
  */
final case class JsonlSource(
    name: String,
    path: String,
    schema: StructType) extends SourceSpec {
  def read(spark: SparkSession): DataFrame =
    spark.read.schema(schema).json(path)
}

/** ORC at rest — the other splittable columnar format Spark reads
  * natively (predicate pushdown + column pruning apply exactly as for
  * parquet); warehouses migrating from Hive hand these over as-is.
  */
final case class OrcSource(name: String, path: String) extends SourceSpec {
  def read(spark: SparkSession): DataFrame = spark.read.orc(path)
}

/** Raw text, one row per line (`value: string`) — the entry point for
  * unprocessed crawl/log dumps before any structure is imposed; pair
  * with `graft.text.TextFunctions` for the parse step. Splittable on
  * line boundaries, so 100 TB of text fans out like any columnar scan
  * (wholetext=false default).
  */
final case class TextSource(name: String, path: String) extends SourceSpec {
  def read(spark: SparkSession): DataFrame = spark.read.text(path)
}

/** Optional/protected source with declared-schema empty fallback — S5
  * (`ocautil.py:49-68`, `signatureutil.py:52-71`: if S3 creds are
  * absent, publish EMPTY tables with the right schema rather than fail).
  * `available` models the creds/path check.
  */
final case class OptionalSource(
    name: String,
    inner: SourceSpec,
    schema: StructType,
    available: () => Boolean) extends SourceSpec {
  def read(spark: SparkSession): DataFrame =
    if (available()) inner.read(spark)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
}
