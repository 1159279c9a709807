package graft

import org.apache.spark.sql.functions._

import graft.functions.GeneratorFunctions.split_frames
import graft.multimodal.Multimodal

/** PruneFrameBytes optimizer rule: length-only frame expansions swap
  * to the copy-free size generator; byte consumers are left alone;
  * results are identical either way.
  */
@graft.tags.Slow
class RuleSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.documentsAsMedia(Tables.documents(spark, sf))

  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("length-only consumption rewrites SplitFrames -> SplitFrameSizes") {
    graft.functions.GraftExtensions.register(spark)
    val q = media
      .select(col("media_id"), split_frames(col("payload"), 256, 2))
      .select(col("media_id"), col("frame_idx"),
        length(col("frame")).as("frame_bytes"))
    val plan = optimized(q)
    assert(plan.contains("split_frame_sizes"), plan)
    assert(!plan.contains("split_frames("), plan)
  }

  test("zero-reference frame (pure counts) also rewrites") {
    graft.functions.GraftExtensions.register(spark)
    val q = media
      .select(col("media_id"), split_frames(col("payload"), 256, 2))
      .select(col("media_id"), col("frame_idx"))
    assert(optimized(q).contains("split_frame_sizes"), optimized(q))
  }

  test("LATERAL VIEW OUTER is NOT rewritten (null-padding semantics)") {
    graft.functions.GraftExtensions.register(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("documents_rule_outer")
    val q = spark.sql(
      """SELECT doc_id, length(f.frame) AS frame_bytes
         FROM (SELECT doc_id, cast(text AS BINARY) AS payload
               FROM documents_rule_outer)
         LATERAL VIEW OUTER split_frames(payload, 256, 2) f
           AS frame_idx, frame""")
    assert(optimized(q).contains("split_frames("), optimized(q))
    assert(!optimized(q).contains("split_frame_sizes"), optimized(q))
  }

  test("byte consumers are NOT rewritten") {
    graft.functions.GraftExtensions.register(spark)
    val q = media
      .select(col("media_id"), split_frames(col("payload"), 256, 2))
      .select(col("media_id"), col("frame_idx"),
        xxhash64(col("frame")).as("h"),
        length(col("frame")).as("frame_bytes"))
    val plan = optimized(q)
    assert(plan.contains("split_frames("), plan)
    assert(!plan.contains("split_frame_sizes"), plan)
  }

  test("rewritten plan returns identical rows, including the SQL " +
      "LATERAL VIEW path") {
    graft.functions.GraftExtensions.register(spark)
    def collectRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val viaRule = collectRows(media
      .select(col("media_id"), split_frames(col("payload"), 256, 2))
      .select(col("media_id"), col("frame_idx"),
        length(col("frame")).as("frame_bytes")))
    // ground truth COLLECTED from the full-bytes generator: the __keep
    // byte consumer defeats the rewrite in the very plan we execute
    // (projecting it away before collect would re-enable the rule via
    // CollapseProject, comparing the rewrite against itself)
    val direct = media
      .select(col("media_id"), split_frames(col("payload"), 256, 2))
      .select(col("media_id"), col("frame_idx"),
        length(col("frame")).as("frame_bytes"),
        xxhash64(col("frame")).as("__keep"))
    assert(optimized(direct).contains("split_frames("))
    val truth = direct.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(viaRule === truth)
    assert(viaRule.nonEmpty)

    Tables.documents(spark, sf).createOrReplaceTempView("documents_rule_test")
    val sql = spark.sql(
      """SELECT doc_id, f.frame_idx, length(f.frame) AS frame_bytes
         FROM (SELECT doc_id, cast(text AS BINARY) AS payload
               FROM documents_rule_test)
         LATERAL VIEW split_frames(payload, 256, 2) f AS frame_idx, frame""")
    assert(optimized(sql).contains("split_frame_sizes"), optimized(sql))
    assert(collectRows(sql) === viaRule)
  }
}
