package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media plumbing: schema, byte lengths, deterministic stub features") {
    val media = Multimodal.documentsAsMedia(Tables.documents(spark, sf))
    assert(media.schema.fieldNames.toSeq ===
      Seq("media_id", "media_type", "payload", "width", "height"))
    assert(media.schema("payload").dataType ===
      org.apache.spark.sql.types.BinaryType)

    val feats = Multimodal.extractFeatures(spark, media,
      new Multimodal.StubDecoder(8), batchSize = 64)
    val rows = feats.collect()
    assert(rows.length === 500)
    assert(rows.forall(_.features.length === 8))
    assert(rows.forall(r => r.n_bytes > 0))

    // determinism: a second run produces identical features
    val again = Multimodal.extractFeatures(spark, media,
      new Multimodal.StubDecoder(8), batchSize = 7).collect()
    val byId = rows.map(r => r.media_id -> r.features.toSeq).toMap
    assert(again.forall(r => byId(r.media_id) == r.features.toSeq))
  }

  test("stub decoder is a pure function of payload bytes") {
    val d = new Multimodal.StubDecoder(4)
    val a = d.decode("hello world".getBytes("UTF-8")).toSeq
    val b = d.decode("hello world".getBytes("UTF-8")).toSeq
    val c = d.decode("hello worle".getBytes("UTF-8")).toSeq
    assert(a === b)
    assert(a !== c)
  }

  test("resizeMedia: binary->binary with updated metadata, bounded size") {
    val media = Multimodal.documentsAsMedia(Tables.documents(spark, sf))
    val resized = Multimodal.resizeMedia(spark, media, 16, 16,
      new Multimodal.StubResizer, batchSize = 32).collect()
    assert(resized.length === 500)
    assert(resized.forall(r => r.width == 16 && r.height == 16))
    assert(resized.forall(r => r.payload.length <= 16 * 16))
    // deterministic
    val again = Multimodal.resizeMedia(spark, media, 16, 16,
      new Multimodal.StubResizer, batchSize = 7).collect()
    val byId = resized.map(r => r.media_id -> r.payload.toSeq).toMap
    assert(again.forall(r => byId(r.media_id) == r.payload.toSeq))
  }

  test("sampleFrames: every-nth fixed windows with provenance, exact bytes") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](2500)(i => (i % 127).toByte)
    val one = Seq(Multimodal.MediaRecord(7L, "video/stub", payload, 0, 0))
      .toDF()
    val frames = Multimodal.sampleFrames(spark, one,
      frameBytes = 1000, everyNth = 2).collect().sortBy(_.frame_idx)
    // 3 frames of (1000, 1000, 500); sampled idx 0 and 2
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2))
    assert(frames.map(_.payload.length).toSeq === Seq(1000, 500))
    assert(frames(0).payload.toSeq === payload.slice(0, 1000).toSeq)
    assert(frames(1).payload.toSeq === payload.slice(2000, 2500).toSeq)
  }

  test("SplitFrames generator == sampleFrames flatMap dual, byte for byte") {
    import org.apache.spark.sql.functions._
    val media = Multimodal.documentsAsMedia(Tables.documents(spark, sf))
    val viaGenerator = media
      .select(col("media_id"),
        graft.functions.GeneratorFunctions.split_frames(
          col("payload"), 1024, 2))
      .select(col("media_id"), col("frame_idx"),
        xxhash64(col("frame")).as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaFlatMap = Multimodal.sampleFrames(spark, media,
        frameBytes = 1024, everyNth = 2)
      .toDF()
      .select(col("media_id"), col("frame_idx"),
        xxhash64(col("payload")).as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaGenerator === viaFlatMap)
    assert(viaGenerator.nonEmpty)
  }
}
