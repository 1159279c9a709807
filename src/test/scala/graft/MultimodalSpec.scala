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
}
