package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit, pmod, size, sum}
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

@graft.tags.Slow
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("sessionCounts splits on >= gap, merges within gap") {
    val events = Seq(
      Event(ts(0), 1L, "click", 1.0),
      Event(ts(5), 1L, "click", 2.0),   // within 10m -> same session
      Event(ts(20), 1L, "view", 3.0),   // 15m after -> new session
      Event(ts(0), 2L, "click", 4.0)
    ).toDF()
    val out = EventStreams.sessionCounts(events).collect()
    assert(out.length === 3)
    val u1 = out.filter(_.getLong(2) == 1L).sortBy(_.getTimestamp(0).getTime)
    assert(u1(0).getLong(3) === 2) // first session: 2 events
    assert(u1(0).getDouble(4) === 3.0)
    assert(u1(1).getLong(3) === 1)
    // session end = last event + gap
    assert(u1(0).getTimestamp(1).getTime === ts(5).getTime + 10 * 60000L)
  }

  test("streaming tumbling agg over MemoryStream equals the batch dual") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val data = Seq(
      Event(ts(1), 1L, "click", 1.5),
      Event(ts(2), 1L, "click", 2.5),
      Event(ts(70), 2L, "view", 3.0))
    mem.addData(data: _*)
    val q = EventStreams.streamingTumbling(mem.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("tumbling_out")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = EventStreams.tumblingCounts(data.toDF())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed === batch) // ONE definition serves both engines
    assert(streamed.size === 2) // two distinct hours
  }

  test("streaming windowed heavy hitters over MemoryStream equal the batch dual") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // <= 8 distinct users per (window, type) group -> the Misra-Gries
    // summary is exact, so stream and batch must agree bit-for-bit
    // regardless of merge order; arrivals are out of event-time order
    val data = Seq(
      Event(ts(2), 7L, "click", 1.0), Event(ts(1), 1L, "click", 1.0),
      Event(ts(3), 1L, "click", 1.0), Event(ts(9), 2L, "click", 1.0),
      Event(ts(4), 1L, "view", 1.0), Event(ts(8), 3L, "view", 1.0),
      Event(ts(75), 2L, "click", 1.0), Event(ts(61), 2L, "click", 1.0),
      Event(ts(62), 5L, "click", 1.0))
    mem.addData(data: _*)
    val q = EventStreams.streamingWindowHeavyHitters(mem.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("hh_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try q.processAllAvailable() finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))
    val streamed = spark.table("hh_out").collect().map(key).toSet
    val batch = EventStreams.windowHeavyHitters(data.toDF())
      .collect().map(key).toSet
    assert(streamed === batch) // ONE definition serves both engines
    // exact counts: user 1 hit 2 clicks in hour 0, user 2 hit 2 in hour 1
    val h0 = streamed.filter(t => t._2 == "click" && t._3 == 1L)
    assert(h0.map(_._4) === Set(2L))
    assert(streamed.exists(t => t._3 == 2L && t._4 == 2L))
  }

  test("streaming windowed HLL distinct over MemoryStream equals the " +
       "batch dual and the exact count (sparse regime)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val data = Seq(
      Event(ts(1), 1L, "click", 1.0), Event(ts(2), 2L, "click", 1.0),
      Event(ts(3), 1L, "click", 1.0), Event(ts(50), 3L, "click", 1.0),
      Event(ts(10), 9L, "view", 1.0),
      Event(ts(70), 4L, "click", 1.0), Event(ts(80), 4L, "click", 1.0),
      Event(ts(95), 5L, "click", 1.0))
    mem.addData(data: _*)
    val q = EventStreams.streamingWindowApproxDistinct(mem.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try q.processAllAvailable() finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))
    val streamed = spark.table("hll_out").collect().map(key).toSet
    val batch = EventStreams.windowApproxDistinct(data.toDF())
      .collect().map(key).toSet
    assert(streamed === batch) // ONE definition serves both engines
    // sparse-regime HLL is exact: the first click hour has users
    // {1, 2} over 3 events, the second {3, 4, 5} over 4
    val clicks = streamed.filter(_._2 == "click")
      .map(t => (t._3, t._4))
    assert(clicks === Set((3L, 2L), (4L, 3L)), streamed)
  }

  test("streaming binned drift gate over MemoryStream equals the batch dual") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // fixed reference CDF over 5 bins of width 10 (values 0..49);
    // events span two day windows, arriving out of event-time order
    val refCdf = Seq(0.2, 0.5, 0.7, 0.9, 1.0)
    val data = Seq(
      Event(ts(60), 1L, "click", 5.0), Event(ts(1), 1L, "click", 15.0),
      Event(ts(30), 2L, "click", 45.0), Event(ts(90), 3L, "click", 25.0),
      Event(ts(24 * 60 + 10), 1L, "click", 35.0),
      Event(ts(24 * 60 + 5), 2L, "click", 8.0),
      Event(ts(24 * 60 + 90), 2L, "click", 49.0))
    mem.addData(data: _*)
    val q = EventStreams.streamingBinnedDrift(mem.toDF(), refCdf)
      .writeStream.outputMode("complete")
      .format("memory").queryName("drift_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try q.processAllAvailable() finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getDate(0).toString, r.getLong(1), r.getDouble(2))
    val streamed = spark.table("drift_out").collect().map(key).toSet
    val batch = EventStreams.binnedWindowDrift(data.toDF(), refCdf)
      .collect().map(key).toSet
    assert(streamed === batch) // ONE definition serves both engines
    assert(streamed.size === 2) // two day windows
    streamed.foreach { case (_, n, drift) =>
      assert(n > 0 && drift >= 0.0 && drift <= 1.0)
    }
  }

  test("stream-stream interval join over MemoryStreams equals the batch dual") {
    implicit val sqlCtx = spark.sqlContext
    val clickData = Seq(
      (ts(0), 100L, 1L, "click", 0.0),
      (ts(30), 101L, 1L, "click", 0.0),
      (ts(0), 102L, 2L, "click", 0.0))
    val buyData = Seq(
      (ts(10), 200L, 1L, "purchase", 9.5),  // in [0,60) of click 100 only
      (ts(45), 201L, 1L, "purchase", 4.5),  // within 1h of clicks 100 and 101
      (ts(90), 202L, 2L, "purchase", 7.0))  // 90m after click 102 -> no match
    def df(rows: Seq[(Timestamp, Long, Long, String, Double)]) =
      rows.toDF("ts", "event_id", "user_id", "event_type", "value")

    val clicks = MemoryStream[(Timestamp, Long, Long, String, Double)]
    val buys = MemoryStream[(Timestamp, Long, Long, String, Double)]
    clicks.addData(clickData: _*)
    buys.addData(buyData: _*)
    def df2(m: MemoryStream[(Timestamp, Long, Long, String, Double)]) =
      m.toDS().toDF("ts", "event_id", "user_id", "event_type", "value")
    val q = EventStreams.streamingAttribution(df2(clicks), df2(buys))
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("attr_out")
      .collect().map(r => (r.getLong(0), r.getTimestamp(3), r.getDouble(4))).toSet
    val batch = EventStreams.clickPurchaseJoin(df(clickData), df(buyData))
      .collect().map(r => (r.getLong(0), r.getTimestamp(3), r.getDouble(4))).toSet
    assert(streamed === batch)
    assert(batch === Set(
      (100L, ts(10), 9.5), (100L, ts(45), 4.5), (101L, ts(45), 4.5)))
  }

  test("stream-stream LEFT OUTER interval join emits null-conversions after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long, String, Double)]
    val buys = MemoryStream[(Timestamp, Long, Long, String, Double)]
    def dfOf(m: MemoryStream[(Timestamp, Long, Long, String, Double)]) =
      m.toDS().toDF("ts", "event_id", "user_id", "event_type", "value")
    val q = EventStreams.streamingAttribution(
        dfOf(clicks), dfOf(buys), joinType = "left_outer")
      .writeStream.outputMode("append")
      .format("memory").queryName("outer_attr_out")
      .start()
    try {
      clicks.addData((ts(0), 100L, 1L, "click", 0.0),   // converts
        (ts(0), 101L, 3L, "click", 0.0))                // never converts
      buys.addData((ts(10), 200L, 1L, "purchase", 9.5))
      q.processAllAvailable()
      // advance the watermark far past click_ts + 1h on BOTH inputs so
      // the unmatched click's "no conversion" can be finalized
      clicks.addData((ts(400), 900L, 8L, "click", 0.0))
      buys.addData((ts(401), 901L, 9L, "purchase", 1.0))
      q.processAllAvailable()
      clicks.addData((ts(800), 902L, 8L, "click", 0.0))
      buys.addData((ts(801), 903L, 9L, "purchase", 1.0))
      q.processAllAvailable()

      val rows = spark.table("outer_attr_out")
        .filter(col("click_id").isin(100L, 101L))
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(4)) null else r.getDouble(4)))
        .toSet
      assert(rows === Set((100L, 9.5), (101L, null)))
    } finally q.stop()
  }

  test("streaming dedup by id drops in-watermark replays") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Long, String, Double)]
    def dfOf(m: MemoryStream[(Timestamp, Long, Long, String, Double)]) =
      m.toDS().toDF("ts", "event_id", "user_id", "event_type", "value")
    val q = EventStreams.streamingDedupedEvents(dfOf(mem))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    try {
      mem.addData((ts(0), 1L, 7L, "click", 1.0))
      q.processAllAvailable()
      // replay of id 1 in a later batch, still inside the watermark
      mem.addData((ts(1), 1L, 7L, "click", 1.0), (ts(2), 2L, 7L, "view", 2.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming minhash near-dup pairs over MemoryStream equal the " +
      "batch dual on real documents (multi-batch arrival)") {
    implicit val sqlCtx = spark.sqlContext
    // real corpus (has planted near-dups at threshold 0.5), synthetic
    // in-watermark arrival times, split across three micro-batches
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val arrivals = docs.zipWithIndex.map { case ((id, text), i) =>
      (ts(i % 7), id, text)
    }
    val mem = MemoryStream[(Timestamp, Long, String)]
    val q = graft.streaming.StreamingDedup.streamingMinhashPairs(
      spark, mem.toDS().toDF("ts", "doc_id", "text"), "doc_id", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_out")
      .start()
    try {
      val third = arrivals.length / 3
      mem.addData(arrivals.take(third).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(arrivals.slice(third, 2 * third).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(arrivals.drop(2 * third).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    // per-band multiplicity collapses under distinct (identical est)
    val streamed = spark.table("neardup_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.dedup.Dedup.minhashPairs(
      Tables.documents(spark, sf), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty, "fixture should contain near-dups")
  }

  test("pair sink: exactly-once deduped pair table from a RESTARTED " +
      "file-source stream (checkpoint recovery + replay idempotence)") {
    // the collapsing sink streamingMinhashPairs prescribes: per-band
    // duplicate emissions upsert into ONE warehouse pair table keyed
    // (id_a, id_b); a stream stopped and restarted from its checkpoint
    // must neither lose cross-restart pairs (bucket state recovery)
    // nor double-publish (batch-id gate)
    import graft.catalog.Warehouse
    import graft.state.MemoryStateStore
    import graft.streaming.{PairSink, StreamingDedup}
    val docsDir = java.nio.file.Files.createTempDirectory("graft-pairdocs")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pairckpt")
    val wh = new Warehouse(java.nio.file.Files.createTempDirectory("graft-pairwh"))
    val store = new MemoryStateStore

    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val arrivals = docs.zipWithIndex.map { case ((id, text), i) =>
      (ts(i % 7), id, text)
    }
    val half = arrivals.length / 2
    val schema = arrivals.take(1).toSeq.toDF("ts", "doc_id", "text").schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(docsDir.toString)
      val q = PairSink.start(
        StreamingDedup.streamingMinhashPairs(spark, stream, "doc_id", "text"),
        wh, store, "near_dup_pairs", Some(ckpt.toString))
      try q.processAllAvailable() finally q.stop()
    }
    // first life of the stream: half the corpus
    arrivals.take(half).toSeq.toDF("ts", "doc_id", "text")
      .write.mode("append").parquet(docsDir.toString)
    run()
    // restart from the checkpoint, rest of the corpus arrives
    arrivals.drop(half).toSeq.toDF("ts", "doc_id", "text")
      .write.mode("append").parquet(docsDir.toString)
    run()

    val streamed = wh.table(spark, "near_dup_pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // keyed (id_a, id_b): exactly one row per pair survives collapsing
    assert(streamed.map(p => (p._1, p._2)).distinct.length === streamed.length)
    val batch = graft.dedup.Dedup.minhashPairs(
      Tables.documents(spark, sf), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed.toSet === batch)
    assert(batch.nonEmpty, "fixture should contain near-dups")

    // crash-replay of an already-committed micro-batch: no new
    // generation, table untouched
    val genBefore = wh.manifest("near_dup_pairs")
    PairSink.commitBatch(wh, store, "near_dup_pairs")(
      wh.table(spark, "near_dup_pairs"), batchId = 0L)
    assert(wh.manifest("near_dup_pairs") === genBefore)
    // a NEW batch replaying already-present pairs publishes a new
    // generation with the SAME rows (merge semantics idempotent)
    PairSink.commitBatch(wh, store, "near_dup_pairs")(
      wh.table(spark, "near_dup_pairs"), batchId = 9999L)
    assert(wh.manifest("near_dup_pairs") !== genBefore)
    assert(wh.table(spark, "near_dup_pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet === batch)
  }

  test("streaming blocklist gate over MemoryStream equals the batch " +
      "complement of blk1 (stateless, multi-batch arrival, composes " +
      "in front of the stateful dedup)") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val arrivals = docs.zipWithIndex.map { case ((id, text), i) =>
      (ts(i % 5), id, text)
    }
    val mem = MemoryStream[(Timestamp, Long, String)]
    val gated = graft.streaming.StreamingDedup.streamingBlocklistGate(
      mem.toDS().toDF("ts", "doc_id", "text"), "text",
      graft.queries.Curate.BlocklistPhrases)
    val q = gated.select("doc_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("blk_out")
      .start()
    try {
      val half = arrivals.length / 2
      mem.addData(arrivals.take(half).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(arrivals.drop(half).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("blk_out")
      .collect().map(_.getLong(0)).toSet
    val blockedBatch = graft.queries.Curate
      .blk1BlocklistHits(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val all = docs.map(_._1).toSet
    assert(streamed === (all -- blockedBatch))
    assert(blockedBatch.nonEmpty && streamed.nonEmpty)
  }

  test("streaming contamination gate over MemoryStream equals the batch " +
      "dual; scores emit once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val real = Tables.documents(spark, sf)
    val evalDocs = real.filter(pmod(col("doc_id"), lit(97)) === 0)
    val corpus = real.filter(pmod(col("doc_id"), lit(97)) =!= 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val mem = MemoryStream[(Timestamp, Long, String)]
    val q = graft.streaming.StreamingDedup.streamingContaminationScores(
      mem.toDS().toDF("ts", "doc_id", "text"), evalDocs,
      "doc_id", "text", k = 3, delayMs = 60000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("contam_out")
      .start()
    try {
      val (a, b) = corpus.splitAt(corpus.length / 2)
      mem.addData(a.map { case (id, t) => (ts(0), id, t) }.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(b.map { case (id, t) => (ts(1), id, t) }.toIndexedSeq: _*)
      q.processAllAvailable()
      // nothing final yet: the watermark has not passed arrival + delay
      assert(spark.table("contam_out").isEmpty)
      // a far-future arrival advances the watermark and flushes all
      mem.addData((ts(1000), -1L, "flush"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("contam_out")
      .filter(col("doc_id") >= 0) // the flush doc itself is still pending
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = graft.dedup.Dedup.contaminationScores(
      real.filter(pmod(col("doc_id"), lit(97)) =!= 0),
      real.filter(pmod(col("doc_id"), lit(97)) === 0),
      "doc_id", "text", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed === batch)
    assert(batch.exists(_._3 > 0), "fixture should contain contamination")
  }

  test("streaming MULTI-set contamination gate (dd18 dual) over " +
      "MemoryStream equals the batch operator window-for-window; " +
      "emits once") {
    implicit val sqlCtx = spark.sqlContext
    val real = Tables.documents(spark, sf)
    val evalSets = Seq(89, 97, 101).map { m =>
      real.filter(pmod(col("doc_id"), lit(m)) === 0)
        .select(lit(s"mod$m").as("eval_set"), col("text"))
    }.reduce(_.unionAll(_))
    val corpusDf = real.filter(pmod(col("doc_id"), lit(89)) =!= 0 &&
      pmod(col("doc_id"), lit(97)) =!= 0 &&
      pmod(col("doc_id"), lit(101)) =!= 0)
    val corpus = corpusDf.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val mem = MemoryStream[(Timestamp, Long, String)]
    val q = graft.streaming.StreamingDedup
      .streamingMultiSetContaminationScores(
        mem.toDS().toDF("ts", "doc_id", "text"), evalSets,
        "doc_id", "eval_set", "text", k = 3, delayMs = 60000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("mcontam_out")
      .start()
    try {
      val (a, b) = corpus.splitAt(corpus.length / 2)
      mem.addData(a.map { case (id, t) => (ts(0), id, t) }.toIndexedSeq: _*)
      q.processAllAvailable()
      // at-least-once redelivery: every 4th doc of the first half
      // arrives AGAIN, at a different timestamp — the id-keyed
      // watermark dedup must drop these or each would emit its own
      // partial (window, doc) row and break batch equality
      mem.addData(a.filter(_._1 % 4 == 0)
        .map { case (id, t) => (ts(1), id, t) }.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(b.map { case (id, t) => (ts(1), id, t) }.toIndexedSeq: _*)
      q.processAllAvailable()
      // emit-once: nothing final before the watermark passes
      assert(spark.table("mcontam_out").isEmpty)
      mem.addData((ts(1000), -1L, "flush"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("mcontam_out")
      .filter(col("doc_id") >= 0)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSet
    val batch = graft.queries.Extensions.dd18MultisetContaminationOn(real)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSet
    assert(streamed === batch)
    // the fixture must exercise >1 eval set and >0 hits, or the
    // equality proves nothing
    assert(batch.map(_._2).size > 1 || batch.map(_._2).nonEmpty)
    assert(batch.exists(_._4 > 0), "fixture should contain contamination")
    assert(batch.map(_._2).toSeq.distinct.size >= 2,
      "fixture should hit at least two eval sets")
  }

  test("streaming corpus-clean gate (quality -> exact dedup -> stats) " +
      "equals the batch pipeline's quality+exact phases") {
    implicit val sqlCtx = spark.sqlContext
    import graft.text.TextFunctions
    val real = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // plant exact duplicates: every 5th doc arrives again under a
    // HIGHER id (so first-arrival == min-id, the batch keep rule)
    val dupes = real.filter(_._1 % 5 == 0)
      .map { case (id, t) => (id + 1000000L, t) }
    val feed = (real ++ dupes).sortBy(_._1)
    val mem = MemoryStream[(Timestamp, Long, String)]
    val q = graft.streaming.StreamingDedup.streamingCorpusClean(
      mem.toDS().toDF("ts", "doc_id", "text"), "doc_id", "text",
      delayMs = 60000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("corpus_clean_out")
      .start()
    try {
      mem.addData(feed.map { case (id, t) => (ts(0), id, t) }.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("corpus_clean_out")
      .select(col("doc_id"), col("n_tokens"), col("predicted_lang"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSet
    // batch dual: quality gate + exact keep-min-id + same stats
    import spark.implicits._
    val batchDocs = (real ++ dupes).toSeq.toDF("doc_id", "text")
      .filter(TextFunctions.qualityScore(col("text")) > 0.3)
    val batch = batchDocs
      .join(graft.dedup.Dedup.exactKeepIds(batchDocs, "doc_id", "text"),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.langId(col("text")).as("predicted_lang"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSet
    assert(streamed === batch)
    // the planted duplicates were actually dropped
    assert(!streamed.exists(_._1 >= 1000000L))
    assert(streamed.nonEmpty)
  }

  test("streaming contamination AUTO-dispatch: the over-cap branch " +
      "(bloom prefilter, no forced broadcast) equals the batch dual") {
    implicit val sqlCtx = spark.sqlContext
    val real = Tables.documents(spark, sf)
    val evalDocs = real.filter(pmod(col("doc_id"), lit(97)) === 0)
    val corpus = real.filter(pmod(col("doc_id"), lit(97)) =!= 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val mem = MemoryStream[(Timestamp, Long, String)]
    // maxBroadcastGrams = 1 forces the bloom branch on any real eval
    // set — the same flip DedupSpec proves for the batch dd11 dispatch
    val q = graft.streaming.StreamingDedup.streamingContaminationScoresAuto(
      mem.toDS().toDF("ts", "doc_id", "text"), evalDocs,
      "doc_id", "text", k = 3, delayMs = 60000L, maxBroadcastGrams = 1L)
      .writeStream.outputMode("append")
      .format("memory").queryName("contam_auto_out")
      .start()
    try {
      mem.addData(corpus.map { case (id, t) => (ts(0), id, t) }.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData((ts(1000), -1L, "flush"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("contam_auto_out")
      .filter(col("doc_id") >= 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = graft.dedup.Dedup.contaminationScores(
      real.filter(pmod(col("doc_id"), lit(97)) =!= 0), evalDocs,
      "doc_id", "text", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed === batch)
    // under-cap dispatch stays on the broadcast gate and agrees too
    val est = evalDocs
      .agg(sum(size(graft.dedup.Dedup.wordShingles(col("text"), 3))))
      .head().getLong(0)
    assert(est > 1L, "fixture eval set must exceed the forced cap")
  }

  test("streaming minhash dedup: bucket state is EVICTED once the " +
      "watermark passes (twin arriving later is not paired)") {
    implicit val sqlCtx = spark.sqlContext
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val mem = MemoryStream[(Timestamp, Long, String)]
    // tiny retention: 1 minute
    val q = graft.streaming.StreamingDedup.streamingMinhashPairs(
      spark, mem.toDS().toDF("ts", "doc_id", "text"), "doc_id", "text",
      delayMs = 60000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_evict")
      .start()
    try {
      mem.addData((ts(0), 1L, text))
      q.processAllAvailable()
      // advance the watermark far past ts(0)+1m so doc 1's buckets
      // time out and are removed...
      mem.addData((ts(500), 99L, "completely unrelated filler words here"))
      q.processAllAvailable()
      mem.addData((ts(501), 99L, "completely unrelated filler words here"))
      q.processAllAvailable()
      // ...then an exact twin of doc 1 arrives: no state, no pair
      mem.addData((ts(502), 2L, text))
      q.processAllAvailable()
      val pairs = spark.table("neardup_evict").collect()
      assert(!pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
        pairs.mkString(", "))
      // in-retention control: a third twin right after doc 2 IS paired
      mem.addData((ts(502), 3L, text))
      q.processAllAvailable()
      val now = spark.table("neardup_evict").collect()
      assert(now.exists(r => r.getLong(0) == 2L && r.getLong(1) == 3L &&
        r.getDouble(2) == 1.0), now.mkString(", "))
    } finally q.stop()
  }

  test("streaming minhash pairs == batch pairs on random corpora " +
      "(property: random texts, random batch splits)") {
    implicit val sqlCtx = spark.sqlContext
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // small vocabulary forces near-dups; includes degenerate texts
    val vocab = Vector("alpha", "beta", "gamma", "delta", "alpha beta",
      "", " ")
    val corpusGen: Gen[List[String]] = Gen.listOfN(14, for {
      n <- Gen.choose(0, 6)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
    (1 to 6).foreach { i =>
      val texts = corpusGen(Gen.Parameters.default, Seed(i.toLong)).get
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
      val splitAt = 1 + (i * 5) % (docs.length - 1)
      val mem = MemoryStream[(Timestamp, Long, String)]
      val q = graft.streaming.StreamingDedup.streamingMinhashPairs(
        spark, mem.toDS().toDF("ts", "doc_id", "text"), "doc_id", "text")
        .writeStream.outputMode("append")
        .format("memory").queryName(s"neardup_prop_$i")
        .start()
      try {
        val (a, b) = docs.splitAt(splitAt)
        mem.addData(a.map { case (id, t) => (ts(0), id, t) }: _*)
        q.processAllAvailable()
        mem.addData(b.map { case (id, t) => (ts(1), id, t) }: _*)
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table(s"neardup_prop_$i")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val batch = graft.dedup.Dedup.minhashPairs(
        docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(streamed === batch, s"seed $i split $splitAt: " +
        s"stream-only ${streamed -- batch}, batch-only ${batch -- streamed}")
    }
  }

  test("warehouse sink publishes micro-batch snapshots atomically, exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import java.nio.file.Files
    import graft.catalog.Warehouse
    import graft.state.MemoryStateStore
    import graft.streaming.WarehouseSink

    val wh = new Warehouse(Files.createTempDirectory("graft-sink"))
    val store = new MemoryStateStore
    val mem = MemoryStream[Event]
    val agg = EventStreams.tumblingCounts(mem.toDF())
    val q = WarehouseSink.start(agg, wh, store, "hourly", "wh_sink_test")
    try {
      mem.addData(Event(ts(1), 1L, "click", 1.0), Event(ts(2), 1L, "click", 2.0))
      q.processAllAvailable()
      val afterFirst = wh.table(spark, "hourly").collect()
      assert(afterFirst.map(_.getLong(2)).sum === 2)

      mem.addData(Event(ts(70), 2L, "view", 3.0))
      q.processAllAvailable()
      val snap = wh.table(spark, "hourly")
        .collect().map(r => (r.getString(1), r.getLong(2))).toSet
      assert(snap === Set(("click", 2L), ("view", 1L)))
    } finally q.stop()

    // replayed batch id (crash-restart) must NOT publish a new generation
    val genBefore = wh.manifest("hourly")
    WarehouseSink.commitBatch(wh, store, "hourly")(
      wh.table(spark, "hourly"), batchId = 0L)
    assert(wh.manifest("hourly") === genBefore)
    // a NEW batch id does publish
    WarehouseSink.commitBatch(wh, store, "hourly")(
      wh.table(spark, "hourly").limit(1), batchId = 99L)
    assert(wh.manifest("hourly") !== genBefore)
    assert(wh.table(spark, "hourly").count() === 1)
  }

  test("file-source streaming: readStream over a parquet dir matches batch") {
    // production wiring: a directory the loader appends to, consumed
    // as a stream with watermarking (SURVEY §2.10 upgrade path)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    val data = Seq(
      Event(ts(1), 1L, "click", 1.0),
      Event(ts(2), 2L, "view", 2.0),
      Event(ts(65), 1L, "click", 4.0))
    data.toDF().write.mode("overwrite").parquet(dir.toString)

    val stream = spark.readStream
      .schema(data.toDF().schema)
      .parquet(dir.toString)
    val q = EventStreams.streamingTumbling(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("file_tumbling")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("file_tumbling").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventStreams.tumblingCounts(data.toDF()).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("streamingSessions: custom state closes sessions on event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = EventStreams.streamingSessions(spark,
      mem.toDS().withWatermark("ts", "0 seconds").as[Event])
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      // batch 1: two events in one session for u1
      mem.addData(Event(ts(0), 1L, "click", 1.0), Event(ts(5), 1L, "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() === 0) // still open
      // batch 2: far-future event advances the watermark past u1's gap
      mem.addData(Event(ts(60), 2L, "view", 9.0))
      q.processAllAvailable()
      // one more batch so the timeout fires after watermark update
      mem.addData(Event(ts(120), 2L, "view", 1.0))
      q.processAllAvailable()
      val closed = spark.table("sessions_out")
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
      assert(closed.contains((1L, 2L, 3.0)),
        s"expected u1's closed 2-event session, got ${closed.toSeq}")
    } finally q.stop()
  }

  test("streamingSessions: late in-watermark event extends session start backward") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = EventStreams.streamingSessions(spark,
      mem.toDS().withWatermark("ts", "2 hours").as[Event])
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("late_sessions_out").start()
    try {
      mem.addData(Event(ts(10), 1L, "click", 1.0))
      q.processAllAvailable()
      // late event (within the 2h watermark) BEFORE the session's start
      mem.addData(Event(ts(5), 1L, "click", 2.0))
      q.processAllAvailable()
      // advance watermark far enough to close u1's session, then tick
      mem.addData(Event(ts(300), 2L, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Event(ts(600), 2L, "view", 0.0))
      q.processAllAvailable()
      val closed = spark.table("late_sessions_out")
        .collect().filter(_.getLong(0) == 1L)
        .map(r => (r.getTimestamp(1), r.getLong(3)))
      assert(closed.toSeq === Seq((ts(5), 2L)),
        s"session_start must move back to the late event, got ${closed.toSeq}")
    } finally q.stop()
  }

  test("runningPerUser keeps custom state per key (batch surface)") {
    val out = EventStreams.runningPerUser(spark, Seq(
      Event(ts(0), 1L, "click", 1.0),
      Event(ts(1), 1L, "click", 2.0),
      Event(ts(0), 2L, "view", 5.0)).toDS())
      .collect().map(u => u.user_id -> ((u.n, u.total))).toMap
    assert(out(1L) === ((2L, 3.0)))
    assert(out(2L) === ((1L, 5.0)))
  }

  test("streaming trigram miner == driver sliding replay across batch splits; O(1) carry") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.{SeqEvent, Trigram}
    // two users, interleaved types, split mid-stream (per-key in-order
    // arrival across batches — the documented contract)
    val all = Seq(
      SeqEvent(ts(0), 1L, 1L, "click"), SeqEvent(ts(1), 2L, 1L, "view"),
      SeqEvent(ts(2), 3L, 2L, "click"), SeqEvent(ts(3), 4L, 1L, "click"),
      SeqEvent(ts(4), 5L, 1L, "purchase"), SeqEvent(ts(5), 6L, 2L, "view"),
      SeqEvent(ts(6), 7L, 2L, "error"), SeqEvent(ts(7), 8L, 1L, "view"),
      SeqEvent(ts(8), 9L, 2L, "click"))
    val mem = MemoryStream[SeqEvent]
    mem.addData(all.take(4): _*) // batch 1
    mem.addData(all.drop(4): _*) // batch 2 — trigrams must span the cut
    val q = graft.streaming.EventStreams
      .streamingEventTrigrams(spark, mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("trigram_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("trigram_out").as[Trigram].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    val expected = all.groupBy(_.user_id).toSeq.flatMap { case (uid, evs) =>
      evs.sortBy(e => (e.ts.getTime, e.event_id)).map(_.event_type)
        .sliding(3).filter(_.length == 3)
        .map(w => Trigram(uid, w(0), w(1), w(2)))
    }.groupBy(identity).view.mapValues(_.length).toMap
    assert(streamed === expected)
    // trigrams that span the batch cut exist (the carry is exercised)
    assert(streamed.keys.exists(t => t.user_id == 1L && t.e3 == "purchase"))
  }

  test("streamingFirstSeen emits each user exactly once with its first ts — " +
      "the day rollup equals the batch growth curve on the real corpus") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.FirstSeen
    val all = Tables.events(spark, sf)
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().sortBy(_.ts.getTime)
    val mem = MemoryStream[Event]
    val q = EventStreams.streamingFirstSeen(spark, mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("firstseen_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // chronological chunks — the per-key ordered-arrival contract
      all.grouped(math.max(1, all.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("firstseen_out").as[FirstSeen].collect()
    // exactly once per user
    assert(streamed.map(_.user_id).distinct.length == streamed.length)
    val batchFirst = all.groupBy(_.user_id)
      .map { case (u, es) => u -> es.map(_.ts.getTime).min }
    assert(streamed.map(f => f.user_id -> f.first_ts.getTime).toMap
      == batchFirst)
    // day rollup over the emitted stream == cum1's new_users column
    val streamedByDay = streamed
      .groupBy(f => f.first_ts.toLocalDateTime.toLocalDate.toString)
      .view.mapValues(_.length.toLong).toMap
    val cum1 = graft.queries.Series.cum1CumulativeUniques(spark, sf)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(streamedByDay == cum1)
  }

  test("streaming conformal gate over MemoryStream: flags equal the " +
      "batch residual test; trip rate is exactly 1 - conf1 coverage") {
    implicit val sqlCtx = spark.sqlContext
    // calibration table straight from the batch operator's output
    val conf = graft.queries.Robust.conf1SplitConformal(spark, sf)
    val calib = conf.select(col("segment"), col("yhat6").as("yhat"),
      col("qhat6").as("qhat"))
    // stream the TEST half (odd order keys) of the same orders
    val testRows = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_mktsegment").as("segment")),
        col("o_custkey") === col("c_custkey"))
      .filter(pmod(col("o_orderkey"), lit(2L)) === 1)
      .select(col("segment"), col("o_totalprice").as("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val mem = MemoryStream[(String, Double)]
    mem.addData(testRows.toIndexedSeq: _*)
    val q = graft.streaming.ConformalGate.streamingConformalGate(
      mem.toDF().toDF("segment", "value"), calib)
      .writeStream.outputMode("append")
      .format("memory").queryName("conformal_gate_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("conformal_gate_out")
    val rate = out.groupBy(col("segment"))
      .agg(org.apache.spark.sql.functions.avg(
        col("surprising").cast("double")).as("trip"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val cov = conf.collect()
      .map(r => r.getString(0) -> r.getAs[Double]("cov6")).toMap
    assert(rate.keySet == cov.keySet)
    for ((seg, c) <- cov)
      assert(math.abs(rate(seg) - (1.0 - c)) < 1e-6,
        s"$seg: trip ${rate(seg)} vs 1-cov ${1.0 - c}")
    // stateless: the gate query plan must carry no state store
    assert(out.count() == testRows.length)
  }

  test("conformal gate surfaces rows whose segment has no calibration " +
      "entry (left join, surprising = true) instead of dropping them") {
    implicit val sqlCtx = spark.sqlContext
    val calib = Seq(("KNOWN", 100.0, 5.0)).toDF("segment", "yhat", "qhat")
    val mem = MemoryStream[(String, Double)]
    mem.addData(("KNOWN", 102.0), ("KNOWN", 120.0), ("NEVER_SEEN", 1.0))
    val q = graft.streaming.ConformalGate.streamingConformalGate(
      mem.toDF().toDF("segment", "value"), calib)
      .writeStream.outputMode("append")
      .format("memory").queryName("conformal_gate_unknown")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("conformal_gate_unknown")
      .select("segment", "surprising")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toSeq
    // all three rows survive; the uncalibrated segment is flagged
    assert(out.size == 3)
    assert(out.contains("NEVER_SEEN" -> true))
    assert(out.contains("KNOWN" -> false)) // |102-100| <= 5
    assert(out.contains("KNOWN" -> true))  // |120-100| > 5
  }

  test("streaming experiment monitor over MemoryStream equals the " +
      "batch dual window-for-window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val data = (1 to 120).map { i =>
      val ty = if (i % 3 == 0) "purchase" else "click"
      Event(ts(i * 30), (i % 17).toLong, ty, 1.0)
    }
    mem.addData(data: _*)
    val q = graft.streaming.ExpMonitor.streamingWindowedArmZ(
      mem.toDF(), window_ = "1 hour", delay = "10 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("exp_monitor_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try q.processAllAvailable() finally q.stop()
    def canon(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4),
        if (r.isNullAt(5)) -999.0 else r.getDouble(5))
    }.toSet
    val streamed = canon(spark.table("exp_monitor_out").collect())
    val batch = canon(graft.streaming.ExpMonitor.windowedArmZ(
      data.toDF(), window_ = "1 hour").collect())
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming mixture monitor over MemoryStream equals the batch " +
      "dual; a window drifting off its target trips the flag") {
    import graft.streaming.MixMonitor
    import graft.streaming.MixMonitor.TimedDoc
    implicit val sqlCtx = spark.sqlContext
    val target = Seq("en" -> 0.5, "fr" -> 0.5)
    // window 1 on-target (5/5 tokens), window 2 all-English (drifted)
    val data =
      (1 to 5).map(i => TimedDoc(ts(i), "en", "one two")) ++
        (1 to 5).map(i => TimedDoc(ts(10 + i), "fr", "un deux")) ++
        (1 to 8).map(i => TimedDoc(ts(70 + i), "en", "one two"))
    val mem = MemoryStream[TimedDoc]
    mem.addData(data: _*)
    val q = MixMonitor.streamingMixDrift(mem.toDF(), target,
        window_ = "1 hour", delay = "10 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("mix_monitor_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try q.processAllAvailable() finally q.stop()
    def canon(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(6), r.getBoolean(7))
    }.toSet
    val streamed = canon(spark.table("mix_monitor_out").collect())
    val batch = canon(MixMonitor.windowedMixDrift(
      data.toDF(), target, window_ = "1 hour").collect())
    assert(streamed == batch)
    assert(streamed.size == 4) // 2 windows x 2 target languages
    // window 1: both langs at share 0.5 -> on target
    val w1 = streamed.filter(_._1 == new Timestamp(
      ts(0).getTime / 3600000L * 3600000L))
    assert(w1.forall(!_._7))
    // window 2: en share 1.0, fr share 0.0 -> both off target
    val w2 = streamed -- w1
    assert(w2.forall(_._7), s"drifted window must trip: $w2")
    assert(w2.exists(r => r._2 == "fr" && r._3 == 0L))
  }

  test("streaming chunk-level keep-first dedup equals the batch " +
      "chunkKeepFirst kernel under ordered single-partition ingest") {
    implicit val sqlCtx = spark.sqlContext
    val real = Tables.documents(spark, sf)
    val feed = real.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val mem = MemoryStream[(Timestamp, Long, String)]
    val q = graft.streaming.StreamingDedup.streamingChunkDedup(
      mem.toDS().toDF("ts", "doc_id", "text"), "doc_id", "text",
      cs = 10, delayMs = 60000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("chunk_dedup_out")
      .start()
    try {
      mem.addData(feed.map { case (id, t) => (ts(0), id, t) }.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("chunk_dedup_out").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val batch = graft.queries.Clean.chunkKeepFirst(
      graft.queries.Clean.chunkDocs(real)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(streamed == batch)
    // the corpus actually contains cross-doc repeated chunks, so the
    // dedup is non-vacuous: fewer survivors than instances
    val instances = graft.queries.Clean.chunkDocs(real).count()
    assert(streamed.size < instances)
  }

  test("streaming winnowing co-selection equals batch win2's " +
      "pre-aggregation rows when no bucket crosses the cap") {
    implicit val sqlCtx = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base), (2L, base + " nu"),
      (3L, "one two three four five six seven eight nine ten more"),
      (4L, "one two three four five six seven eight nine ten more or less"),
      (5L, "zq xv wu ts rp on ml kj ih gf ed cb az yx"))
    val mem = MemoryStream[(Timestamp, Long, String)]
    val q = graft.streaming.StreamingDedup.streamingWinnowShared(
      spark, mem.toDS().toDF("ts", "doc_id", "text"), "doc_id", "text",
      dfCap = 50, delayMs = 60000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("winnow_shared_out")
      .start()
    try {
      mem.addData(docs.map { case (id, t) => (ts(0), id, t) }
        .toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamedM = spark.table("winnow_shared_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).map { case (p, xs) => (p, xs.length.toLong) }
    // batch dual at the same cap with minShared=1: (id_a, id_b, m)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winshare").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batch = graft.queries.Clean.win2WinnowPairs(spark, dir,
        dfCap = 50, minShared = 1).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(streamedM == batch, s"stream $streamedM vs batch $batch")
    assert(batch.contains((1L, 2L)) && batch.contains((3L, 4L)))
  }

  test("streaming tiered near-dup (dd20 dual): micro-batch exact " +
      "verify over winnow candidates equals batch pair-for-pair and " +
      "emits each pair once across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val real = Tables.documents(spark, sf)
    val feed = real.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val out = java.nio.file.Files
      .createTempDirectory("tiered-stream").toString
    val mem = MemoryStream[(Timestamp, Long, String)]
    // dfCap 50: no bucket on this corpus crosses it, so the
    // prefix-cap divergence never engages and batch equality is exact
    val q = graft.streaming.StreamingDedup.streamingTieredNearDup(
        spark, mem.toDS().toDF("ts", "doc_id", "text"), real,
        "doc_id", "text", out, threshold = 0.8, dfCap = 50,
        delayMs = 60000L)
      .start()
    try {
      // two triggers: candidate pairs WITHIN batch 1 re-surface via
      // new shared fingerprints in batch 2 — the anti-join against
      // the published store must silence the re-emission
      val (a, b) = feed.splitAt(feed.length / 2)
      mem.addData(a.map { case (id, t) => (ts(0), id, t) }
        .toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(b.map { case (id, t) => (ts(1), id, t) }
        .toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamedRows = spark.read.parquet(s"$out/pairs")
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val streamed = streamedRows.toSet
    // emit-once: no pair appears twice in the published store
    assert(streamedRows.length === streamed.size,
      "a pair was re-emitted across triggers")
    val batch = graft.queries.Clean
      .tieredNearDupPairsOn(real, threshold = 0.8, dfCap = 50)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty, "fixture must contain tiered near-dup pairs")
  }

  test("streaming near-dup AUTO dispatch: the corpus-store statistic " +
      "picks the tier, onDispatch surfaces it, and BOTH branches equal " +
      "their batch duals pair-for-pair") {
    implicit val sqlCtx = spark.sqlContext
    val real = Tables.documents(spark, sf)
    val feed = real.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    var dispatches = List.empty[graft.queries.Clean.NearDupDispatch]
    def run(forcedEst: Option[Long]): Set[(Long, Long, Double)] = {
      val out = java.nio.file.Files
        .createTempDirectory("auto-stream").toString
      val mem = MemoryStream[(Timestamp, Long, String)]
      val q = graft.streaming.StreamingDedup.streamingNearDupAuto(
          spark, mem.toDS().toDF("ts", "doc_id", "text"), real,
          "doc_id", "text", out, threshold = 0.8, dfCap = 50,
          knownCandidateEstimate = forcedEst, delayMs = 60000L,
          onDispatch = d => dispatches ::= d)
        .start()
      try {
        val (a, b) = feed.splitAt(feed.length / 2)
        mem.addData(a.map { case (id, t) => (ts(0), id, t) }
          .toIndexedSeq: _*)
        q.processAllAvailable()
        mem.addData(b.map { case (id, t) => (ts(1), id, t) }
          .toIndexedSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.read.parquet(s"$out/pairs")
        .select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.length === rows.toSet.size, "pair re-emitted")
      rows.toSet
    }
    // under the threshold -> the EXACT face, equal to the batch
    // exact-recall operator with no cap caveat
    val exact = run(forcedEst = Some(1L))
    val exactBatch = graft.dedup.Dedup
      .exactJaccardPairs(real, "doc_id", "text", threshold = 0.8)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact === exactBatch)
    assert(exactBatch.nonEmpty, "fixture must contain exact pairs")
    // over the threshold -> the TIERED face, equal to batch dd20
    val tiered = run(forcedEst = Some(Long.MaxValue))
    val tieredBatch = graft.queries.Clean
      .tieredNearDupPairsOn(real, threshold = 0.8, dfCap = 50)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(tiered === tieredBatch)
    // the dispatch decision is surfaced on both branches
    assert(dispatches.reverse.map(_.tier) === List("exact", "tiered"))
    // tier-flip checkpoint guard: resuming an outDir started under
    // one tier with the OTHER tier must fail fast (the bucket state
    // is keyed by the old tier's hash family — a silent resume would
    // lose every pre-flip x post-flip pair)
    val out = java.nio.file.Files
      .createTempDirectory("auto-stream-flip").toString
    // validate-only pre-start checks never PIN the tier: a constructed-
    // but-never-started writer must not block a later legitimate first
    // start under the other tier
    graft.streaming.StreamingDedup.requireTierUnchanged(spark, out, "exact")
    graft.streaming.StreamingDedup.requireTierUnchanged(spark, out, "tiered")
    // first-batch recording is idempotent and atomic (create-if-absent)
    graft.streaming.StreamingDedup.recordTier(spark, out, "exact")
    graft.streaming.StreamingDedup.recordTier(spark, out, "exact")
    graft.streaming.StreamingDedup.requireTierUnchanged(spark, out, "exact")
    // ...and a recorded marker makes BOTH the pre-start validate and a
    // racing recorder fail fast on the other tier
    val flip = intercept[IllegalArgumentException] {
      graft.streaming.StreamingDedup.requireTierUnchanged(
        spark, out, "tiered")
    }
    assert(flip.getMessage.contains("cross-flip"), flip.getMessage)
    val flipRecord = intercept[IllegalArgumentException] {
      graft.streaming.StreamingDedup.recordTier(spark, out, "tiered")
    }
    assert(flipRecord.getMessage.contains("cross-flip"), flipRecord.getMessage)
  }

  test("tiered near-dup stream RESTART: killed between triggers and " +
      "resumed from the checkpoint — cross-restart pairs survive, " +
      "nothing double-publishes, final table equals batch") {
    val real = Tables.documents(spark, sf)
    val feed = real.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val arrivals = feed.zipWithIndex.map { case ((id, t), i) =>
      (ts(i % 3), id, t)
    }
    val docsDir = java.nio.file.Files
      .createTempDirectory("tiered-restart-src").toString
    val out = java.nio.file.Files
      .createTempDirectory("tiered-restart-out").toString
    val schema = arrivals.take(1).toSeq.toDF("ts", "doc_id", "text").schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(docsDir)
      // delay >> the fixture's event-time span: the RECOVERED
      // watermark from life 1 must not classify life 2's arrivals as
      // late (this test proves state recovery, not late-data policy)
      val q = graft.streaming.StreamingDedup.streamingTieredNearDup(
          spark, stream, real, "doc_id", "text", out,
          threshold = 0.8, dfCap = 50, delayMs = 3600000L)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val half = arrivals.length / 2
    arrivals.take(half).toSeq.toDF("ts", "doc_id", "text")
      .write.mode("append").parquet(docsDir)
    run()
    // second life: the rest of the corpus arrives AFTER the restart —
    // cross-restart pairs need the recovered bucket state
    arrivals.drop(half).toSeq.toDF("ts", "doc_id", "text")
      .write.mode("append").parquet(docsDir)
    run()
    val rows = spark.read.parquet(s"$out/pairs")
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length === rows.toSet.size, "pair re-published")
    val batch = graft.queries.Clean
      .tieredNearDupPairsOn(real, threshold = 0.8, dfCap = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(rows.toSet === batch)
    // the fixture genuinely crosses the restart: at least one pair's
    // sides arrived in different lives
    val firstIds = arrivals.take(half).map(_._2).toSet
    assert(batch.exists(p =>
      firstIds(p._1) != firstIds(p._2)), "no cross-restart pair")
  }

  test("auto near-dup stream RESTART on the exact tier: checkpoint " +
      "resume under the SAME tier completes to the batch dual; a " +
      "flipped-tier resume is refused end-to-end") {
    val real = Tables.documents(spark, sf)
    val feed = real.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val arrivals = feed.zipWithIndex.map { case ((id, t), i) =>
      (ts(i % 3), id, t)
    }
    val docsDir = java.nio.file.Files
      .createTempDirectory("auto-restart-src").toString
    val out = java.nio.file.Files
      .createTempDirectory("auto-restart-out").toString
    val schema = arrivals.take(1).toSeq.toDF("ts", "doc_id", "text").schema
    def run(est: Long): Unit = {
      val stream = spark.readStream.schema(schema).parquet(docsDir)
      val q = graft.streaming.StreamingDedup.streamingNearDupAuto(
          spark, stream, real, "doc_id", "text", out,
          threshold = 0.8, dfCap = 50,
          knownCandidateEstimate = Some(est), delayMs = 3600000L)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val half = arrivals.length / 2
    arrivals.take(half).toSeq.toDF("ts", "doc_id", "text")
      .write.mode("append").parquet(docsDir)
    run(est = 1L) // exact tier; tier marker lands on the first batch
    arrivals.drop(half).toSeq.toDF("ts", "doc_id", "text")
      .write.mode("append").parquet(docsDir)
    run(est = 1L) // same-tier resume
    val rows = spark.read.parquet(s"$out/pairs")
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length === rows.toSet.size, "pair re-published")
    val batch = graft.dedup.Dedup
      .exactJaccardPairs(real, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(rows.toSet === batch)
    assert(batch.nonEmpty)
    // a resume whose statistic now picks the OTHER tier must refuse
    // at CONSTRUCTION (before any state is touched)
    val flip = intercept[IllegalArgumentException](
      run(est = Long.MaxValue))
    assert(flip.getMessage.contains("cross-flip"), flip.getMessage)
  }

  test("blocklist gate stream RESTART: the stateless gate behind the " +
      "exactly-once file sink resumes without losing or duplicating " +
      "documents") {
    val real = Tables.documents(spark, sf)
    val feed = real.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val arrivals = feed.zipWithIndex.map { case ((id, t), i) =>
      (ts(i % 3), id, t)
    }
    val docsDir = java.nio.file.Files
      .createTempDirectory("blk-restart-src").toString
    val out = java.nio.file.Files
      .createTempDirectory("blk-restart-out").toString
    val schema = arrivals.take(1).toSeq.toDF("ts", "doc_id", "text").schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(docsDir)
      val q = graft.streaming.StreamingDedup.streamingBlocklistGate(
          stream, "text", graft.queries.Curate.BlocklistPhrases)
        .select(col("doc_id"))
        .writeStream.format("parquet")
        .option("path", s"$out/rows")
        .option("checkpointLocation", s"$out/_chk")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val half = arrivals.length / 2
    arrivals.take(half).toSeq.toDF("ts", "doc_id", "text")
      .write.mode("append").parquet(docsDir)
    run()
    arrivals.drop(half).toSeq.toDF("ts", "doc_id", "text")
      .write.mode("append").parquet(docsDir)
    run()
    val kept = spark.read.parquet(s"$out/rows")
      .collect().map(_.getLong(0))
    assert(kept.length === kept.distinct.length, "doc duplicated")
    val batchKept = real.filter(size(graft.functions.PhraseMatch
        .phrase_matches(col("text"),
          graft.queries.Curate.BlocklistPhrases)) === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept.toSet === batchKept)
    assert(batchKept.size < feed.length, "gate never fired")
  }

  test("streaming winnowing co-selection: a hot template tombstones " +
      "its buckets — emissions per hash stay under C(dfCap, 2)") {
    implicit val sqlCtx = spark.sqlContext
    val template = "the same boilerplate text repeated verbatim many times"
    val mem = MemoryStream[(Timestamp, Long, String)]
    val q = graft.streaming.StreamingDedup.streamingWinnowShared(
      spark, mem.toDS().toDF("ts", "doc_id", "text"), "doc_id", "text",
      dfCap = 4, delayMs = 60000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("winnow_hot_out")
      .start()
    try {
      mem.addData((1L to 30L).map(i => (ts(0), i, template))
        .toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val perHash = spark.table("winnow_hot_out").collect()
      .map(r => (r.getString(2), (r.getLong(0), r.getLong(1))))
      .groupBy(_._1).map { case (_, xs) => xs.length }
    assert(perHash.nonEmpty)
    assert(perHash.forall(_ <= 6),
      s"per-hash emissions must stay under C(4,2)=6: $perHash")
  }
}
