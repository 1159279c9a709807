package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.catalog.Warehouse
import graft.state.StateStore

/** Collapsing warehouse sink for the streaming near-dup pair stream —
  * the downstream half [[StreamingDedup.streamingMinhashPairs]]
  * documents: a pair colliding in m bands is emitted once per band
  * bucket (buckets cannot see each other's emissions), so the sink
  * upserts into a pair table keyed (id_a, id_b), collapsing the
  * per-band copies both inside a micro-batch and ACROSS micro-batches
  * (band 3's copy can arrive a batch after band 1's).
  *
  * Exactly-once under restart: same recipe as [[WarehouseSink]] —
  * each merge publishes as an atomic warehouse generation gated by
  * the KV store's last-committed batch id, so the replayed micro-batch
  * after a crash is skipped and the table never double-publishes.
  * (Duplicate-pair SEMANTICS are additionally idempotent — re-merging
  * an already-present pair is a no-op — so even a lost commit marker
  * degrades to a harmless re-merge, not corruption.)
  *
  * Scale shape: the merged table is the slim (id_a, id_b,
  * est_jaccard) relation — tiny relative to the document stream (near
  * dups are the exception, not the rule) — and the per-batch merge is
  * one groupBy over previous-generation + fresh rows. For hot streams
  * the right knob is the trigger interval (fewer, larger merges), not
  * a different sink.
  */
object PairSink {

  private[streaming] def batchKey(table: String) = s"pair_batch:$table"

  /** The per-batch upsert, exposed for direct replay testing. */
  private[graft] def commitBatch(
      wh: Warehouse,
      store: StateStore,
      table: String)(batch: DataFrame, batchId: Long): Unit = {
    val committed = store.get(batchKey(table)).map(_.toLong)
    if (!committed.exists(_ >= batchId)) {
      val spark = batch.sparkSession
      val fresh = batch.select("id_a", "id_b", "est_jaccard")
      val merged =
        (if (wh.manifest.contains(table))
           wh.table(spark, table).unionByName(fresh)
         else fresh)
          // every copy of a pair carries the identical est_jaccard
          // (same signature arithmetic in every band bucket); max is
          // just the associative collapse that proves it
          .groupBy(col("id_a"), col("id_b"))
          .agg(max(col("est_jaccard")).as("est_jaccard"))
      wh.publishAtomically(Map(table -> merged))
      store.set(batchKey(table), batchId.toString)
    }
  }

  def start(
      pairs: Dataset[StreamingDedup.NearDupPair],
      wh: Warehouse,
      store: StateStore,
      table: String,
      checkpoint: Option[String] = None,
      queryName: String = "pair_sink"): StreamingQuery = {
    val writer = pairs.toDF().writeStream
      .outputMode("append")
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(wh, store, table)(batch, batchId)
      }
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }
}
