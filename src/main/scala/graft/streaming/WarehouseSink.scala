package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.catalog.Warehouse
import graft.state.StateStore

/** Streaming -> warehouse sink: publish each micro-batch result as an
  * atomic warehouse generation, exactly-once under restarts.
  *
  * This closes the loop between the reference's batch semantics
  * (readers only ever see complete snapshots, load_dataset.py:209-252)
  * and Structured Streaming: `foreachBatch` + the KV store's
  * last-committed batch id is the standard exactly-once recipe —
  * after a crash the engine REPLAYS the last micro-batch, and the
  * idempotence gate skips batch ids at-or-below the committed
  * watermark, so the warehouse never double-publishes.
  *
  * Use `outputMode("complete")` aggregations: each micro-batch emits
  * the full current snapshot, which is exactly what an atomic
  * publish wants (generation N+1 supersedes N wholesale).
  */
object WarehouseSink {

  private[streaming] def batchKey(table: String) = s"stream_batch:$table"

  /** The per-batch commit, exposed for direct testing: publishes
    * `batch` as the new generation of `table` unless `batchId` was
    * already committed (replay after restart).
    */
  private[graft] def commitBatch(
      wh: Warehouse,
      store: StateStore,
      table: String)(batch: DataFrame, batchId: Long): Unit = {
    val committed = store.get(batchKey(table)).map(_.toLong)
    if (!committed.exists(_ >= batchId)) {
      wh.publishAtomically(Map(table -> batch))
      store.set(batchKey(table), batchId.toString)
    }
  }

  def start(
      snapshots: DataFrame,
      wh: Warehouse,
      store: StateStore,
      table: String,
      queryName: String = "warehouse_sink"): StreamingQuery =
    snapshots.writeStream
      .outputMode("complete")
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(wh, store, table)(batch, batchId)
      }
      .start()
}
