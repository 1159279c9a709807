package graft.runner

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.Warehouse
import graft.datasets.DatasetSpec
import graft.state.{DatasetTracker, HttpClient, StateStore, UrlModTracker}

/** Orchestration of one dataset load — the reference's
  * `load_dataset(dataset, config)` (`load_dataset.py:308-381`):
  *
  *   1. conditional HTTP pre-flight; all-304 => skip + notify (:346-357)
  *   2. read sources, build derived tables (:359-367)
  *   3. atomic publish (:365-370)
  *   4. register dataset-published functions (:372-376)
  *   5. commit lastmod validators + tracker timestamp (:378-379)
  *   6. notify success (:380); errors notify + rethrow (:395-411)
  *
  * State commits happen strictly AFTER publish succeeds, so a failed run
  * leaves validators stale and the next run retries — the reference's
  * exact idempotency contract (`tests/test_load_dataset.py:78-84`).
  */
final class JobRunner(
    spark: SparkSession,
    warehouse: Warehouse,
    store: StateStore,
    http: HttpClient,
    notifier: Notifier,
    clock: () => java.time.Instant = () => java.time.Instant.now()) {

  def run(ds: DatasetSpec, force: Boolean = false): Boolean =
    try {
      val tracker = new UrlModTracker(ds.urls, store, http)
      // Probe validators even when forced (result ignored) so a forced
      // load still refreshes etag/last-modified and the next scheduled
      // run doesn't redundantly re-detect change and reload.
      val changed = ds.urls.nonEmpty && tracker.didAnyUrlsChange()
      if (!force && ds.urls.nonEmpty && !changed) {
        notifier.sendmsg(
          s"The dataset `${ds.name}` has not changed since we last retrieved it.")
        false
      } else {
        notifier.sendmsg(s"Downloading and loading the dataset `${ds.name}` into the database...")
        val base: Map[String, DataFrame] =
          ds.sources.map(s => s.name -> s.read(spark)).toMap
        val derived: Map[String, DataFrame] =
          ds.derived.map { case (n, f) => n -> f(spark, base) }
        warehouse.publishAtomically(base ++ derived,
          generation = clock().toEpochMilli)
        ds.udfs.foreach { case (_, register) => register(spark) }
        if (ds.urls.nonEmpty) tracker.updateLastmods()
        new DatasetTracker(store, clock).updateTracker(ds.name)
        notifier.sendmsg(s"Finished loading the dataset `${ds.name}` into the database.")
        true
      }
    } catch {
      case NonFatal(e) =>
        // `load_dataset.py:395-411` error_handling: notify, then rethrow
        notifier.sendError(
          s"Alas, an error occurred when loading the dataset `${ds.name}`.")
        throw e
    }
}
