package graft.runner

import java.time.Instant
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.DataFrame

import graft.state.{StateStore, UrlModTracker}

/** External search-index client surface — the reference's Algolia
  * dependency behind a trait (`wowutil.py:99-141`): list/read the
  * index's last-updated stamp, rebuild it from a record set. Tests
  * drive a recording fake; a production binding would wrap whatever
  * search service the deployment uses.
  */
trait SearchIndexClient {
  /** Index's last rebuild time; None if the index does not exist yet. */
  def indexUpdatedAt(index: String): Option[Instant]
  def rebuild(index: String, records: DataFrame): Unit
}

/** Freshness-gated search-index refresh — the reference's
  * `update_landlord_search_index` (`wowutil.py:99-141`):
  *
  *  1. no client configured -> notify and skip (`:101-106`);
  *  2. read the index's `updatedAt` from the service (`:111-118`);
  *  3. read the SOURCE dataset's Last-Modified from the state store's
  *     `last_modified:<url>` key — the same validator the conditional
  *     HTTP gate persists (`:88-96`, [[UrlModTracker]]);
  *  4. source older than index -> notify and skip (`:123-127`);
  *  5. otherwise rebuild with start/finish notifications (`:129-141`).
  *
  * Deviations from the reference, both documented safety fixes: a
  * missing source validator skips with a message (the reference would
  * raise comparing None), and a missing index forces the first build.
  */
final class SearchIndexSync(
    client: Option[SearchIndexClient],
    store: StateStore,
    notifier: Notifier) {

  /** Returns true iff the index was rebuilt. `records` is by-name so
    * the (potentially expensive) record pipeline only runs when the
    * gate decides to rebuild.
    */
  def syncIfStale(
      index: String,
      sourceUrl: String,
      records: => DataFrame): Boolean = client match {
    case None =>
      notifier.sendmsg(
        "Connection to search service not configured. Skipping...")
      false
    case Some(c) =>
      val indexUpdated = c.indexUpdatedAt(index)
      val sourceUpdated = store
        .get(UrlModTracker.lastModifiedKey(sourceUrl))
        .map(s => Instant.from(DateTimeFormatter.RFC_1123_DATE_TIME.parse(s)))
      (sourceUpdated, indexUpdated) match {
        case (None, _) =>
          notifier.sendmsg(
            s"No recorded source update for $index. Skipping...")
          false
        case (Some(src), Some(idx)) if src.isBefore(idx) =>
          notifier.sendmsg(
            s"No new data to add to $index search index. Skipping...")
          false
        case _ =>
          notifier.sendmsg(s"Rebuilding $index search index...")
          c.rebuild(index, records)
          notifier.sendmsg(s"Finished rebuilding $index search index.")
          true
      }
  }
}
