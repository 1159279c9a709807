package graft.state

import java.time.{Instant, ZoneId, ZonedDateTime}
import java.time.format.DateTimeFormatter

/** HTTP validator result for one conditional request. */
final case class HttpCheck(
    status: Int,
    etag: Option[String],
    lastModified: Option[String])

/** Pluggable HTTP head/get (the reference uses `requests` with streamed
  * GET closed without body on 304, `lib/lastmod.py:53-61`). Production
  * impl is java.net; tests inject fakes (mirrors
  * `tests/test_lastmod.py:7-68`'s mocked 200/304/500 responses).
  */
trait HttpClient {
  def check(url: String, headers: Map[String, String]): HttpCheck
}

final class JavaHttpClient extends HttpClient {
  def check(url: String, headers: Map[String, String]): HttpCheck = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("GET")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(10000)
      val status = conn.getResponseCode
      HttpCheck(status,
        Option(conn.getHeaderField("ETag")),
        Option(conn.getHeaderField("Last-Modified")))
    } finally conn.disconnect()
  }
}

/** Conditional-scan change detector — `lib/lastmod.py`:
  *  - keyspace `etag:{url}` / `last_modified:{url}` (:13-22);
  *  - request headers `If-None-Match` / `If-Modified-Since` (:32-38);
  *  - `did_any_urls_change` treats 304 as unchanged, anything else as
  *    changed (:49-62);
  *  - `update_lastmods` persists the new validators (:64-66).
  *
  * This is the job-level "partition pruning on change detection" gate
  * (SURVEY §2.1 S1): the whole dataset load short-circuits when every
  * source returns 304 (`load_dataset.py:352-357`).
  */
final class UrlModTracker(
    urls: Seq[String],
    store: StateStore,
    http: HttpClient) {

  import UrlModTracker._

  private var pending: Map[String, HttpCheck] = Map.empty

  private def conditionalHeaders(url: String): Map[String, String] =
    store.get(etagKey(url)).map("If-None-Match" -> _).toMap ++
      store.get(lastModifiedKey(url)).map("If-Modified-Since" -> _).toMap

  /** True iff at least one URL changed (non-304). Records the fresh
    * validators for a later [[updateLastmods]] commit — validators are
    * only persisted AFTER a successful load, so a crashed load re-runs
    * (same commit ordering as `load_dataset.py:360-378`).
    */
  def didAnyUrlsChange(): Boolean = {
    pending = urls.map { u => u -> http.check(u, conditionalHeaders(u)) }.toMap
    pending.values.exists(_.status != 304)
  }

  /** Persist validators from the last check (`lib/lastmod.py:64-66`). */
  def updateLastmods(): Unit =
    pending.foreach { case (url, c) =>
      if (c.status != 304) {
        store.setOrDelete(etagKey(url), c.etag)
        store.setOrDelete(lastModifiedKey(url), c.lastModified)
      }
    }
}

object UrlModTracker {
  def etagKey(url: String): String = s"etag:$url"
  def lastModifiedKey(url: String): String = s"last_modified:$url"
}

/** Dataset completion tracker — `lib/dataset_tracker.py:7-17`: key
  * `dataset_tracker:{name}` -> ISO timestamp in America/New_York.
  * Clock is injected for frozen-clock tests
  * (`tests/test_dataset_tracker.py:13-22`).
  */
final class DatasetTracker(
    store: StateStore,
    clock: () => Instant = () => Instant.now()) {
  import DatasetTracker._

  def updateTracker(dataset: String): Unit = {
    val t = ZonedDateTime.ofInstant(clock(), ZoneId.of("America/New_York"))
    store.set(key(dataset), t.format(DateTimeFormatter.ISO_OFFSET_DATE_TIME))
  }

  def lastUpdated(dataset: String): Option[String] = store.get(key(dataset))
}

object DatasetTracker {
  def key(dataset: String): String = s"dataset_tracker:$dataset"
}
