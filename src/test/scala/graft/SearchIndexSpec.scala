package graft

import java.time.Instant

import org.apache.spark.sql.DataFrame

import graft.runner.{RecordingNotifier, SearchIndexClient, SearchIndexSync}
import graft.state.{MemoryStateStore, UrlModTracker}

/** Freshness-gated search-index refresh — golden message sequences
  * mirroring the reference's `update_landlord_search_index`
  * (`wowutil.py:99-141`) in the style of its slack_outbox fixtures.
  */
class SearchIndexSpec extends SparkSpec {
  import spark.implicits._

  private val url = "https://data.example.org/hpd_registrations.csv"
  private def records: DataFrame = Seq((1L, "acme llc")).toDF("id", "name")

  private final class FakeClient(updatedAt: Option[Instant])
      extends SearchIndexClient {
    var rebuilt: List[String] = Nil
    def indexUpdatedAt(index: String): Option[Instant] = updatedAt
    def rebuild(index: String, recs: DataFrame): Unit = {
      assert(recs.count() === 1) // the record pipeline actually ran
      rebuilt ::= index
    }
  }

  test("no client configured: notify and skip (wowutil.py:101-106)") {
    val out = new RecordingNotifier
    val sync = new SearchIndexSync(None, new MemoryStateStore, out)
    assert(!sync.syncIfStale("wow_landlords", url, records))
    assert(out.outbox ===
      Seq("Connection to search service not configured. Skipping..."))
  }

  test("source older than index: skip without touching the service") {
    val store = new MemoryStateStore
    store.set(UrlModTracker.lastModifiedKey(url),
      "Mon, 01 Jan 2024 00:00:00 GMT")
    val client = new FakeClient(Some(Instant.parse("2025-06-01T00:00:00Z")))
    val out = new RecordingNotifier
    val sync = new SearchIndexSync(Some(client), store, out)
    assert(!sync.syncIfStale("wow_landlords", url, records))
    assert(client.rebuilt === Nil)
    assert(out.outbox === Seq(
      "No new data to add to wow_landlords search index. Skipping..."))
  }

  test("newer source data: rebuild with start/finish messages") {
    val store = new MemoryStateStore
    store.set(UrlModTracker.lastModifiedKey(url),
      "Tue, 01 Jul 2025 12:00:00 GMT")
    val client = new FakeClient(Some(Instant.parse("2025-06-01T00:00:00Z")))
    val out = new RecordingNotifier
    val sync = new SearchIndexSync(Some(client), store, out)
    assert(sync.syncIfStale("wow_landlords", url, records))
    assert(client.rebuilt === List("wow_landlords"))
    assert(out.outbox === Seq(
      "Rebuilding wow_landlords search index...",
      "Finished rebuilding wow_landlords search index."))
  }

  test("index absent in the service: first build proceeds") {
    val store = new MemoryStateStore
    store.set(UrlModTracker.lastModifiedKey(url),
      "Mon, 01 Jan 2024 00:00:00 GMT")
    val client = new FakeClient(None)
    val sync = new SearchIndexSync(Some(client), store, new RecordingNotifier)
    assert(sync.syncIfStale("wow_landlords", url, records))
    assert(client.rebuilt === List("wow_landlords"))
  }

  test("no recorded source validator: documented safe skip") {
    val client = new FakeClient(Some(Instant.parse("2025-06-01T00:00:00Z")))
    val out = new RecordingNotifier
    val sync = new SearchIndexSync(Some(client), new MemoryStateStore, out)
    assert(!sync.syncIfStale("wow_landlords", url, records))
    assert(client.rebuilt === Nil)
    assert(out.outbox ===
      Seq("No recorded source update for wow_landlords. Skipping..."))
  }
}
