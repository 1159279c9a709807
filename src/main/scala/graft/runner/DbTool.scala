package graft.runner

import org.apache.spark.sql.SparkSession

import graft.catalog.Warehouse
import graft.state.StateStore

/** Introspection / administration CLI — `dbtool.py:1-183`:
  * `rowcounts`, `lastmod:list`, `lastmod:reset` (grants/shell are
  * Postgres-specific; catalog ACLs don't exist in OSS Spark, recorded as
  * reduced-fidelity in SURVEY §2.11).
  */
final class DbTool(
    spark: SparkSession,
    warehouse: Warehouse,
    store: StateStore,
    out: String => Unit = println) {

  /** `dbtool.py:76-87` show_rowcounts. */
  def rowcounts(): Map[String, Long] = {
    val counts = warehouse.rowcounts(spark)
    counts.toSeq.sortBy(_._1).foreach { case (t, n) =>
      out(f"$t%-40s $n%10d rows")
    }
    counts
  }

  /** `dbtool.py:95-109` list_lastmod over `lastmod:*` keyspace. */
  def listLastmod(): Seq[(String, String)] = {
    val rows = (store.keysWithPrefix("etag:") ++
      store.keysWithPrefix("last_modified:"))
      .map(k => k -> store.get(k).getOrElse(""))
    rows.foreach { case (k, v) => out(s"$k = $v") }
    rows
  }

  /** `dbtool.py:111-120` reset_lastmod — forget validators so the next
    * run force-reloads.
    */
  def resetLastmod(urlSubstring: String = ""): Int = {
    val victims = (store.keysWithPrefix("etag:") ++
      store.keysWithPrefix("last_modified:"))
      .filter(_.contains(urlSubstring))
    victims.foreach(store.delete)
    out(s"reset ${victims.size} lastmod entries")
    victims.size
  }

  /** Snapshot-log listing (no reference analogue — the warehouse keeps
    * publish history the temp-schema design threw away).
    */
  def listSnapshots(): Seq[Long] = {
    val snaps = warehouse.snapshots
    snaps.foreach(g => out(
      s"snapshot $g: ${warehouse.manifestAt(g).keys.toSeq.sorted.mkString(", ")}"))
    snaps
  }

  /** Expire history + drop unreferenced generations. */
  def vacuum(retainSnapshots: Int = 0): Seq[String] = {
    val dropped = warehouse.vacuum(retainSnapshots)
    out(s"dropped ${dropped.size} generation dirs " +
      s"(retaining $retainSnapshots snapshots)")
    dropped
  }
}
