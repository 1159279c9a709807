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

  /** `dbtool.py:123-136` user:grant_schema_read — read access to every
    * published table, current AND future (the warehouse's schema-level
    * grant is the ALTER DEFAULT PRIVILEGES analogue).
    */
  def grantSchemaRead(user: String): Unit = {
    out(s"Granting user '$user' read-only access to schema 'public'.")
    warehouse.grantSchemaRead(user)
  }

  /** `dbtool.py:149-162` user:create — random password, user recorded
    * in the warehouse registry (sha-256, never plaintext), then
    * schema-wide read access. Returns the password exactly once — the
    * caller must keep it safe, like the reference prints.
    */
  def createUser(user: String): String = {
    val password = DbTool.randomPassword(16)
    require(warehouse.createUser(user, password),
      s"user '$user' already exists")
    out(s"Creating user '$user' and granting them access to the db.")
    out(s"Their password is '$password'. Please keep this safe!")
    grantSchemaRead(user)
    password
  }

  /** `dbtool.py:90-92` shell — the non-interactive analogue: run one
    * SQL statement against the published tables (every manifest table
    * is exposed as a view first, so queries see what a psql session
    * against the reference's public schema would).
    */
  def sql(query: String, maxRows: Int = 100): Seq[String] = {
    warehouse.manifest.keys.foreach { t =>
      warehouse.table(spark, t).createOrReplaceTempView(t)
    }
    val df = spark.sql(query)
    val header = df.columns.mkString("\t")
    val rows = df.limit(maxRows).collect()
      .map(_.toSeq.map(v => if (v == null) "NULL" else v.toString)
        .mkString("\t"))
    val lines = header +: rows.toSeq
    lines.foreach(out)
    lines
  }
}

object DbTool {
  /** `dbtool.py:139-146` generate_random_password: alphanumeric,
    * crypto-strength source.
    */
  def randomPassword(numChars: Int = 16): String = {
    val alphabet =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    val rng = new java.security.SecureRandom()
    (1 to numChars).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
  }
}
