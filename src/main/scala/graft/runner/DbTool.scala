package graft.runner

import org.apache.spark.sql.SparkSession

import graft.catalog.Warehouse
import graft.datasets.DatasetSpec
import graft.state.{StateStore, UrlModTracker}

/** Introspection / administration CLI — `dbtool.py:1-183`: `rowcounts`,
  * `lastmod:list`, `lastmod:reset`, `user:grant_schema_read`,
  * `user:create`, `shell`, each dataset-scoped where the reference is,
  * plus [[DbTool.usage]]-shaped dispatch via [[dispatch]].
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
    * grant is the ALTER DEFAULT PRIVILEGES analogue). The warehouse is
    * single-schema, so only `public` resolves.
    */
  def grantSchemaRead(user: String, schema: String = "public"): Unit = {
    require(schema == "public", s"unknown schema '$schema' (only 'public')")
    out(s"Granting user '$user' read-only access to schema '$schema'.")
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

  /** Dataset-scoped `show_rowcounts` (`dbtool.py:76-87`): counts only
    * the tables each named dataset publishes, with the reference's
    * per-dataset framing and comma-grouped counts.
    */
  def rowcountsFor(datasets: Seq[DatasetSpec]): Map[String, Long] = {
    // count only the requested datasets' tables — a warehouse-wide
    // rowcounts() here would scan EVERY published table to answer a
    // one-dataset question
    val published = warehouse.manifest.keySet
    datasets.flatMap { ds =>
      out(s"For ${ds.name}'s public schema:")
      out("")
      val rows = ds.tableNames.filter(published)
        .map(t => t -> warehouse.table(spark, t).count())
      rows.foreach { case (t, n) =>
        out("  %s has %,d rows.".formatLocal(java.util.Locale.US, t, n))
      }
      out("")
      rows
    }.toMap
  }

  /** Dataset-scoped `list_lastmod` (`dbtool.py:95-109`): per dataset,
    * per URL, the stored Last-Modified validator (or its absence).
    */
  def listLastmodFor(datasets: Seq[DatasetSpec]): Seq[(String, Option[String])] =
    datasets.flatMap { ds =>
      out(s"For the dataset ${ds.name}:")
      ds.urls.map { url =>
        val lm = store.get(UrlModTracker.lastModifiedKey(url))
        lm match {
          case Some(when) =>
            out(s"  The URL $url was last modified on $when.")
          case None =>
            out(s"  The URL $url has no metadata about its last " +
              "modification date.")
        }
        url -> lm
      }
    }

  /** Dataset-scoped `reset_lastmod` (`dbtool.py:111-120`): forget BOTH
    * validators (etag + last_modified) for every URL of every named
    * dataset so the next run force-reloads.
    */
  def resetLastmodFor(datasets: Seq[DatasetSpec]): Int =
    datasets.map { ds =>
      out(s"For the dataset ${ds.name}:")
      ds.urls.foreach { url =>
        out(s"Clearing last modification metadata for ${ds.name}'s URL $url.")
        store.delete(UrlModTracker.etagKey(url))
        store.delete(UrlModTracker.lastModifiedKey(url))
      }
      ds.urls.size
    }.sum

  /** `dbtool.py:165-183` main — docopt-shaped dispatch over
    * [[DbTool.usage]]. Dataset arguments are validated against the
    * registry with `all` expansion (`validate_and_get_dataset_names`,
    * `dbtool.py:43-57`); an unknown name prints the candidates and
    * returns exit code 1 like the reference's `sys.exit(1)`.
    */
  def dispatch(argv: Seq[String], registry: Seq[DatasetSpec]): Int = {
    def resolve(names: Seq[String]): Option[Seq[DatasetSpec]] = {
      val known = registry.map(d => d.name -> d).toMap
      val bad = names.filter(n => n != "all" && !known.contains(n))
      bad.headOption match {
        case Some(b) =>
          out(s"ERROR: $b is not a valid dataset. Please choose from:")
          registry.foreach(d => out(d.name))
          out("all")
          None
        case None => Some(names.flatMap {
          case "all" => registry
          case n     => Seq(known(n))
        }.distinct) // `all region_ds` must not run region_ds twice
      }
    }
    // a CLI reports command failures as exit codes, not stack traces —
    // including analysis/IO errors from the SQL shell and table reads
    def run(body: => Unit): Int =
      try { body; 0 }
      catch {
        case scala.util.control.NonFatal(e) =>
          // class name kept so a message-less NPE is not just "null"
          out(s"ERROR: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("(no message)"))
          1
      }
    argv.toList match {
      case "rowcounts" :: names if names.nonEmpty =>
        resolve(names).map(ds => run(rowcountsFor(ds))).getOrElse(1)
      case "lastmod:list" :: names if names.nonEmpty =>
        resolve(names).map(ds => run(listLastmodFor(ds))).getOrElse(1)
      case "lastmod:reset" :: names if names.nonEmpty =>
        resolve(names).map(ds => run(resetLastmodFor(ds))).getOrElse(1)
      case "user:grant_schema_read" :: user :: schema :: Nil =>
        run(grantSchemaRead(user, schema))
      case "user:create" :: user :: Nil =>
        run(createUser(user))
      case "shell" :: query :: Nil =>
        run(sql(query))
      case "snapshots" :: Nil =>
        run(listSnapshots())
      case "vacuum" :: rest if rest.size <= 1 =>
        run(vacuum(rest.headOption.map(_.toInt).getOrElse(0)))
      case _ =>
        out(DbTool.usage); 1
    }
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
    // fetch one row past the limit so truncation is visible, not silent
    val fetched = df.limit(maxRows + 1).collect()
    val rows = fetched.take(maxRows)
      .map(_.toSeq.map(v => if (v == null) "NULL" else v.toString)
        .mkString("\t"))
    val lines = (header +: rows.toSeq) ++
      (if (fetched.length > maxRows)
         Seq(s"... (output truncated at $maxRows rows)")
       else Nil)
    lines.foreach(out)
    lines
  }
}

object DbTool {
  /** The CLI surface — `dbtool.py:1-17` docstring, verbatim shape
    * (`shell` takes the statement as an argument because the engine's
    * shell is non-interactive).
    */
  val usage: String =
    """Usage:
      |  dbtool shell <sql>
      |  dbtool rowcounts <dataset>...
      |  dbtool lastmod:list <dataset>...
      |  dbtool lastmod:reset <dataset>...
      |  dbtool user:grant_schema_read <user> <schema>
      |  dbtool user:create <user>
      |  dbtool snapshots
      |  dbtool vacuum [<retain>]""".stripMargin

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
