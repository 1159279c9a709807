package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.Warehouse
import graft.datasets.{DatasetSpec, Scheduling}
import graft.ingest.{CsvSource, OptionalSource, ParquetSource}
import graft.runner.{DbTool, JobRunner, Notifier, RecordingNotifier}
import graft.sqlparse.CreatedTables
import graft.state._

/** End-to-end job orchestration — mirrors the reference's notifier
  * golden sequences (`tests/test_load_dataset.py:113-151`), 304
  * short-circuit (`:352-357`), idempotency (`:78-84`), and the S5
  * empty-fallback source contract.
  */
class RunnerSpec extends SparkSpec {

  private val fixedClock = () => Instant.parse("2024-06-01T12:00:00Z")

  private def mkHttp(status: () => Int) = new HttpClient {
    def check(url: String, headers: Map[String, String]) =
      HttpCheck(status(), Some("e1"), None)
  }

  private def regionDataset = DatasetSpec(
    name = "region_ds",
    urls = Seq("http://example.test/region.csv"),
    sources = Seq(ParquetSource("region", s"$sf/region.parquet")),
    derived = Map(
      "region_counts" -> ((s, base) =>
        base("region").groupBy(col("r_name")).agg(count(lit(1)).as("n")))),
    schedule = Scheduling.Daily10pm)

  test("first run loads + publishes; 304 second run skips; golden messages") {
    val wh = new Warehouse(Files.createTempDirectory("graft-run"))
    val store = new MemoryStateStore
    val outbox = new RecordingNotifier
    var status = 200
    val runner = new JobRunner(spark, wh, store, mkHttp(() => status),
      outbox, fixedClock)

    assert(runner.run(regionDataset))
    assert(wh.rowcounts(spark).keySet === Set("region", "region_counts"))
    assert(store.get("etag:http://example.test/region.csv").contains("e1"))
    assert(new DatasetTracker(store).lastUpdated("region_ds").nonEmpty)
    assert(outbox.outbox === Seq(
      "Downloading and loading the dataset `region_ds` into the database...",
      "Finished loading the dataset `region_ds` into the database."))

    outbox.clear()
    status = 304
    assert(!runner.run(regionDataset)) // conditional-scan short-circuit
    assert(outbox.outbox === Seq(
      "The dataset `region_ds` has not changed since we last retrieved it."))

    outbox.clear()
    assert(runner.run(regionDataset, force = true)) // dbtool-style force
    val first = wh.rowcounts(spark)
    runner.run(regionDataset, force = true)
    assert(wh.rowcounts(spark) === first) // idempotent
  }

  test("forced run still refreshes etag/last-modified validators") {
    val wh = new Warehouse(Files.createTempDirectory("graft-force"))
    val store = new MemoryStateStore
    var etag = "e1"
    val http = new HttpClient {
      def check(url: String, headers: Map[String, String]) =
        HttpCheck(200, Some(etag), None)
    }
    val runner = new JobRunner(spark, wh, store, http,
      new RecordingNotifier, fixedClock)
    runner.run(regionDataset)
    assert(store.get("etag:http://example.test/region.csv").contains("e1"))
    etag = "e2"
    runner.run(regionDataset, force = true)
    // without the probe-on-force fix this stays "e1" and the next
    // scheduled run would redundantly re-detect change and reload
    assert(store.get("etag:http://example.test/region.csv").contains("e2"))
  }

  test("failure notifies and leaves warehouse state intact") {
    val wh = new Warehouse(Files.createTempDirectory("graft-run"))
    val store = new MemoryStateStore
    val outbox = new RecordingNotifier
    val runner = new JobRunner(spark, wh, store, mkHttp(() => 200),
      outbox, fixedClock)
    runner.run(regionDataset)
    val before = wh.manifest

    val bad = regionDataset.copy(
      name = "bad_ds",
      derived = Map("kaboom" -> ((s, base) => {
        val boom = udf((i: Int) => { if (i >= 0) throw new RuntimeException("x"); i })
        base("region").select(boom(col("r_regionkey")).as("k"))
      })))
    intercept[Exception] { runner.run(bad) }
    assert(wh.manifest === before)
    assert(outbox.outbox.last ===
      "ERROR: Alas, an error occurred when loading the dataset `bad_ds`.")
    // crash => validators NOT committed, so the next run retries
    assert(store.get("etag:http://example.test/region.csv").contains("e1"))
  }

  test("OptionalSource publishes an empty declared-schema table when unavailable") {
    // ocautil.py:49-68 / signatureutil.py:52-71 semantics
    val schema = StructType(Seq(
      StructField("bbl", StringType), StructField("unitsres", IntegerType)))
    val src = OptionalSource("oca_addresses",
      CsvSource("oca_addresses", "/nonexistent.csv", schema),
      schema, available = () => false)
    val df = src.read(spark)
    assert(df.count() === 0)
    assert(df.schema === schema)
  }

  test("protected dataset end-to-end: absent creds publish EMPTY tables; " +
      "present creds load fully (ocautil shape)") {
    // ocautil.py:49-90 + tests/test_ocautil.py:20-45 — the registry's
    // oca_address dataset run through JobRunner both ways
    import graft.datasets.Registry
    val dataDir = Files.createTempDirectory("graft-oca-data").toString
    val wh = new Warehouse(Files.createTempDirectory("graft-oca-wh"))
    val store = new MemoryStateStore
    val outbox = new RecordingNotifier
    val runner = new JobRunner(spark, wh, store, mkHttp(() => 200),
      outbox, fixedClock)
    val ds = Registry.byName(dataDir, "oca_address").get

    // creds absent: publish still happens, tables are EMPTY with the
    // DECLARED schema (downstream consumers keep working)
    System.clearProperty("graft.oca.creds")
    runner.run(ds)
    val empty = wh.table(spark, "oca_addresses")
    assert(empty.count() === 0)
    assert(empty.schema === Registry.ocaSchema)
    assert(wh.table(spark, "oca_evictions_bldgs").count() === 0)
    assert(wh.table(spark, "oca_evictions_bldgs").columns.toSeq ===
      Seq("bbl", "n_filings", "units"))

    // creds present + data staged: the same spec loads fully
    import spark.implicits._
    Seq(("idx1", "1000010001", 12), ("idx2", "1000010001", 12),
        ("idx3", "3000050009", 3))
      .toDF("indexnumberid", "bbl", "unitsres")
      .write.parquet(s"$dataDir/oca_addresses.parquet")
    System.setProperty("graft.oca.creds", "true")
    try {
      runner.run(ds)
      assert(wh.table(spark, "oca_addresses").count() === 3)
      val bldgs = wh.table(spark, "oca_evictions_bldgs")
        .orderBy("bbl").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(bldgs.toSeq === Seq(("1000010001", 2L, 24L),
        ("3000050009", 1L, 3L)))
    } finally System.clearProperty("graft.oca.creds")
  }

  test("signature dataset end-to-end: absent creds publish EMPTY tables " +
      "(all six); present creds build the full derived family") {
    // signatureutil.py:40-74 + tests/test_signatureutil.py:20-73 —
    // the S3-gated raw tables and the four derived builds, run
    // through JobRunner both ways, rebuild idempotent
    import graft.datasets.Registry
    val dataDir = Files.createTempDirectory("graft-sig-data").toString
    val wh = new Warehouse(Files.createTempDirectory("graft-sig-wh"))
    val runner = new JobRunner(spark, wh, new MemoryStateStore,
      mkHttp(() => 200), new RecordingNotifier, fixedClock)
    val ds = Registry.byName(dataDir, "signature").get
    assert(ds.tableNames.toSet === Set(
      "signature_unhp_buildings", "signature_unhp_loan_status",
      "signature_buildings", "signature_collections",
      "signature_building_charts", "signature_collection_charts"))

    // creds absent: every table publishes EMPTY with its schema
    System.clearProperty("graft.signature.creds")
    runner.run(ds)
    assert(wh.table(spark, "signature_unhp_buildings").count() === 0)
    assert(wh.table(spark, "signature_unhp_buildings").schema ===
      Registry.signatureBldgSchema)
    assert(wh.table(spark, "signature_buildings").count() === 0)
    assert(wh.table(spark, "signature_collections").count() === 0)
    assert(wh.table(spark, "signature_collection_charts").columns.toSeq ===
      Seq("collection", "period", "loan_status", "n_bldgs"))

    // creds present + staged data: full build, latest-status join and
    // rollups verified
    import spark.implicits._
    Seq(("1000010001", "unhp_a", 12, 500000L),
        ("1000010002", "unhp_a", 8, 250000L),
        ("3000050009", "unhp_b", 3, 90000L))
      .toDF("bbl", "collection", "unitsres", "loan_amount")
      .write.parquet(s"$dataDir/signature_unhp_buildings.parquet")
    Seq(("1000010001", "2024-01", "current"),
        ("1000010001", "2024-02", "default"),
        ("3000050009", "2024-02", "current"))
      .toDF("bbl", "period", "loan_status")
      .write.parquet(s"$dataDir/signature_unhp_loan_status.parquet")
    System.setProperty("graft.signature.creds", "true")
    try {
      runner.run(ds)
      val bldgs = wh.table(spark, "signature_buildings")
        .orderBy("bbl").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(4)))
      // latest status per bbl; statusless building survives with null
      assert(bldgs.toSeq === Seq(
        ("1000010001", "unhp_a", "default"),
        ("1000010002", "unhp_a", null),
        ("3000050009", "unhp_b", "current")))
      val colls = wh.table(spark, "signature_collections")
        .orderBy("collection").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(colls.toSeq === Seq(("unhp_a", 2L, 20L, 750000L),
        ("unhp_b", 1L, 3L, 90000L)))
      val charts = wh.table(spark, "signature_collection_charts")
        .orderBy("collection", "period", "loan_status").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      assert(charts.toSeq === Seq(
        ("unhp_a", "2024-01", "current", 1L),
        ("unhp_a", "2024-02", "default", 1L),
        ("unhp_b", "2024-02", "current", 1L)))
      // rebuild idempotent (test_signatureutil.py:70-73: running
      // build again must not raise, tables stay populated)
      runner.run(ds, force = true)
      assert(wh.table(spark, "signature_buildings").count() === 3)
    } finally System.clearProperty("graft.signature.creds")
  }

  test("good_cause_eviction dataset: screener derives from the star " +
      "tables, populated, rebuild idempotent") {
    // goodcauseutil.py:30-74 + tests/test_goodcauseutil.py:15-63 —
    // gce_screener is a pure derived build (no gated source of its
    // own) and rebuilding must not raise
    import graft.datasets.Registry
    val wh = new Warehouse(Files.createTempDirectory("graft-gce-wh"))
    val runner = new JobRunner(spark, wh, new MemoryStateStore,
      mkHttp(() => 200), new RecordingNotifier, fixedClock)
    val ds = Registry.byName(sf, "good_cause_eviction").get
    runner.run(ds)
    val screener = wh.table(spark, "gce_screener")
    assert(screener.columns.toSeq === Seq("bldg_id", "name", "segment",
      "openviolations", "totalviolations", "above_unit_threshold",
      "recently_active", "gce_eligible"))
    assert(screener.count() > 0)
    // the eligibility flag is consistent with its inputs
    val bad = screener.filter(col("gce_eligible") =!=
      (col("above_unit_threshold") && col("openviolations") > 0)).count()
    assert(bad === 0)
    runner.run(ds, force = true)
    assert(wh.table(spark, "gce_screener").count() === screener.count())
  }

  test("CsvSource loads with DECLARED schema (no inference)") {
    val dir = Files.createTempDirectory("graft-csv")
    Files.writeString(dir.resolve("d.csv"), "bbl,units\n1000010001,12\n1000010002,3\n")
    val schema = StructType(Seq(
      StructField("bbl", StringType), StructField("units", IntegerType)))
    val df = CsvSource("d", dir.toString + "/d.csv", schema).read(spark)
    assert(df.schema === schema)
    assert(df.count() === 2)
  }

  test("DbTool: rowcounts, lastmod list + reset") {
    val wh = new Warehouse(Files.createTempDirectory("graft-dbtool"))
    val store = new MemoryStateStore
    store.set("etag:http://a", "x"); store.set("last_modified:http://a", "y")
    val runner = new JobRunner(spark, wh, store, mkHttp(() => 200),
      new RecordingNotifier, fixedClock)
    runner.run(regionDataset.copy(urls = Seq("http://a")))
    val lines = collection.mutable.ArrayBuffer.empty[String]
    val tool = new DbTool(spark, wh, store, lines += _)
    assert(tool.rowcounts()("region") === 5L)
    // run committed etag=e1 and DELETED last_modified (fake http sends
    // none -> setOrDelete(None), lib/dbhash.py:28-32 semantics)
    assert(tool.listLastmod() === Seq("etag:http://a" -> "e1"))
    assert(tool.resetLastmod() === 1)
    assert(store.keysWithPrefix("etag:").isEmpty)
  }

  test("DbTool: user:create + user:grant_schema_read cover current AND " +
      "future tables; sql passthrough sees published tables") {
    // dbtool.py:90-92 (shell), 123-136 (grant_schema_read), 149-162
    // (create_user) — the last dbtool commands without a CLI analogue
    val wh = new Warehouse(Files.createTempDirectory("graft-dbtool-user"))
    val store = new MemoryStateStore
    val runner = new JobRunner(spark, wh, store, mkHttp(() => 200),
      new RecordingNotifier, fixedClock)
    runner.run(regionDataset)
    val lines = collection.mutable.ArrayBuffer.empty[String]
    val tool = new DbTool(spark, wh, store, lines += _)

    val password = tool.createUser("wowuser")
    assert(password.length === 16 && password.forall(_.isLetterOrDigit))
    assert(lines.head === "Creating user 'wowuser' and granting them " +
      "access to the db.")
    assert(lines(1) === s"Their password is '$password'. " +
      "Please keep this safe!")
    assert(lines(2) === "Granting user 'wowuser' read-only access to " +
      "schema 'public'.")
    assert(wh.users === Seq("wowuser"))
    // the password itself is never persisted — only its digest
    assert(!wh.tableProperties("__users").values.exists(_.contains(password)))
    intercept[IllegalArgumentException](tool.createUser("wowuser"))

    // read access to every CURRENT table...
    assert(wh.grants("region")("wowuser") === Seq("SELECT"))
    assert(wh.grants("region_counts")("wowuser") === Seq("SELECT"))
    // ...and to tables published AFTER the grant (the reference's
    // ALTER DEFAULT PRIVILEGES semantics)
    runner.run(regionDataset.copy(name = "later_ds", urls = Nil,
      sources = Nil, derived = Map("later_table" -> ((s, _) =>
        Tables.region(s, sf).select(col("r_name"))))))
    assert(wh.grants("later_table")("wowuser") === Seq("SELECT"))
    // table-level entries still take precedence over the schema grant
    wh.grant("region", "wowuser", Seq("SELECT", "INSERT"))
    assert(wh.grants("region")("wowuser") === Seq("INSERT", "SELECT"))

    // sql passthrough: one-shot statement over the published tables
    lines.clear()
    val res = tool.sql(
      "SELECT count(*) AS n FROM region JOIN region_counts USING (r_name)")
    assert(res === Seq("n", "5"))
    assert(lines === Seq("n", "5"))

    // truncation is marked, never silent: 5 rows at maxRows=3
    val cut = tool.sql("SELECT r_name FROM region", maxRows = 3)
    assert(cut.length === 5) // header + 3 rows + marker
    assert(cut.last === "... (output truncated at 3 rows)")
    // exactly-at-limit output carries no marker
    assert(!tool.sql("SELECT r_name FROM region", maxRows = 5)
      .last.startsWith("..."))
  }

  test("DbTool.dispatch: docopt surface with dataset validation, 'all' " +
      "expansion, and reference-shaped output") {
    // dbtool.py:165-183 main + :43-57 validate_and_get_dataset_names
    val wh = new Warehouse(Files.createTempDirectory("graft-dbtool-cli"))
    val store = new MemoryStateStore
    val runner = new JobRunner(spark, wh, store, mkHttp(() => 200),
      new RecordingNotifier, fixedClock)
    runner.run(regionDataset)
    val otherDs = regionDataset.copy(name = "other_ds", urls = Nil,
      sources = Nil, derived = Map("other_table" -> ((s, _) =>
        Tables.region(s, sf).select(col("r_name")))))
    runner.run(otherDs)
    val registry = Seq(regionDataset, otherDs)
    val lines = collection.mutable.ArrayBuffer.empty[String]
    val tool = new DbTool(spark, wh, store, lines += _)

    // unknown dataset -> candidates + 'all', exit 1, nothing executed
    assert(tool.dispatch(Seq("rowcounts", "nope"), registry) === 1)
    assert(lines.toSeq === Seq(
      "ERROR: nope is not a valid dataset. Please choose from:",
      "region_ds", "other_ds", "all"))

    // 'all' expands to the full registry; per-dataset framing with
    // comma-grouped counts (dbtool.py:71-72,83-87)
    lines.clear()
    assert(tool.dispatch(Seq("rowcounts", "all"), registry) === 0)
    assert(lines.contains("For region_ds's public schema:"))
    assert(lines.contains("For other_ds's public schema:"))
    assert(lines.contains("  region has 5 rows."))
    assert(lines.contains("  other_table has 5 rows."))

    // lastmod:list — stored validator vs none (dbtool.py:95-109)
    val url = regionDataset.urls.head
    store.set(UrlModTracker.lastModifiedKey(url), "Sat, 01 Jun 2024 12:00:00 GMT")
    lines.clear()
    assert(tool.dispatch(Seq("lastmod:list", "region_ds", "other_ds"),
      registry) === 0)
    assert(lines.toSeq === Seq(
      "For the dataset region_ds:",
      s"  The URL $url was last modified on Sat, 01 Jun 2024 12:00:00 GMT.",
      "For the dataset other_ds:"))

    // lastmod:reset clears BOTH validators for the dataset's urls
    lines.clear()
    assert(tool.dispatch(Seq("lastmod:reset", "region_ds"), registry) === 0)
    assert(lines.toSeq === Seq(
      "For the dataset region_ds:",
      s"Clearing last modification metadata for region_ds's URL $url."))
    assert(store.get(UrlModTracker.etagKey(url)).isEmpty)
    assert(store.get(UrlModTracker.lastModifiedKey(url)).isEmpty)

    // user:* and shell route through the same code the direct API uses
    lines.clear()
    assert(tool.dispatch(Seq("user:create", "cliuser"), registry) === 0)
    assert(wh.users.contains("cliuser"))
    assert(tool.dispatch(
      Seq("user:grant_schema_read", "cliuser", "public"), registry) === 0)
    // command failures surface as exit code 1 + ERROR line, not throws
    lines.clear()
    assert(tool.dispatch(
      Seq("user:grant_schema_read", "cliuser", "private"), registry) === 1)
    assert(lines.exists(_.startsWith("ERROR:")), lines.mkString("; "))
    assert(tool.dispatch(Seq("user:create", "cliuser"), registry) === 1)
    assert(tool.dispatch(Seq("vacuum", "notanum"), registry) === 1)
    // analysis errors from the SQL shell are exit codes too
    lines.clear()
    assert(tool.dispatch(
      Seq("shell", "SELECT * FROM no_such_table"), registry) === 1)
    assert(lines.exists(_.startsWith("ERROR:")), lines.mkString("; "))

    // `all` combined with a named dataset must not run it twice
    lines.clear()
    assert(tool.dispatch(
      Seq("lastmod:reset", "all", "region_ds"), registry) === 0)
    assert(lines.count(_ == "For the dataset region_ds:") === 1, lines)
    lines.clear()
    assert(tool.dispatch(
      Seq("shell", "SELECT count(*) AS n FROM region"), registry) === 0)
    assert(lines.toSeq === Seq("n", "5"))

    // malformed argv -> usage + exit 1 (docopt behavior)
    lines.clear()
    assert(tool.dispatch(Seq("rowcounts"), registry) === 1)
    assert(lines.head.startsWith("Usage:"))
  }

  test("dataset-published UDFs are replayed at publish time") {
    // load_dataset.py:372-376 function replay semantics
    val wh = new Warehouse(Files.createTempDirectory("graft-udf"))
    val runner = new JobRunner(spark, wh, new MemoryStateStore,
      mkHttp(() => 200), new RecordingNotifier, fixedClock)
    val ds = regionDataset.copy(name = "udf_ds", udfs = Map(
      "region_tag" -> ((s: org.apache.spark.sql.SparkSession) => {
        s.udf.register("region_tag", (n: String) => s"R:$n"); ()
      })))
    runner.run(ds)
    assert(spark.sql("SELECT region_tag('EUROPE')").head().getString(0) === "R:EUROPE")
  }

  test("injected native SQL functions work through spark.sql") {
    graft.functions.GraftExtensions.register(spark)
    val c = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D))").head().getDouble(0)
    assert(c === 1.0)
    val sh = spark.sql(
      "SELECT simhash64(array('a', 'b')), simhash64(array('a', 'b'))").head()
    assert(sh.getLong(0) === sh.getLong(1))
    val sig = spark.sql(
      "SELECT minhash_sig(array('x', 'y'), 8)").head().getSeq[Long](0)
    assert(sig.length === 8)
    intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('x'), 1 + 7)").collect()
    } // non-literal numHashes rejected... (constant-folded 8 may pass)

    // the custom AGGREGATE is SQL-callable too (top-2 smallest per key)
    val top = spark.sql(
      """SELECT k, bounded_topn(struct(v), 2) AS t
         FROM VALUES ('a', 3), ('a', 1), ('a', 2), ('b', 9) AS tbl(k, v)
         GROUP BY k ORDER BY k""").collect()
    assert(top(0).getSeq[org.apache.spark.sql.Row](1).map(_.getInt(0))
      === Seq(1, 2))
    assert(top(1).getSeq[org.apache.spark.sql.Row](1).map(_.getInt(0))
      === Seq(9))
  }

  test("Notifier escaping + hyperlink match slack.py goldens") {
    // lib/slack.py:23-35, 79-87
    assert(Notifier.escape("a<b>&c") === "a&lt;b&gt;&amp;c")
    assert(Notifier.hyperlink("x & y", "http://z") === "<http://z|x &amp; y>")
  }

  test("CreatedTables chases renames across WOW-vintage scripts") {
    // tests/test_parse_created_tables.py:11-69 shapes
    assert(CreatedTables.inSql("CREATE TABLE foo (x char(1))") === Seq("foo"))
    assert(CreatedTables.inSql(
      """create table x as select 1;
         alter table x rename to y;
         create table if not exists z (a int);""") === Seq("z", "y")
      || CreatedTables.inSql(
      """create table x as select 1;
         alter table x rename to y;
         create table if not exists z (a int);""").toSet === Set("y", "z"))
    assert(CreatedTables.inSql(
      "ALTER TABLE nope RENAME TO other") === Seq.empty) // rename of uncreated
    assert(CreatedTables.inScripts(Seq(
      "create table a (x int)",
      "create or replace table schema2.b as select * from a")) === Seq("a", "b"))
  }
}
