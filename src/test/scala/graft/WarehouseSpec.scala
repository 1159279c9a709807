package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.catalog.Warehouse

/** Atomic-publish semantics — mirrors the reference's temp-schema swap
  * guarantees (`load_dataset.py:209-252`) and the idempotency golden
  * check (`tests/test_load_dataset.py:78-84`: re-run => identical
  * rowcounts).
  */
@graft.tags.Slow
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def freshWh() =
    new Warehouse(Files.createTempDirectory("graft-wh"))

  test("publish then read back; rowcounts probe") {
    val wh = freshWh()
    wh.publishAtomically(Map(
      "t1" -> Seq(1, 2, 3).toDF("x"),
      "t2" -> Seq("a").toDF("s")), generation = 1L)
    assert(wh.tableNames === Seq("t1", "t2"))
    assert(wh.table(spark, "t1").as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
    assert(wh.rowcounts(spark) === Map("t1" -> 3L, "t2" -> 1L))
  }

  test("publish is idempotent: re-publish yields identical rowcounts") {
    val wh = freshWh()
    val tables = Map("t" -> Seq(1, 2).toDF("x"))
    wh.publishAtomically(tables, generation = 1L)
    val first = wh.rowcounts(spark)
    wh.publishAtomically(tables, generation = 2L)
    assert(wh.rowcounts(spark) === first)
  }

  test("failed staging rolls back: manifest untouched, staged data removed") {
    val wh = freshWh()
    wh.publishAtomically(Map("good" -> Seq(1).toDF("x")), generation = 1L)
    val before = wh.manifest
    val boom = udf((i: Int) => {
      if (i >= 0) throw new RuntimeException("boom"); i
    })
    intercept[Exception] {
      wh.publishAtomically(Map(
        "good" -> Seq(9).toDF("x"),
        "bad" -> Seq(1).toDF("x").select(boom(col("x")).as("x"))),
        generation = 2L)
    }
    assert(wh.manifest === before) // readers still see generation 1
    assert(wh.table(spark, "good").as[Int].head() === 1)
    assert(!wh.tableExists("bad"))
    // rollback also removes the partial dir of the table that FAILED
    // mid-write, not just previously completed ones
    val gen2Dirs = java.nio.file.Files.list(wh.root.resolve("data"))
    try assert(!gen2Dirs.iterator().asScala.exists(_.getFileName.toString.endsWith("__2")))
    finally gen2Dirs.close()
  }

  test("upsertInto merges a delta as a new atomic generation") {
    val wh = freshWh()
    wh.publishAtomically(Map(
      "t" -> Seq((1L, "a"), (2L, "b")).toDF("id", "v")), generation = 1L)
    wh.upsertInto(spark, "t",
      Seq((2L, "B2"), (3L, "c")).toDF("id", "v"), Seq("id"))
    val out = wh.table(spark, "t").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "a", 2L -> "B2", 3L -> "c"))
    // the old generation is a distinct directory until vacuum
    assert(wh.vacuum().nonEmpty)
  }

  test("readers on the old generation survive a new publish until vacuum") {
    val wh = freshWh()
    wh.publishAtomically(Map("t" -> Seq(1).toDF("x")), generation = 1L)
    val oldDf = wh.table(spark, "t")
    wh.publishAtomically(Map("t" -> Seq(2).toDF("x")), generation = 2L)
    assert(oldDf.as[Int].head() === 1) // snapshot isolation
    assert(wh.table(spark, "t").as[Int].head() === 2)
    val dropped = wh.vacuum()
    assert(dropped === Seq("t__1"))
  }

  test("deleteWhere publishes the filtered table atomically; old " +
      "generation stays time-travel readable; NULL predicates keep rows") {
    val wh = freshWh()
    wh.publishAtomically(
      Map("t" -> Seq(Some(1), Some(2), Some(3), Some(4), None).toDF("x")),
      generation = 1L)
    wh.deleteWhere(spark, "t", col("x") % 2 === 0)
    // x=2, x=4 removed; the NULL row is NOT selected by the predicate
    // (cond evaluates NULL) and must survive, per SQL DELETE semantics
    assert(wh.table(spark, "t").as[Option[Int]].collect().toSet
      === Set(Some(1), Some(3), None))
    val before = wh.snapshots.head
    assert(wh.tableAt(spark, "t", before).count() === 5)
  }

  test("regression: same requested generation for DISJOINT table sets " +
      "still yields distinct snapshot entries (no history truncation)") {
    val wh = freshWh()
    wh.publishAtomically(Map("a" -> Seq(1).toDF("x")), generation = 7L)
    wh.publishAtomically(Map("b" -> Seq(2).toDF("x")), generation = 7L)
    assert(wh.snapshots.size === 2)
    val Seq(s1, s2) = wh.snapshots
    assert(wh.manifestAt(s1).keySet === Set("a"))
    assert(wh.manifestAt(s2).keySet === Set("a", "b"))
  }

  test("time travel: snapshot log reads past generations; vacuum " +
      "retention governs their lifetime") {
    val wh = freshWh()
    wh.publishAtomically(Map("t" -> Seq(1).toDF("x")), generation = 1L)
    wh.publishAtomically(Map("t" -> Seq(2).toDF("x"),
      "u" -> Seq("new").toDF("s")), generation = 2L)
    wh.publishAtomically(Map("t" -> Seq(3).toDF("x")), generation = 3L)
    assert(wh.snapshots === Seq(1L, 2L, 3L))
    // read every vintage of t; u only exists from snapshot 2 on
    assert(wh.tableAt(spark, "t", 1L).as[Int].head() === 1)
    assert(wh.tableAt(spark, "t", 2L).as[Int].head() === 2)
    assert(wh.table(spark, "t").as[Int].head() === 3)
    intercept[NoSuchElementException](wh.tableAt(spark, "u", 1L))
    // retain 2 snapshots: gen-1 data goes, gen-2 stays readable
    val dropped = wh.vacuum(retainSnapshots = 2)
    assert(dropped === Seq("t__1"))
    assert(wh.snapshots === Seq(2L, 3L))
    assert(wh.tableAt(spark, "t", 2L).as[Int].head() === 2)
    // full vacuum: only live data remains, history expired
    wh.vacuum()
    assert(wh.snapshots.isEmpty)
    assert(wh.table(spark, "t").as[Int].head() === 3)
  }

  test("properties and grants survive an atomic republish (reference " +
      "save_and_reapply_permissions invariant)") {
    val wh = freshWh()
    wh.publishAtomically(Map("bldgs" -> Seq(1).toDF("x")), generation = 1L)
    wh.setTableProperties("bldgs",
      Map("comment" -> "who owns what", "owner" -> "graft"))
    wh.grant("bldgs", "wowuser", Seq("select"))
    wh.grant("bldgs", "loader", Seq("INSERT", "SELECT"))
    // republish twice, then vacuum — the metadata binding must outlive
    // every data generation
    wh.publishAtomically(Map("bldgs" -> Seq(2).toDF("x")), generation = 2L)
    wh.upsertInto(spark, "bldgs", Seq(3).toDF("x"), Seq("x"))
    wh.vacuum()
    assert(wh.tableProperties("bldgs")("comment") === "who owns what")
    assert(wh.tableProperties("bldgs")("owner") === "graft")
    assert(wh.grants("bldgs") === Map(
      "wowuser" -> Seq("SELECT"), "loader" -> Seq("INSERT", "SELECT")))
    // revoke + unset are persisted too
    wh.revoke("bldgs", "loader")
    wh.unsetTableProperties("bldgs", Seq("owner"))
    assert(wh.grants("bldgs") === Map("wowuser" -> Seq("SELECT")))
    assert(!wh.tableProperties("bldgs").contains("owner"))
    // a different Warehouse instance over the same root sees the same
    // metadata (it is on-disk state, not instance state)
    val reopened = new Warehouse(wh.root)
    assert(reopened.grants("bldgs") === Map("wowuser" -> Seq("SELECT")))
  }

  test("table-level revoke masks a schema-wide grant; revokeSchemaRead " +
      "undoes grant_schema_read everywhere") {
    val wh = freshWh()
    wh.publishAtomically(Map(
      "open_t" -> Seq(1).toDF("x"), "secret_t" -> Seq(2).toDF("x")),
      generation = 1L)
    wh.grantSchemaRead("reader")
    assert(wh.grants("open_t")("reader") === Seq("SELECT"))
    assert(wh.grants("secret_t")("reader") === Seq("SELECT"))
    // revoking ONE table must actually remove access there (the naive
    // unset would fall through to the schema entry) and leave the rest
    wh.revoke("secret_t", "reader")
    assert(!wh.grants("secret_t").contains("reader"), wh.grants("secret_t"))
    assert(wh.grants("open_t")("reader") === Seq("SELECT"))
    // the mask persists across reopen like every other property
    assert(!new Warehouse(wh.root).grants("secret_t").contains("reader"))
    // re-granting at table level overrides the mask again
    wh.grant("secret_t", "reader", Seq("SELECT"))
    assert(wh.grants("secret_t")("reader") === Seq("SELECT"))
    // schema-level revoke removes the fold-in for every other table
    wh.revokeSchemaRead("reader")
    assert(!wh.grants("open_t").contains("reader"))
    // ...but an explicit table-level grant is independent and survives
    assert(wh.grants("secret_t")("reader") === Seq("SELECT"))
  }

  test("property store rejects table names that would escape the " +
      "properties dir") {
    val wh = new Warehouse(
      java.nio.file.Files.createTempDirectory("graft-wh-names"))
    for (bad <- Seq("../evil", "a/b", "", "a\\b", "x.json")) {
      val e = intercept[IllegalArgumentException](
        wh.setTableProperties(bad, Map("k" -> "v")))
      assert(e.getMessage.contains("invalid table name"), s"name=$bad")
    }
    // plain names still work
    wh.setTableProperties("ok_name-1", Map("k" -> "v"))
    assert(wh.tableProperties("ok_name-1") === Map("k" -> "v"))
  }

  test("concurrent publishes of DIFFERENT tables never corrupt the " +
      "manifest: 100 barrier-raced iterations, both bindings always " +
      "land") {
    val wh = freshWh()
    // the reference runs one pod per dataset against a shared store
    // (k8s_build_jobs.py:63-75) — two dataset jobs publishing
    // different tables concurrently is its NORMAL mode, not an edge
    // case. Each iteration races two threads through a barrier; both
    // publishes must survive (no lost update from the read-merge-flip
    // window) and the manifest must always parse.
    for (i <- 1 to 100) {
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = Seq("ta", "tb").map { t =>
        val th = new Thread(() => {
          try {
            barrier.await()
            wh.publishAtomically(Map(t -> Seq(i).toDF("v")),
              generation = i * 10L)
          } catch { case e: Throwable => errs.add(e) }
        })
        th.start(); th
      }
      threads.foreach(_.join())
      assert(errs.isEmpty, s"iteration $i: ${errs.asScala.toList}")
      // BOTH publishes visible — the lost-update failure mode would
      // leave one table bound to iteration i-1's generation
      assert(wh.table(spark, "ta").as[Int].head() === i, s"iteration $i")
      assert(wh.table(spark, "tb").as[Int].head() === i, s"iteration $i")
    }
    // every snapshot entry parses (no truncated/overwritten history)
    wh.snapshots.foreach(g => assert(wh.manifestAt(g).nonEmpty))
    assert(wh.snapshots.size === 200)
  }

  test("same-table racers serialize: one wins, the loser fails " +
      "loudly with ConcurrentPublishException and rolls back") {
    val wh = freshWh()
    wh.publishAtomically(Map("t" -> Seq(0).toDF("v")), generation = 1L)
    var wins, losses = 0
    for (i <- 1 to 100) {
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Int]]
      val threads = Seq(1000 + i, 2000 + i).map { v =>
        val th = new Thread(() => {
          try {
            barrier.await()
            wh.publishAtomically(Map("t" -> Seq(v).toDF("v")))
            outcomes.add(Right(v))
          } catch { case e: Throwable => outcomes.add(Left(e)) }
        })
        th.start(); th
      }
      threads.foreach(_.join())
      val (failed, ok) = outcomes.asScala.toList.partition(_.isLeft)
      // at least one publish always wins; a loser may only fail with
      // the loud race signal, never anything else — and the live
      // table must hold a WINNER's value
      assert(ok.nonEmpty, s"iteration $i: both racers failed: $failed")
      failed.foreach {
        case Left(e) =>
          assert(e.isInstanceOf[graft.catalog.ConcurrentPublishException],
            s"iteration $i: unexpected failure $e")
        case _ => ()
      }
      val live = wh.table(spark, "t").as[Int].head()
      assert(ok.collect { case Right(v) => v }.contains(live),
        s"iteration $i: live value $live not among winners $ok")
      wins += ok.size; losses += failed.size
    }
    // rollback hygiene: no unreferenced generation dirs survive a
    // lost race (live manifest + snapshot history cover every dir)
    val referenced = (wh.manifest.values ++
      wh.snapshots.flatMap(g => wh.manifestAt(g).values)).toSet
    val dirs = java.nio.file.Files.list(wh.root.resolve("data"))
    try dirs.iterator().asScala.foreach { p =>
      assert(referenced.contains(s"data/${p.getFileName}"),
        s"orphaned generation dir: ${p.getFileName}")
    } finally dirs.close()
    System.err.println(
      s"[race] same-table: $wins wins, $losses loud losses over 100 rounds")
  }

  test("CROSS-PROCESS publish races: a forked JVM racing " +
      "publishAtomically over the same root — different-table rounds " +
      "both land, same-table rounds have one winner and loud losers") {
    // the in-JVM races above never contend the FileChannel lock (the
    // per-root monitor serializes first); the reference's actual
    // deployment is one pod per dataset — SEPARATE JVMs — so this is
    // the path production exercises. 20+20 rounds against a child
    // process, wall-clock-synchronized starts for genuine overlap.
    val wh = freshWh()
    val sync = Files.createTempDirectory("graft-xproc-sync")
    val rounds = 20
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ opens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"),
      "graft.CrossProcessPublisherMain",
      wh.root.toString, sync.toString, rounds.toString)).asJava
    val proc = new ProcessBuilder(cmd).redirectErrorStream(true).start()
    // drain child output on a daemon thread (a full pipe would block
    // the child); keep the tail for failure diagnostics
    val childLog = new java.lang.StringBuilder
    val drainer = new Thread(() => {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      var line = r.readLine()
      while (line != null) {
        childLog.synchronized {
          childLog.append(line).append('\n')
          if (childLog.length > 8000)
            childLog.delete(0, childLog.length - 8000)
        }
        line = r.readLine()
      }
    })
    drainer.setDaemon(true); drainer.start()
    def childTail = childLog.synchronized(childLog.toString)
    def waitForDone(name: String): String = {
      val p = sync.resolve(name)
      val deadline = System.currentTimeMillis() + 120000L
      while (!Files.exists(p)) {
        assert(proc.isAlive, s"child JVM died before $name; tail:\n$childTail")
        assert(System.currentTimeMillis() < deadline,
          s"timed out waiting for $name; tail:\n$childTail")
        Thread.sleep(2)
      }
      new String(Files.readAllBytes(p)).trim
    }
    def go(name: String): Unit = {
      val start = System.currentTimeMillis() + 250
      // temp + ATOMIC_MOVE: the child polls on existence, and a bare
      // write would let it read the file empty between create and
      // content (observed flake on the done files)
      val tmp = sync.resolve(s"$name.tmp")
      Files.write(tmp, start.toString.getBytes)
      Files.move(tmp, sync.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      while (System.currentTimeMillis() < start) {} // same spin as child
    }
    try {
      // phase A: different tables, colliding requested generations
      for (i <- 1 to rounds) {
        go(s"go-diff-$i")
        wh.publishAtomically(Map("pa" -> Seq(i).toDF("v")),
          generation = i * 10L)
        assert(waitForDone(s"done-diff-child-$i") === "ok",
          s"round $i: child publish failed; tail:\n$childTail")
        assert(wh.table(spark, "pa").as[Int].head() === i, s"round $i")
        assert(wh.table(spark, "pb").as[Int].head() === i, s"round $i")
      }
      // phase B: same table
      wh.publishAtomically(Map("t" -> Seq(0).toDF("v")))
      var wins, losses = 0
      for (i <- 1 to rounds) {
        go(s"go-same-$i")
        val mine: Option[Int] =
          try { wh.publishAtomically(Map("t" -> Seq(i).toDF("v"))); Some(i) }
          catch { case _: graft.catalog.ConcurrentPublishException => None }
        val theirs = waitForDone(s"done-same-child-$i")
        assert(theirs == "race" || theirs.startsWith("ok:"),
          s"round $i: child failed un-loudly: $theirs; tail:\n$childTail")
        val winners = mine.toSeq ++
          (if (theirs.startsWith("ok:")) Seq(theirs.drop(3).toInt) else Nil)
        assert(winners.nonEmpty, s"round $i: both racers lost")
        val live = wh.table(spark, "t").as[Int].head()
        assert(winners.contains(live),
          s"round $i: live value $live not among winners $winners")
        wins += winners.size
        losses += 2 - winners.size
      }
      System.err.println(s"[race] cross-process same-table: $wins wins, " +
        s"$losses loud losses over $rounds rounds")
      // rollback hygiene across BOTH processes: every surviving
      // generation dir is referenced by the live manifest or a snapshot
      val referenced = (wh.manifest.values ++
        wh.snapshots.flatMap(g => wh.manifestAt(g).values)).toSet
      val dirs = Files.list(wh.root.resolve("data"))
      try dirs.iterator().asScala.foreach { p =>
        assert(referenced.contains(s"data/${p.getFileName}"),
          s"orphaned generation dir: ${p.getFileName}")
      } finally dirs.close()
      assert(proc.waitFor(60, java.util.concurrent.TimeUnit.SECONDS) &&
        proc.exitValue() === 0,
        s"child exit ${if (proc.isAlive) "hung" else proc.exitValue().toString}; " +
          s"tail:\n$childTail")
    } finally {
      proc.destroyForcibly()
    }
  }
}
