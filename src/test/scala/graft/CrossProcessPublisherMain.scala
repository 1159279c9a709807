package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Child-JVM half of WarehouseSpec's CROSS-PROCESS publish races.
  *
  * The reference's deployment model is one pod per dataset sharing a
  * warehouse root (`k8s_build_jobs.py:63-75`), i.e. SEPARATE
  * processes — where the per-root in-JVM monitor in
  * [[graft.catalog.Warehouse]] never engages and the `FileChannel`
  * lock is the only serializer. This main is spawned by the spec with
  * the test classpath and races `publishAtomically` against the
  * suite's JVM over a shared root, synchronized by files in a sync
  * dir: each `go-<phase>-<i>` file carries a wall-clock start millis
  * both sides spin to (same host, same clock), so the two publishes
  * genuinely overlap; outcomes land in `done-<phase>-child-<i>`.
  */
object CrossProcessPublisherMain {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, syncDir, roundsStr) = args
    val rounds = roundsStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("xproc-spark-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val wh = new graft.catalog.Warehouse(whRoot)
    val sync = Paths.get(syncDir)

    def waitForGo(name: String): Long = {
      val p = sync.resolve(name)
      val deadline = System.currentTimeMillis() + 120000L
      while (!Files.exists(p)) {
        if (System.currentTimeMillis() > deadline)
          sys.error(s"child: timed out waiting for $name")
        Thread.sleep(2)
      }
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong
    }
    def spinUntil(t: Long): Unit =
      while (System.currentTimeMillis() < t) {} // busy-wait: precise start
    // write-to-temp + ATOMIC_MOVE: a bare Files.write creates the file
    // BEFORE the payload lands, so the polling peer can read it empty
    // (observed flake) — publication must be atomic with content
    def done(name: String, payload: String): Unit = {
      val tmp = sync.resolve(s"$name.tmp")
      Files.write(tmp, payload.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, sync.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    // phase A: DIFFERENT tables — both publishes must land every round
    for (i <- 1 to rounds) {
      spinUntil(waitForGo(s"go-diff-$i"))
      val outcome = try {
        wh.publishAtomically(Map("pb" -> Seq(i).toDF("v")),
          generation = i * 10L)
        "ok"
      } catch { case e: Throwable =>
        s"err:${e.getClass.getName}:${e.getMessage}"
      }
      done(s"done-diff-child-$i", outcome)
    }
    // phase B: SAME table — exactly the reference's misconfigured
    // two-pods-one-dataset case; a loser must fail LOUDLY with
    // ConcurrentPublishException, never silently revert the winner
    for (i <- 1 to rounds) {
      spinUntil(waitForGo(s"go-same-$i"))
      val outcome = try {
        wh.publishAtomically(Map("t" -> Seq(100000 + i).toDF("v")))
        s"ok:${100000 + i}"
      } catch {
        case _: graft.catalog.ConcurrentPublishException => "race"
        case e: Throwable => s"err:${e.getClass.getName}:${e.getMessage}"
      }
      done(s"done-same-child-$i", outcome)
    }
    spark.stop()
    sys.exit(0)
  }
}
