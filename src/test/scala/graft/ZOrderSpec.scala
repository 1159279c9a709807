package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.functions.{ZOrderFunctions, ZOrderUtil}

/** Z-order layout keys: bit-level correctness, order preservation per
  * dimension, codegen==interpreted, SQL surface, and the actual
  * payoff — parquet row-group skipping on the SECOND dimension.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  test("interleave: known bit patterns") {
    // x=0b01, y=0b10 (sign bits flipped to 0x80000001 / 0x80000002):
    // MSB-first round robin x,y => bits 11 00 ... 01 10
    val k = ZOrderUtil.interleave(Array(1, 2))
    assert(k.length === 8)
    assert((k(0) & 0xff) === 0xc0) // both flipped sign bits lead
    assert((k(7) & 0xff) === 0x06) // ...x1=01,y1=10 interleave to 0110
    // identical inputs give identical keys
    assert(java.util.Arrays.equals(
      ZOrderUtil.interleave(Array(7, -3)), ZOrderUtil.interleave(Array(7, -3))))
  }

  test("monotonic in each dimension with the other fixed, incl. negatives") {
    val xs = Seq(-100, -1, 0, 1, 99)
    for (fixed <- xs) {
      val keysByX = xs.map(x => ZOrderUtil.interleave(Array(x, fixed)))
      keysByX.sliding(2).foreach { case Seq(a, b) =>
        assert(unsignedLess(a, b), "x dimension")
      }
      val keysByY = xs.map(y => ZOrderUtil.interleave(Array(fixed, y)))
      keysByY.sliding(2).foreach { case Seq(a, b) =>
        assert(unsignedLess(a, b), "y dimension")
      }
    }
  }

  test("locality: quadrant-leading bits group nearby points") {
    // points in the same small tile share a long key prefix; points in
    // different macro-quadrants differ in the leading byte region
    val inTile = ZOrderUtil.interleave(Array(3, 5))
    val sameTile = ZOrderUtil.interleave(Array(2, 4))
    val farAway = ZOrderUtil.interleave(Array(1 << 20, 1 << 20))
    def commonPrefixBytes(a: Array[Byte], b: Array[Byte]): Int =
      a.zip(b).takeWhile { case (x, y) => x == y }.length
    assert(commonPrefixBytes(inTile, sameTile) >
      commonPrefixBytes(inTile, farAway))
  }

  test("expression: codegen equals interpreted equals util") {
    val df = Seq((1, 10), (-5, 3), (1000, -1000), (0, 0)).toDF("x", "y")
    val got = df.select(ZOrderFunctions.zorder_key(col("x"), col("y")))
      .as[Array[Byte]].collect()
    val want = Seq((1, 10), (-5, 3), (1000, -1000), (0, 0))
      .map { case (x, y) => ZOrderUtil.interleave(Array(x, y)) }
    got.zip(want).foreach { case (g, w) =>
      assert(java.util.Arrays.equals(g, w))
    }
    // nulls propagate
    val n = Seq((Some(1), None: Option[Int])).toDF("x", "y")
      .select(ZOrderFunctions.zorder_key(col("x"), col("y"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("zorder_i64 order matches the byte key's unsigned order") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(300)((rnd.nextInt(), rnd.nextInt()))
    val byLong = pts.sortBy { case (x, y) => ZOrderUtil.interleave2(x, y) }
    val byBytes = pts.sortWith { case (a, b) =>
      unsignedLess(ZOrderUtil.interleave(Array(a._1, a._2)),
        ZOrderUtil.interleave(Array(b._1, b._2)))
    }
    assert(byLong === byBytes)
  }

  test("SQL surface: zorder_key is callable and variadic-checked") {
    graft.functions.GraftExtensions.register(spark)
    Seq((1, 2, 3)).toDF("a", "b", "c").createOrReplaceTempView("zin")
    val k3 = spark.sql("SELECT zorder_key(a, b, c) AS k FROM zin")
      .as[Array[Byte]].head()
    assert(k3.length === 12)
    val err = intercept[Exception] {
      spark.sql("SELECT zorder_key(a) FROM zin").collect()
    }
    assert(err.getMessage.toLowerCase.contains("2..8") ||
      err.getMessage.toLowerCase.contains("zorder_key"))
  }

  /** The payoff test: same data, same files-per-layout, same
    * SECONDARY-dimension query (filter on y only). The x-sorted layout
    * cannot skip anything — every row group spans all y — while the
    * z-ordered layout's row-group stats are tight on BOTH dimensions.
    * (A primary-dimension filter prunes both layouts equally; the
    * second dimension is where a single-column sort dies.) Scan
    * numOutputRows counts rows the reader actually decoded, post
    * row-group pruning, pre residual filter.
    */
  test("z-ordered layout skips row groups on the second dimension") {
    val n = 1 << 16
    val grid = spark.range(n.toLong).select(
      (col("id") % 256).cast("int").as("x"),
      (col("id") / 256).cast("int").as("y"))

    def writeSorted(df: DataFrame, path: String, key: org.apache.spark.sql.Column): Unit =
      df.repartitionByRange(64, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)

    val zPath = "/tmp/graft_zorder_z"
    val xPath = "/tmp/graft_zorder_x"
    writeSorted(grid, zPath, ZOrderFunctions.zorder_key(col("x"), col("y")))
    writeSorted(grid, xPath, col("x"))

    def scannedRows(path: String): Long = {
      val q = spark.read.parquet(path).filter(col("y").between(10, 20))
      // collect() drives THIS queryExecution, so its scan metrics
      // populate (count() would plan + execute a separate query)
      assert(q.collect().length === 11 * 256) // correctness first
      val scan = q.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s
      }.get
      scan.metrics("numOutputRows").value
    }

    val zScanned = scannedRows(zPath)
    val xScanned = scannedRows(xPath)
    // x-sorted: the y filter skips nothing; z-ordered: only the files
    // whose z-tiles intersect the y band are decoded
    assert(xScanned === n.toLong, s"x-sort expected full scan, got $xScanned")
    assert(zScanned < xScanned / 4,
      s"z-order scanned $zScanned rows vs x-sort $xScanned")
  }
}
