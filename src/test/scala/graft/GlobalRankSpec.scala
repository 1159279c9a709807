package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.GlobalRank
import graft.ops.GlobalRank.Scan

/** The distributed ordered-scan kernel must be value-identical to the
  * partition-less window it replaces — rank, inclusive/exclusive
  * prefix sum, inclusive/exclusive prefix max, and exact NTILE
  * emulation — or the 13 queries that moved onto it lose their oracle
  * hash-matches.
  */
class GlobalRankSpec extends SparkSpec {

  private def sample = spark.range(0, 5000).select(col("id"),
    pmod(col("id") * 2654435761L + 13, lit(9973L)).as("key"),
    pmod(col("id") * 40503L + 7, lit(1000L)).as("v"))

  test("rank + prefix sums/maxes match the global-window reference") {
    val df = sample
    val ord = Seq(col("key"), col("id"))
    val gw = Window.orderBy(ord: _*)
    val ref = df
      .withColumn("i", row_number().over(gw).cast("long"))
      .withColumn("cs",
        sum(col("v")).over(gw.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("es", coalesce(
        sum(col("v")).over(gw.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("cm",
        max(col("v")).over(gw.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("em",
        max(col("v")).over(gw.rowsBetween(Window.unboundedPreceding, -1)))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          if (r.isNullAt(7)) null else r.getLong(7))).toMap
    val got = GlobalRank.prefixScan(df, ord, Seq(
        Scan("cs", col("v")),
        Scan("es", col("v"), inclusive = false),
        Scan("cm", col("v"), op = "max"),
        Scan("em", col("v"), op = "max", inclusive = false)),
      rankCol = Some("i"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("i")), r.getLong(r.fieldIndex("cs")),
          r.getLong(r.fieldIndex("es")), r.getLong(r.fieldIndex("cm")),
          if (r.isNullAt(r.fieldIndex("em"))) null
          else r.getLong(r.fieldIndex("em")))).toMap
    assert(got.size === ref.size)
    // both tuples are (i, cs, es, cm, em); ref columns are
    // (id, key, v, i, cs, es, cm, em)
    ref.foreach { case (id, exp) =>
      assert(got(id)._1 === exp._1, s"rank mismatch at $id")
      assert(got(id)._2 === exp._2, s"cs mismatch at $id")
      assert(got(id)._3 === exp._3, s"es mismatch at $id")
      assert(got(id)._4 === exp._4, s"cm mismatch at $id")
      assert(got(id)._5 === exp._5, s"em mismatch at $id")
    }
  }

  test("descending sort expressions rank identically to the window") {
    val df = sample
    val ord = Seq(col("v").desc, col("id"))
    val ref = df.withColumn("i",
        row_number().over(Window.orderBy(ord: _*)).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val got = GlobalRank
      .prefixScan(df, ord, Nil, rankCol = Some("i"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === ref)
  }

  test("results are invariant to the shuffle-partition count (the " +
      "base-offset seam moves; the values must not)") {
    val df = sample
    val ord = Seq(col("key"), col("id"))
    def run(): Set[(Long, Long, Long)] =
      GlobalRank.prefixScan(df, ord,
          Seq(Scan("cs", col("v"))), rankCol = Some("i"))
        .select(col("id"), col("i"), col("cs"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val conf = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(conf)
    val base = run()
    try {
      spark.conf.set(conf, "3")
      assert(run() === base, "3-partition layout changed the scan")
      spark.conf.set(conf, "64")
      assert(run() === base, "64-partition layout changed the scan")
    } finally spark.conf.set(conf, old)
  }

  test("ntileFromRank is bit-identical to ntile() for awkward (n, k)") {
    for (n <- Seq(1, 3, 9, 10, 11, 12, 100, 1037); k <- Seq(3, 4, 7, 10, 32)) {
      val df = spark.range(0, n.toLong).toDF("id")
      val ref = df.withColumn("b",
          ntile(k).over(Window.orderBy(col("id"))))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = df
        .withColumn("i", col("id") + 1)
        .withColumn("b",
          GlobalRank.ntileFromRank(col("i"), lit(n.toLong), k))
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(got === ref, s"n=$n k=$k")
    }
  }
}
