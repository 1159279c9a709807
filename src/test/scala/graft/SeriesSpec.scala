package graft

import org.apache.spark.sql.functions._

import graft.queries.Series

/** Batch-four round-11 operators: island reconstruction on planted
  * runs, growth-curve conservation, ABC partition laws, the rolling-
  * distinct rewrite vs a driver replay, backtest algebra, and
  * checksum order-independence.
  */
class SeriesSpec extends SparkSpec {
  import spark.implicits._

  private def t(day: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("isl1: planted runs come back as exact islands") {
    val dir = java.nio.file.Files.createTempDirectory("isl1").toString
    // cust 1: days 1,2,3 then 7,8; cust 2: day 4 only
    val rows = Seq((1L, 1), (1L, 2), (1L, 3), (1L, 7), (1L, 8), (2L, 4))
      .zipWithIndex.map { case ((ck, day), i) =>
        (i.toLong, ck, "O", 1.0, t(day), "1-URGENT") }
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Series.isl1GapsIslands(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString,
        r.getDate(2).toString, r.getLong(3))).toSet
    assert(out == Set(
      (1L, "2024-01-01", "2024-01-03", 3L),
      (1L, "2024-01-07", "2024-01-08", 2L),
      (2L, "2024-01-04", "2024-01-04", 1L)))
  }

  test("cum1: final cumulative count equals total distinct users; monotone") {
    val out = Series.cum1CumulativeUniques(spark, sf).collect()
      .sortBy(_.getDate(0).getTime)
    val total = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(out.map(_.getLong(1)).sum == total)
    assert(out.last.getLong(2) == total)
    assert(out.map(_.getLong(2)).zip(out.map(_.getLong(2)).tail)
      .forall { case (a, b) => b > a })
  }

  test("abc1: classes partition parts; shares monotone along the ranking") {
    val out = Series.abc1ParetoClass(spark, sf).collect()
    val nParts = Tables.lineitem(spark, sf)
      .select(col("l_partkey")).distinct().count()
    assert(out.length == nParts)
    val sorted = out.sortBy(_.getAs[Double]("cum_share6"))
    assert(math.abs(sorted.last.getAs[Double]("cum_share6") - 1.0) < 1e-6)
    // class boundaries respect the cumulative share
    sorted.foreach { r =>
      val s = r.getAs[Double]("cum_share6"); val c = r.getString(3)
      if (s <= 0.799999) assert(c == "A")
      if (s > 0.950001) assert(c == "C")
    }
  }

  test("rol1: rolling 7-day distinct matches a driver-side replay") {
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = ud.map(_._2).distinct.sorted(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
    val expect = days.map { d =>
      d -> ud.filter(x => !x._2.isAfter(d) &&
        x._2.isAfter(d.minusDays(7))).map(_._1).distinct.size.toLong
    }.toMap
    val got = Series.rol1RollingDistinct(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    assert(got.size == days.size)
    days.foreach { d => assert(got(d) == expect(d), s"day $d") }
  }

  test("fc1: APE is |actual-forecast|/actual; scores every held-out day") {
    val out = Series.fc1SeasonalBacktest(spark, sf).collect()
    val held = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(to_date(col("ts")).as("day")).distinct()
      .filter(col("day") >= lit("2024-01-25").cast("date")).count()
    assert(out.length == held && held >= 5)
    out.foreach(r => assert(r.getDate(0).toString >= "2024-01-25"))
    out.foreach { r =>
      val (a, f, ape) = (r.getAs[Double]("actual2"),
        r.getAs[Double]("forecast6"), r.getAs[Double]("ape6"))
      assert(math.abs(ape - math.abs(a - f) / a) < 1e-4)
      assert(f > 0.0)
    }
  }

  test("chk1: checksum is order-independent and change-sensitive") {
    val dir = java.nio.file.Files.createTempDirectory("chk1").toString
    val dir2 = java.nio.file.Files.createTempDirectory("chk1b").toString
    def write(d: String, rows: Seq[(Long, Long, String, Double, java.sql.Timestamp, String)]) = {
      rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .repartition(3)
        .write.mode("overwrite").parquet(s"$d/orders.parquet")
      Seq((1L, "c", 1, 1.0, "S")).toDF("c_custkey", "c_name",
          "c_nationkey", "c_acctbal", "c_mktsegment")
        .write.mode("overwrite").parquet(s"$d/customer.parquet")
      Seq((1L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t(1)))
        .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus", "l_shipdate")
        .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    }
    val base = Seq(
      (1L, 10L, "O", 12.34, t(1), "1-URGENT"),
      (2L, 11L, "F", 56.78, t(2), "2-HIGH"),
      (3L, 12L, "O", 90.12, t(3), "3-MEDIUM"))
    write(dir, base)
    write(dir2, base.reverse.map(r => r.copy(_4 = if (r._1 == 2L) 56.79 else r._4)))
    def sums(d: String) = Series.chk1RowChecksum(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val (s1, s2) = (sums(dir), sums(dir2))
    // row order / partitioning don't matter; a one-cent change does
    assert(s1("customer") == s2("customer"))
    assert(s1("lineitem") == s2("lineitem"))
    assert(s1("orders") != s2("orders"))
  }

  test("chk1: real-corpus row counts match the tables") {
    val out = Series.chk1RowChecksum(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("orders") == Tables.orders(spark, sf).count())
    assert(out("customer") == Tables.customer(spark, sf).count())
    assert(out("lineitem") == Tables.lineitem(spark, sf).count())
  }
}
