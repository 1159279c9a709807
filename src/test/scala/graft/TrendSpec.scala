package graft

import org.apache.spark.sql.functions._

import graft.queries.Trend

/** Batch-three round-11 operators: Theil-Sen robustness on a planted
  * outlier series, seasonal-residual algebra, and LPA convergence on
  * hand-built graphs.
  */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(dir: String,
      rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def t(day: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("theil1: a planted outlier day cannot drag the median slope") {
    val dir = java.nio.file.Files.createTempDirectory("theil1").toString
    // y = 10 + 2*t for 9 days, except day 5 spikes to 1000: OLS slope
    // would blow past 2; Theil-Sen stays at exactly 2.
    val rows = (1 to 9).map { day =>
      val v = if (day == 5) 1000.0 else 10.0 + 2.0 * day
      (day.toLong, t(day), 1L, "purchase", v, "{}")
    }
    writeEvents(dir, rows)
    val r = Trend.theil1TheilSen(spark, dir).collect()(0)
    assert(r.getLong(0) == 9 && r.getLong(1) == 36)
    assert(math.abs(r.getAs[Double]("slope_med6") - 2.0) < 1e-9)
  }

  test("theil1: median slope is between min and max pairwise slopes (real corpus)") {
    val r = Trend.theil1TheilSen(spark, sf).collect()(0)
    val nD = r.getLong(0)
    assert(r.getLong(1) == nD * (nD - 1) / 2)
  }

  test("sea1: residuals sum to ~0 within weekdays; anomaly gate is 2 sigma") {
    val out = Trend.sea1SeasonalAnomaly(spark, sf).collect()
    val byDow = out.groupBy(_.getInt(1))
    byDow.foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getAs[Double]("resid6")).sum) < 1e-3)
    }
    val rs = out.map(_.getAs[Double]("resid6"))
    val n = rs.length
    val sd = math.sqrt(rs.map(r => r * r).sum / (n - 1) -
      math.pow(rs.sum, 2) / n / (n - 1))
    out.foreach { r =>
      val flagged = r.getInt(5) == 1
      assert(flagged == (math.abs(r.getAs[Double]("resid6")) > 2 * sd +
        1e-9) || math.abs(math.abs(r.getAs[Double]("resid6")) - 2 * sd) < 1e-6)
    }
  }

  test("lp1: two planted cliques joined by one weak edge stay two communities") {
    val dir = java.nio.file.Files.createTempDirectory("lp1").toString
    // baskets: clique {1,2,3} bought together twice, clique {7,8,9}
    // twice; co-purchase threshold (n_ab >= 2) keeps only the cliques.
    val li = Seq(
      (101L, 1L), (101L, 2L), (101L, 3L),
      (102L, 1L), (102L, 2L), (102L, 3L),
      (103L, 7L), (103L, 8L), (103L, 9L),
      (104L, 7L), (104L, 8L), (104L, 9L),
      (105L, 3L), (105L, 7L))
    li.map { case (ok, pk) =>
        (ok, pk, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t(1)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Trend.lp1LabelProp(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 7L, 8L, 9L))
    assert(Set(out(1L), out(2L), out(3L)).size == 1)
    assert(Set(out(7L), out(8L), out(9L)).size == 1)
    assert(out(1L) != out(7L))
  }

  test("lp1: every labeled node is a graph node; labels are node ids") {
    val out = Trend.lp1LabelProp(spark, sf).collect()
    val nodes = out.map(_.getLong(0)).toSet
    assert(out.map(_.getLong(1)).toSet.subsetOf(nodes))
    assert(out.length == nodes.size)
  }
}
