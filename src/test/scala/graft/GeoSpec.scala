package graft

import org.apache.spark.sql.functions._

import graft.queries.Geo

/** Geo grid batch: the cell-candidate radius join must equal the
  * naive quadratic join (grid loses nothing on its domain) WITHOUT a
  * cross/nested-loop join in the plan; kernel density cross-checked
  * against a driver-side 3x3 sum.
  */
class GeoSpec extends SparkSpec {

  private def pts = graft.queries.Geo.points(spark, sf)

  test("geo1: grid candidates find exactly the naive quadratic " +
      "haversine pairs") {
    val got = Geo.geo1RadiusPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = pts.select(col("id").as("id_a"), col("lat").as("lat_a"),
      col("lon").as("lon_a"))
    val b = pts.select(col("id").as("id_b"), col("lat").as("lat_b"),
      col("lon").as("lon_b"))
    val naive = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(Geo.haversineKm(col("lat_a"), col("lon_a"),
        col("lat_b"), col("lon_b")) <= 300.0)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive, s"grid ${got.size} vs naive ${naive.size}")
    assert(naive.nonEmpty, "degenerate fixture: no pairs in radius")
  }

  test("geo1: no cartesian/nested-loop join in the physical plan") {
    val plan = Geo.geo1RadiusPairs(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("geo2: kernel_n is the 3x3 neighborhood sum and >= own n") {
    val rows = Geo.geo2KernelDensity(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3))))
    val byCell = rows.map { case (c, (n, _)) => c -> n }.toMap
    rows.foreach { case ((cy, cx), (n, kn)) =>
      assert(kn >= n)
      val want = (for { dy <- -1 to 1; dx <- -1 to 1 }
        yield byCell.getOrElse((cy + dy, cx + dx), 0L)).sum
      assert(kn == want, s"cell ($cy,$cx): kernel $kn != $want")
    }
  }
}
