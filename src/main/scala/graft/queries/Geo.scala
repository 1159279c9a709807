package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-12 batch three: geospatial grid operators — radius self-join
  * via grid-cell candidate generation (the spatial analogue of the
  * dedup band joins: a bounded equi-join replaces the quadratic
  * cross join) and 3x3 neighborhood kernel density.
  *
  * Coordinates are a deterministic md5-derived projection of
  * `c_custkey` (the Advanced.scala hex-digit idiom — md5 is the one
  * hash both engines share; a LINEAR portable hash like knuth cannot
  * work here, two linear coordinates of the same key form a 1-D
  * lattice with zero near-collisions): lat in [-60, 60), lon in
  * [-177, 177), so the domain never touches the poles or the
  * antimeridian and the grid's 300 km coverage proof holds
  * everywhere (300 km <= 2.7 deg lat < 3 deg cells; <= 5.4 deg lon
  * at 60 deg < 6 deg cells; wrap pairs at +-177 are > 5.4 deg
  * effective, hence > 300 km).
  *
  * Scale notes: geo1 shuffles only (cell, id, lat, lon) — 9 candidate
  * cells per left row, each a slim equi-join key — and verifies
  * candidates with exact haversine; no cross join exists in the plan
  * at any scale (GeoSpec asserts the absence of
  * BroadcastNestedLoop/CartesianProduct and equality with the naive
  * quadratic join). geo2 is two aggregates over the same cell keys.
  */
object Geo {

  /** Earth radius (km) for haversine. */
  private val R = 6371.0

  /** Radius (km) for geo1's pair join. */
  private val radiusKm = 300.0

  /** First 4 hex digits of md5(key || '#' || salt) as an int in
    * [0, 65536) — nonlinear, engine-portable.
    */
  private def hex4(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit("#" + salt))),
      1, 4), 16, 10).cast("long")

  private def lat(k: Column): Column =
    (pmod(hex4(k, "lat"), lit(12000L)).cast("double") / 100.0) - 60.0
  private def lon(k: Column): Column =
    (pmod(hex4(k, "lon"), lit(35400L)).cast("double") / 100.0) - 177.0

  /** Haversine great-circle distance in km between (lat1,lon1) and
    * (lat2,lon2) in degrees. Pure `functions._` trig — whole-stage
    * codegen'd, no UDF.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column,
      lon2: Column): Column = {
    val dphi = radians(lat2 - lat1) / 2
    val dlam = radians(lon2 - lon1) / 2
    val a = pow(sin(dphi), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dlam), 2)
    asin(sqrt(a)) * (2 * R)
  }

  /** Deterministic customer point set for the geo queries (see the
    * object doc for the domain guarantees).
    */
  private[graft] def points(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey").as("id"),
        lat(col("c_custkey")).as("lat"), lon(col("c_custkey")).as("lon"))

  /** geo1: all customer pairs within 300 km (haversine), via
    * grid-cell candidates + exact verify. Left side probes its 3x3
    * cell neighborhood; the equi-join on (celly, cellx) with
    * `id_a < id_b` yields each pair exactly once.
    */
  def geo1RadiusPairs(s: SparkSession, d: String): DataFrame = {
    val pts = points(s, d)
      .withColumn("cy", floor(col("lat") / 3.0))
      .withColumn("cx", floor(col("lon") / 6.0))
    val probes = pts
      .select(col("id").as("id_a"), col("lat").as("lat_a"),
        col("lon").as("lon_a"),
        explode(array((-1 to 1).flatMap(dy => (-1 to 1).map(dx =>
          struct((col("cy") + dy).as("cy"), (col("cx") + dx).as("cx"))))
          : _*)).as("cell"))
      .select(col("id_a"), col("lat_a"), col("lon_a"),
        col("cell.cy").as("cy"), col("cell.cx").as("cx"))
    probes.join(pts.select(col("id").as("id_b"), col("lat").as("lat_b"),
        col("lon").as("lon_b"), col("cy"), col("cx")),
        Seq("cy", "cx"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("km", haversineKm(col("lat_a"), col("lon_a"),
        col("lat_b"), col("lon_b")))
      .filter(col("km") <= radiusKm)
      .select(col("id_a"), col("id_b"), round(col("km"), 3).as("km3"))
  }

  /** geo2: 3x3-kernel grid density — per occupied cell, its own point
    * count and the total over its 8-neighborhood (each cell's count
    * scattered to its 9 covering neighborhoods, then re-aggregated:
    * two slim shuffles on cell keys, never the points).
    */
  def geo2KernelDensity(s: SparkSession, d: String): DataFrame = {
    val cells = points(s, d)
      .groupBy(floor(col("lat") / 3.0).as("cy"),
        floor(col("lon") / 6.0).as("cx"))
      .agg(count(lit(1)).as("n"))
    val scattered = cells
      .select(col("n"),
        explode(array((-1 to 1).flatMap(dy => (-1 to 1).map(dx =>
          struct((col("cy") + dy).as("cy"), (col("cx") + dx).as("cx"))))
          : _*)).as("cell"))
      .groupBy(col("cell.cy").as("cy"), col("cell.cx").as("cx"))
      .agg(sum(col("n")).as("kernel_n"))
    cells.join(scattered, Seq("cy", "cx"))
      .select(col("cy"), col("cx"), col("n"), col("kernel_n"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geo1_radius_pairs" -> (geo1RadiusPairs _),
    "geo2_kernel_density" -> (geo2KernelDensity _))

  private def hex4Sql(salt: String): String = {
    val m = s"md5(CAST(c_custkey AS VARCHAR) || '#$salt')"
    s"""((strpos('0123456789abcdef', substr($m, 1, 1)) - 1) * 4096 +
        (strpos('0123456789abcdef', substr($m, 2, 1)) - 1) * 256 +
        (strpos('0123456789abcdef', substr($m, 3, 1)) - 1) * 16 +
        (strpos('0123456789abcdef', substr($m, 4, 1)) - 1))"""
  }

  private val ptsCte =
    s"""pts AS MATERIALIZED (
         SELECT c_custkey AS id,
                CAST(${hex4Sql("lat")} % 12000 AS DOUBLE) / 100.0 - 60.0
                  AS lat,
                CAST(${hex4Sql("lon")} % 35400 AS DOUBLE) / 100.0
                  - 177.0 AS lon
         FROM customer)"""

  val oracles: Map[String, String] = Map(
    // the oracle is the NAIVE quadratic join — same pair semantics,
    // no grid: DuckDB verifies the candidate generator loses nothing
    "geo1_radius_pairs" ->
      s"""WITH $ptsCte
         SELECT a.id AS id_a, b.id AS id_b,
                round(2 * 6371.0 * asin(sqrt(
                  sin(radians(b.lat - a.lat) / 2) ^ 2 +
                  cos(radians(a.lat)) * cos(radians(b.lat)) *
                  sin(radians(b.lon - a.lon) / 2) ^ 2)), 3) AS km3
         FROM pts a JOIN pts b ON a.id < b.id
         WHERE 2 * 6371.0 * asin(sqrt(
                 sin(radians(b.lat - a.lat) / 2) ^ 2 +
                 cos(radians(a.lat)) * cos(radians(b.lat)) *
                 sin(radians(b.lon - a.lon) / 2) ^ 2)) <= 300.0""",
    "geo2_kernel_density" ->
      s"""WITH $ptsCte,
         cells AS MATERIALIZED (
           SELECT CAST(floor(lat / 3.0) AS BIGINT) AS cy,
                  CAST(floor(lon / 6.0) AS BIGINT) AS cx,
                  CAST(count(*) AS BIGINT) AS n
           FROM pts GROUP BY 1, 2),
         scattered AS (
           SELECT cells.cy + d.dy AS cy, cells.cx + d.dx AS cx,
                  CAST(sum(n) AS BIGINT) AS kernel_n
           FROM cells CROSS JOIN (
             SELECT a.dy, b.dx
             FROM (SELECT unnest([-1, 0, 1]) AS dy) a
             CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) b) d
           GROUP BY 1, 2)
         SELECT cells.cy, cells.cx, n, kernel_n
         FROM cells JOIN scattered
           ON cells.cy = scattered.cy AND cells.cx = scattered.cx""")
}
