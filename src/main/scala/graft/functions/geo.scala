package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic expressions.
  *
  * Haversine great-circle distance with R = 6371000 m, matching the
  * reference predicate (`streaming/.../utils/GeoPredicate.java:29-38` in
  * XComp/vbb-data-pipeline). Expressed as a pure `Column` composition of
  * codegen'd built-ins — no UDF — so it stays inside whole-stage codegen
  * and remains sargable (Catalyst can push the surrounding filter around
  * joins).
  */
object geo {
  val EarthRadiusMeters = 6371000.0

  /** Great-circle distance in metres between (lat1,lon1) and (lat2,lon2),
    * all in degrees. atan2 form (numerically stable near antipodes).
    */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2) - radians(lat1)
    val dLon = radians(lon2) - radians(lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusMeters) * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }

  /** Radius predicate around a fixed centre (the reference's GeoPredicate). */
  def withinRadius(lat: Column, lon: Column,
                   centerLat: Double, centerLon: Double,
                   radiusMeters: Double): Column =
    haversineMeters(lit(centerLat), lit(centerLon), lat, lon) <= lit(radiusMeters)

  /** Sargable degree bounding box around a centre — a strict SUPERSET of
    * the radius circle (1% slack over the spherical degree metrics), so
    * conjoining it with [[withinRadius]] never changes results. The point
    * at scale: simple range predicates on stored lat/lon columns push
    * into the parquet scan (min/max row-group pruning, PushedFilters),
    * which the transcendental haversine never can — so a radius query
    * over a geo-partitioned 100 TB table prunes to the relevant files
    * and only candidates pay the trig. Near the poles the longitude
    * span degenerates; the box widens to all longitudes (still a
    * superset).
    */
  def inBoundingBox(lat: Column, lon: Column,
                    centerLat: Double, centerLon: Double,
                    radiusMeters: Double): Column = {
    val mPerDegLat = math.Pi * EarthRadiusMeters / 180.0
    val dLat = radiusMeters / mPerDegLat * 1.01
    val cosLat = math.cos(math.toRadians(centerLat))
    val dLon =
      if (cosLat < 1e-6) 360.0 else radiusMeters / (mPerDegLat * cosLat) * 1.01
    lat.between(lit(centerLat - dLat), lit(centerLat + dLat)) &&
      lon.between(lit(centerLon - dLon), lit(centerLon + dLon))
  }
}
