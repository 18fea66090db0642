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
}
