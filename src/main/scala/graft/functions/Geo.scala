package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo primitives (reference: haversine distance in meters,
  * crates/milli/src/lib.rs:322-329 distance_between_two_points;
  * geo filters filter-parser/src/lib.rs:370-400; geoSort
  * milli/src/search/new/geo_sort.rs — ascending distance to a target).
  *
  * Documents carry `_geo_lat` / `_geo_lng` double columns (the
  * reference's `_geo: {lat, lng}` object flattened). Everything here is
  * a codegen'd Column expression — filters push down, the sort is a
  * plain orderBy.
  */
object Geo {
  final val EarthRadiusMeters = 6371000.0
  final val LatCol = "_geo_lat"
  final val LngCol = "_geo_lng"

  /** Haversine distance in meters between (latCol, lngCol) and a fixed
    * point — pure built-in math functions, stays in codegen. */
  def haversineMeters(lat: Column, lng: Column, lat2: Double, lng2: Double): Column = {
    val dLat = radians(lit(lat2)) - radians(lat)
    val dLng = radians(lit(lng2)) - radians(lng)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat)) * cos(radians(lit(lat2))) * pow(sin(dLng / 2), 2)
    // clamp via `when`, not `least`: least() SKIPS nulls, which would
    // turn a missing-geo row into asin(1) = the antipode distance
    val s = sqrt(a)
    lit(2.0 * EarthRadiusMeters) * asin(when(s > 1.0, lit(1.0)).otherwise(s))
  }

  /** `_geoRadius(lat, lng, meters)` filter condition. Docs without geo
    * fields never match (null comparison is false). */
  def geoRadius(lat: Double, lng: Double, meters: Double): Column =
    haversineMeters(col(LatCol), col(LngCol), lat, lng) <= meters

  /** `_geoBoundingBox([latTR, lngTR], [latBL, lngBL])` filter: lat/lng
    * inside the box (top-right then bottom-left, reference argument
    * order); antimeridian-crossing boxes wrap on longitude. */
  def geoBoundingBox(latTR: Double, lngTR: Double,
                     latBL: Double, lngBL: Double): Column = {
    val latOk = col(LatCol).between(latBL, latTR)
    val lngOk =
      if (lngBL <= lngTR) col(LngCol).between(lngBL, lngTR)
      else col(LngCol) >= lngBL || col(LngCol) <= lngTR
    latOk && lngOk
  }

  /** geoSort key: ascending haversine distance to the target, docs
    * without geo last (reference geo_sort puts them after). */
  def geoSortAsc(lat: Double, lng: Double): Column =
    haversineMeters(col(LatCol), col(LngCol), lat, lng).asc_nulls_last
}
