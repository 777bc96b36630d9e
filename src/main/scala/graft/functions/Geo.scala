package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Minimal geo function surface (SURVEY.md §2.8 geo row — reference
  * /root/reference/libs/geo/ with S2 backing; scalar surface
  * server/connector/functions/search.h:121-124: ST_Distance_Between,
  * ST_Intersects, ST_Contains). Pure Catalyst expressions: WKT POINT
  * make/parse via string functions, spherical distance via haversine —
  * codegen'd, no UDF, so the surface scales like any other column math.
  * S2-cell indexed pushdown remains future work; this is the scalar layer.
  */
object Geo {
  val EarthRadiusKm = 6371.0088

  /** WKT `POINT(lon lat)` constructor. */
  def stPoint(lon: Column, lat: Column): Column =
    concat(lit("POINT("), lon.cast("string"), lit(" "), lat.cast("string"), lit(")"))

  /** X (lon) of a WKT POINT. */
  def stX(wkt: Column): Column =
    regexp_extract(wkt, "POINT\\(([-0-9.eE]+) ([-0-9.eE]+)\\)", 1).cast("double")

  /** Y (lat) of a WKT POINT. */
  def stY(wkt: Column): Column =
    regexp_extract(wkt, "POINT\\(([-0-9.eE]+) ([-0-9.eE]+)\\)", 2).cast("double")

  /** Great-circle distance in km between two lon/lat points (haversine —
    * the ST_Distance_Between analogue for points). */
  def stDistanceSphereKm(lon1: Column, lat1: Column,
      lon2: Column, lat2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2.0 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Axis-aligned bbox containment — the ST_Contains(box, point) case. */
  def stContainsBox(minLon: Column, minLat: Column, maxLon: Column, maxLat: Column,
      lon: Column, lat: Column): Column =
    lon >= minLon && lon <= maxLon && lat >= minLat && lat <= maxLat
}
