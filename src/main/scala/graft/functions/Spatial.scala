package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spatial functions (ref `daft/functions/spatial.py`). */
object Spatial {

  /** IUGG mean earth radius, km — the constant geodesy libraries use. */
  val EarthRadiusKm = 6371.0088

  /** Haversine great-circle distance in km between (lat1,lon1) and
    * (lat2,lon2) in degrees (ref spatial.py `great_circle_distance`).
    * Pure Column expression — stays inside whole-stage codegen. */
  def greatCircleDistance(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }
}
