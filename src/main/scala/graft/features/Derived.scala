package graft.features

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Derived-feature column builders (pure Catalyst expressions — whole-stage
  * codegen friendly, no UDFs).
  *
  * Reference semantics: /root/reference/src/features/feature_engineering.py
  *   - haversine distance to a fixed point (:38-40, :182-209)
  *   - guarded log (:129-148), guarded ratio (:110-118), binary flag (:121-126)
  */
object Derived {

  /** Eiffel-tower anchor used by the reference (feature_engineering.py:38-40). */
  val EiffelLat = 48.858370
  val EiffelLon = 2.294481
  val EarthRadiusKm = 6371.0

  /** Great-circle distance in km between two (lat, lon) pairs in degrees:
    * 2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)))
    * (feature_engineering.py:182-209). Written with explicit products (not
    * pow) so SQL twins can mirror the arithmetic shape exactly.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val rlat1 = radians(lat1)
    val rlat2 = radians(lat2)
    val dlat2 = radians(lat2 - lat1) / 2
    val dlon2 = radians(lon2 - lon1) / 2
    val a = sin(dlat2) * sin(dlat2) + cos(rlat1) * cos(rlat2) * sin(dlon2) * sin(dlon2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Distance to the Eiffel tower with the reference's null→0 guard
    * (feature_engineering.py:94-107).
    */
  def distanceToEiffelKm(lat: Column, lon: Column): Column =
    when(lat.isNull || lon.isNull, lit(0.0))
      .otherwise(haversineKm(lat, lon, lit(EiffelLat), lit(EiffelLon)))

  /** log(x) if x > 0 and non-null, else 0 (feature_engineering.py:129-148). */
  def guardedLog(c: Column): Column =
    when(c.isNull || c <= 0, lit(0.0)).otherwise(log(c))

  /** num/den with the reference's 0-guard on null/non-positive denominator
    * (rooms_per_m2, feature_engineering.py:110-118).
    */
  def guardedRatio(num: Column, den: Column): Column =
    when(den.isNull || den <= 0 || num.isNull, lit(0.0)).otherwise(num / den)

  /** 1 iff the column value is in `values`, else 0 (is_house,
    * feature_engineering.py:121-126; label set configurable — the reference
    * hard-codes English labels against French data, SURVEY §2.12 Q6).
    */
  def binaryFlag(c: Column, values: Seq[String]): Column =
    when(c.isin(values: _*), lit(1)).otherwise(lit(0))
}
