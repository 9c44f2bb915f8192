package graft.features

import org.apache.spark.sql.DataFrame

/** Strict/permissive null defaulting
  * (reference: /root/reference/src/features/feature_engineering.py:48-91).
  *
  * strict:     every numeric → 0, every categorical → "unknown".
  * permissive: per-column defaults (the reference uses Eiffel lat/lon for
  *             missing coordinates, 0 for counts, "unknown" for categories).
  */
object NullPolicy {

  def strict(df: DataFrame, numericCols: Seq[String], categoricalCols: Seq[String]): DataFrame = {
    val filled = df.na.fill(0.0, numericCols).na.fill(0, numericCols)
    filled.na.fill("unknown", categoricalCols)
  }

  def permissive(
      df: DataFrame,
      doubleDefaults: Map[String, Double],
      stringDefaults: Map[String, String]): DataFrame =
    df.na.fill(doubleDefaults).na.fill(stringDefaults)

  /** The reference's permissive defaults for the real-estate schema
    * (feature_engineering.py:54-67).
    */
  def realEstatePermissiveDoubles: Map[String, Double] = Map(
    "approximate_latitude" -> Derived.EiffelLat,
    "approximate_longitude" -> Derived.EiffelLon,
    "size" -> 0.0, "land_size" -> 0.0,
    "energy_performance_value" -> 0.0, "ghg_value" -> 0.0,
    "nb_rooms" -> 0.0, "nb_bedrooms" -> 0.0, "nb_bathrooms" -> 0.0,
    "nb_parking_places" -> 0.0, "nb_boxes" -> 0.0, "nb_photos" -> 0.0,
    "floor" -> 0.0)

  def realEstatePermissiveStrings: Map[String, String] = Map(
    "property_type" -> "unknown", "city" -> "unknown",
    "energy_performance_category" -> "unknown", "ghg_category" -> "unknown",
    "exposition" -> "unknown")
}
