package graft.etl

import org.apache.spark.sql.types._

/** Canonical real-estate listing schema
  * (ref: /root/reference/src/inference/predict.py:31-59 — the 27-field
  * inference StructType — and the cast list at
  * notebooks/00_prepare_data.py:65-87; dictionary at README.md:61-89).
  */
object Schemas {

  /** The 21-column canonical training schema (X ⋈ y). */
  val listing: StructType = StructType(Seq(
    StructField("id_annonce", IntegerType),
    StructField("property_type", StringType),
    StructField("approximate_latitude", DoubleType),
    StructField("approximate_longitude", DoubleType),
    StructField("city", StringType),
    StructField("postal_code", IntegerType),
    StructField("size", DoubleType),
    StructField("floor", IntegerType),
    StructField("land_size", DoubleType),
    StructField("energy_performance_value", DoubleType),
    StructField("energy_performance_category", StringType),
    StructField("ghg_value", DoubleType),
    StructField("ghg_category", StringType),
    StructField("exposition", StringType),
    StructField("nb_rooms", IntegerType),
    StructField("nb_bedrooms", IntegerType),
    StructField("nb_bathrooms", IntegerType),
    StructField("nb_parking_places", IntegerType),
    StructField("nb_boxes", IntegerType),
    StructField("nb_photos", IntegerType),
    StructField("price", DoubleType)))

  /** The 27-field single-row inference schema (X_test extras included). */
  val inference: StructType = StructType(
    listing.fields.filterNot(_.name == "price") ++ Seq(
      StructField("has_a_balcony", DoubleType),
      StructField("nb_terraces", DoubleType),
      StructField("has_a_cellar", DoubleType),
      StructField("has_a_garage", DoubleType),
      StructField("has_air_conditioning", DoubleType),
      StructField("last_floor", DoubleType),
      StructField("upper_floors", DoubleType)))

  val categoricalCols: Seq[String] = Seq(
    "property_type", "energy_performance_category", "ghg_category", "exposition")

  val numericCols: Seq[String] = Seq(
    "approximate_latitude", "approximate_longitude", "size", "floor",
    "land_size", "energy_performance_value", "ghg_value", "nb_rooms",
    "nb_bedrooms", "nb_bathrooms", "nb_parking_places", "nb_boxes", "nb_photos")
}
