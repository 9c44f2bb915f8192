package graft.features

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full feature-engineering orchestrator — the Scala equivalent of the
  * reference's FeatureEngineering class
  * (/root/reference/src/features/feature_engineering.py:211-340):
  *
  *   null policy → derived features (haversine distance to the Eiffel
  *   tower, guarded logs, rooms-per-m², house flag) → outlier capping →
  *   StringIndexer/OneHotEncoder/VectorAssembler pipeline → `features`.
  *
  * Differences by design (SURVEY §7): the capping fit is ONE multi-column
  * approxQuantile job (not 11 separate actions), encoded categoricals are
  * included in the vector (quirk Q1 fixed), and the house-flag label set is
  * configurable with the French labels as default (quirk Q6).
  */
class FeatureEngineering(
    val mode: String = "permissive",
    val categoricalCols: Seq[String] = graft.etl.Schemas.categoricalCols,
    val numericCols: Seq[String] = graft.etl.Schemas.numericCols,
    val houseLabels: Seq[String] = Seq("maison", "villa", "propriété")) extends Serializable {

  require(mode == "strict" || mode == "permissive", s"unknown mode $mode")

  /** Derived columns added by [[addDerived]], appended to the assembler. */
  val derivedCols: Seq[String] =
    Seq("distance_to_eiffel", "log_size", "log_land_size", "rooms_per_m2", "is_house")

  /** Capped columns = the reference's NUMERIC_COLS minus the label (the
    * exact key set of models/rf/feature_engineering/params.json's
    * capping_values): every numeric feature EXCEPT the geographic
    * coordinates, which the reference never caps (not in its NUMERIC_COLS —
    * and winsorizing them would distort the haversine derived feature).
    */
  private val cappedCols = numericCols.filterNot(c =>
    c == "approximate_latitude" || c == "approximate_longitude")

  private var capperOpt: Option[Capper] = None
  private var pipelineOpt: Option[PipelineModel] = None

  def capper: Capper = capperOpt.getOrElse(throw new IllegalStateException("not fitted"))
  def pipeline: PipelineModel = pipelineOpt.getOrElse(throw new IllegalStateException("not fitted"))
  def isFitted: Boolean = capperOpt.isDefined && pipelineOpt.isDefined

  /** Null defaulting (ref :48-91): strict → 0/"unknown" everywhere;
    * permissive → per-column defaults (Eiffel coordinates for geo).
    */
  def fillNulls(df: DataFrame): DataFrame = mode match {
    case "strict" =>
      NullPolicy.strict(df,
        numericCols.filter(df.columns.contains),
        categoricalCols.filter(df.columns.contains))
    case _ =>
      NullPolicy.permissive(df,
        NullPolicy.realEstatePermissiveDoubles.filter { case (k, _) => df.columns.contains(k) },
        NullPolicy.realEstatePermissiveStrings.filter { case (k, _) => df.columns.contains(k) })
  }

  /** Derived features (ref :94-148). */
  def addDerived(df: DataFrame): DataFrame =
    df.withColumn("distance_to_eiffel",
        Derived.distanceToEiffelKm(col("approximate_latitude"), col("approximate_longitude")))
      .withColumn("log_size", Derived.guardedLog(col("size")))
      .withColumn("log_land_size", Derived.guardedLog(col("land_size")))
      .withColumn("rooms_per_m2", Derived.guardedRatio(col("nb_rooms"), col("size")))
      .withColumn("is_house",
        Derived.binaryFlag(col("property_type"), houseLabels).cast("double"))

  def fit(df: DataFrame): this.type = {
    val prepared = addDerived(fillNulls(df))
    val cap = new Capper(cappedCols.filter(prepared.columns.contains)).fit(prepared)
    val capped = cap.transform(prepared)
    val handleInvalid = if (mode == "strict") "skip" else "keep"
    val pipe = Encoding.buildPipeline(
      categoricalCols.filter(capped.columns.contains),
      numericCols.filter(capped.columns.contains) ++ derivedCols,
      handleInvalid)
    capperOpt = Some(cap)
    pipelineOpt = Some(pipe.fit(capped))
    this
  }

  def transform(df: DataFrame): DataFrame = {
    val prepared = addDerived(fillNulls(df))
    pipeline.transform(capper.transform(prepared))
  }

  def fitTransform(df: DataFrame): DataFrame = fit(df).transform(df)

  /** Artifact layout mirrors the reference
    * (models/rf/feature_engineering/{params.json,pipeline}).
    */
  def save(dir: String): Unit = {
    capper.save(s"$dir/params.json")
    pipeline.write.overwrite().save(s"$dir/pipeline")
  }

  def load(dir: String): this.type = {
    val cap = new Capper(cappedCols).load(s"$dir/params.json")
    capperOpt = Some(cap)
    pipelineOpt = Some(PipelineModel.load(s"$dir/pipeline"))
    this
  }
}
