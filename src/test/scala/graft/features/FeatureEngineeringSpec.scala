package graft.features

import graft.SparkSpec
import graft.infer.Predictor
import graft.ml.{Compare, Persist, Trainer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.regression.LinearRegressionModel
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end parity test of the reference workload on the real-estate
  * schema (FIXTURES.md A): nulls → permissive fill → derived features →
  * capping → encoding → log-target training → batch/single inference.
  */
class FeatureEngineeringSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id_annonce", IntegerType),
    StructField("property_type", StringType),
    StructField("approximate_latitude", DoubleType),
    StructField("approximate_longitude", DoubleType),
    StructField("size", DoubleType),
    StructField("land_size", DoubleType),
    StructField("energy_performance_category", StringType),
    StructField("ghg_category", StringType),
    StructField("exposition", StringType),
    StructField("nb_rooms", DoubleType),
    StructField("price", DoubleType)))

  /** 300 listings, French labels, ~15% nulls, price deterministic in
    * size + type so models can learn it.
    */
  private def listings: DataFrame = {
    val types = Seq("maison", "appartement", "propriété")
    val cats = Seq("A", "C", "E", "G")
    val rows = (1 to 300).map { i =>
      val size = 30.0 + (i % 150)
      val withNulls = i % 7 == 0
      Row(
        i, types(i % 3),
        if (withNulls) null else 43.0 + (i % 80) * 0.1,
        if (withNulls) null else -1.0 + (i % 110) * 0.1,
        if (i % 11 == 0) null else size,
        if (i % 5 == 0) null else size * 8.0,
        cats(i % 4), cats((i + 1) % 4),
        if (withNulls) null else Seq("Nord", "Sud", "Est", "Ouest")(i % 4),
        if (i % 13 == 0) null else (1.0 + i % 8),
        size * 3000.0 + (i % 3) * 50000.0)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }

  test("fitTransform: no nulls escape, derived cols present, vector assembled") {
    val fe = new FeatureEngineering("permissive",
      categoricalCols = Seq("property_type", "energy_performance_category",
        "ghg_category", "exposition"),
      numericCols = Seq("approximate_latitude", "approximate_longitude",
        "size", "land_size", "nb_rooms"))
    val out = fe.fitTransform(listings)
    out.count() shouldBe 300
    fe.derivedCols.foreach(c => out.columns should contain(c))
    // permissive fill: no nulls remain in any feature input
    val nullCounts = out.select(
      (Seq("size", "land_size", "nb_rooms", "approximate_latitude") ++ fe.derivedCols)
        .map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(c)): _*).head()
    nullCounts.toSeq.foreach(_ shouldBe 0L)
    // vector width: 5 numeric + 5 derived + Σ(cat levels with keep-invalid − 1)
    val width = out.select(org.apache.spark.sql.functions.size(
      vector_to_array(col("features"))).as("w")).distinct().head().getInt(0)
    width should be >= 15
    // capping actually clamps: max size ≤ p99 bound
    val (_, hi) = fe.capper.bounds("size")
    out.agg(max("size")).head().getDouble(0) should be <= hi
  }

  test("null lat/lon default to the Eiffel tower → distance 0 (permissive)") {
    val fe = new FeatureEngineering("permissive",
      categoricalCols = Seq("property_type"),
      numericCols = Seq("approximate_latitude", "approximate_longitude", "size", "nb_rooms"))
    val out = fe.fitTransform(listings)
    val dist = out.filter(col("id_annonce") === 7) // a null-coordinates row
      .select("distance_to_eiffel").head().getDouble(0)
    dist shouldBe 0.0 +- 1e-6
  }

  test("save/load round-trip reproduces transforms exactly") {
    val dir = tmpDir("fe-roundtrip")
    val fe = new FeatureEngineering("permissive",
      categoricalCols = Seq("property_type", "exposition"),
      numericCols = Seq("size", "land_size", "nb_rooms"))
    fe.fit(listings)
    fe.save(dir)
    val loaded = new FeatureEngineering("permissive",
      categoricalCols = Seq("property_type", "exposition"),
      numericCols = Seq("size", "land_size", "nb_rooms")).load(dir)
    loaded.capper.bounds shouldBe fe.capper.bounds
    val a = fe.transform(listings).select("id_annonce", "features")
    val b = loaded.transform(listings).select("id_annonce", "features")
    a.except(b).count() shouldBe 0
  }

  test("full reference workload: FE → log-target LR → finite batch == single") {
    val dir = tmpDir("fe-e2e")
    val fe = new FeatureEngineering("permissive",
      categoricalCols = Seq("property_type", "exposition"),
      numericCols = Seq("size", "land_size", "nb_rooms"))
    val tt = new TargetTransformer("price").fit(listings)
    val train = tt.transform(fe.fitTransform(listings))
    val model = Trainer.linear("log_price").setSolver("normal").fit(train)
    Persist.saveAllWithFe(dir, model, fe, tt, Map("model_type" -> "lr"))

    // rehydrate everything from disk — the predictor must reconstruct the
    // exact train-time transform (nulls → derived → capping → encoding)
    val feLoaded = Persist.loadFeatureEngineering(dir,
      new FeatureEngineering("permissive",
        categoricalCols = Seq("property_type", "exposition"),
        numericCols = Seq("size", "land_size", "nb_rooms")))
    val predictor = new Predictor(feLoaded,
      Persist.loadModel(dir, org.apache.spark.ml.regression.LinearRegressionModel),
      Persist.loadTargetTransformer(dir, "price"))
    val firstRow = listings.limit(1)
    val batch = predictor.predictBatch(firstRow)
      .select("prediction_price").head().getDouble(0)
    batch.isInfinity shouldBe false
    batch should be > 0.0
    // sanity: within 3× of the true price on training data
    val truth = firstRow.select("price").head().getDouble(0)
    (batch / truth) should (be > 0.33 and be < 3.0)

    // single-row path must agree with the batch path exactly (ref quirk Q2
    // killed: both finite, both equal)
    val inferSchema = StructType(schema.fields.filterNot(_.name == "price"))
    val r = firstRow.head()
    val values = inferSchema.fieldNames.map(n => n -> r.getAs[Any](n)).toMap
    val single = predictor.predictSingle(spark, values, inferSchema)
    single shouldBe batch +- 1e-9
  }

  test("model comparison tunes RF/LR/GBT and picks best by RMSE") {
    val fe = new FeatureEngineering("permissive",
      categoricalCols = Seq("property_type"),
      numericCols = Seq("size", "nb_rooms"))
    val frame = fe.fitTransform(listings)
    val Array(train, test) = frame.randomSplit(Array(0.8, 0.2), seed = 42L)
    val results = Compare.compareModels(train, test, "price", folds = 2)
    results.map(_.name) should contain theSameElementsAs
      Seq("random_forest", "linear_regression", "gbt")
    all(results.map(_.metrics.rmse)) should be > 0.0
    val best = Compare.bestByRmse(results)
    best.metrics.rmse shouldBe results.map(_.metrics.rmse).min
    // linear data → LR should be at or near the top
    val comparison = Compare.comparisonFrame(spark, results)
    comparison.count() shouldBe 3
  }
}
