package graft.ml

import graft.SparkSpec
import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.regression.{RandomForestRegressionModel, RandomForestRegressor}
import org.apache.spark.ml.PipelineModel
import org.json4s.{JInt, JString}

/** Migration story for the reference's shipped Spark 3.5.1 artifacts
  * (ref: models/rf/feature_engineering/pipeline, models/rf/model).
  * Pins (1) that Spark's own loaders FAIL on them — they are
  * metadata-only, learned state was truncated — and (2) that
  * [[ReferenceArtifacts]] salvages the complete refit-ready structure.
  */
class ReferenceArtifactsSpec extends SparkSpec {
  import spark.implicits._

  private val pipelineDir =
    "/root/reference/models/rf/feature_engineering/pipeline"
  private val modelDir = "/root/reference/models/rf/model"

  private val expectedAssemblerCols = Seq("size", "land_size", "nb_rooms",
    "floor", "energy_performance_value", "ghg_value", "nb_bedrooms",
    "nb_bathrooms", "nb_parking_places", "nb_boxes", "nb_photos",
    "distance_to_eiffel", "rooms_per_m2", "is_house", "log_size",
    "log_land_size")

  test("Spark's loaders fail on the shipped artifacts: data/ was truncated") {
    spark.version // force the test session so MLReader reuses it
    val e1 = intercept[Exception](PipelineModel.load(pipelineDir))
    val e2 = intercept[Exception](RandomForestRegressionModel.load(modelDir))
    // the failure is the missing per-stage learned-state parquet, not a
    // 3.5-vs-4.1 format mismatch — both messages point at a data path
    (e1.getMessage + e1.toString).toLowerCase should include("data")
    (e2.getMessage + e2.toString).toLowerCase should include("data")
  }

  test("pipelineSkeleton rebuilds all 9 stages with original uids and params") {
    val (pipeline, metas) = ReferenceArtifacts.pipelineSkeleton(pipelineDir)
    metas should have size 9
    all(metas.map(_.sparkVersion)) shouldBe "3.5.1"
    val stages = pipeline.getStages
    stages should have size 9
    // 4× (StringIndexer → OneHotEncoder) then the assembler
    stages.take(8).zipWithIndex.foreach { case (s, i) =>
      if (i % 2 == 0) s shouldBe a[StringIndexer]
      else s shouldBe a[OneHotEncoder]
    }
    val indexer = stages(0).asInstanceOf[StringIndexer]
    indexer.uid shouldBe "StringIndexer_7f1d78282318"
    indexer.getInputCol shouldBe "property_type"
    indexer.getOutputCol shouldBe "property_type_indexed"
    indexer.getHandleInvalid shouldBe "skip"
    val ohe = stages(1).asInstanceOf[OneHotEncoder]
    ohe.getInputCols shouldBe Array("property_type_indexed")
    ohe.getOutputCols shouldBe Array("property_type_encoded")
    ohe.getDropLast shouldBe true
    val assembler = stages(8).asInstanceOf[VectorAssembler]
    assembler.getInputCols.toSeq shouldBe expectedAssemblerCols
    assembler.getHandleInvalid shouldBe "keep"
  }

  test("rfHyperParams recovers the training configuration and numFeatures") {
    val (params, numFeatures) = ReferenceArtifacts.rfHyperParams(modelDir)
    params("numTrees") shouldBe JInt(50)
    params("maxDepth") shouldBe JInt(10)
    params("minInstancesPerNode") shouldBe JInt(2)
    params("labelCol") shouldBe JString("price")
    params("impurity") shouldBe JString("variance")
    numFeatures shouldBe 16
    // numFeatures must equal the salvaged assembler's slot count — the
    // reference's assembler feeds exactly its 16 numeric inputs to the RF
    numFeatures shouldBe expectedAssemblerCols.size
  }

  test("treesMetadata ships 50 unit-weight trees (params only, no splits)") {
    val trees = ReferenceArtifacts.treesMetadata(spark, modelDir)
    trees.count() shouldBe 50L
    trees.select("weights").distinct().as[Double].collect() shouldBe Array(1.0)
  }

  test("migration path: refit the salvaged skeleton, predict finite") {
    val (pipeline, _) = ReferenceArtifacts.pipelineSkeleton(pipelineDir)
    // fixture rows carrying the 4 indexed categoricals + the 16 assembler
    // numerics (3 distinct category values so indexer+encoder have work)
    val cats = Seq("A", "B", "C")
    val rows = (0 until 30).map { i =>
      val c = cats(i % 3)
      (c, c, c, c,
        50.0 + i, 100.0 + i, 3.0, 1.0, 120.0, 25.0, 2.0, 1.0, 1.0, 0.0,
        10.0 + i % 5, 0.05, 1.0, 1.0, math.log1p(50.0 + i),
        math.log1p(100.0 + i), 100000.0 + 1000.0 * i)
    }.toDF("property_type", "energy_performance_category", "ghg_category",
      "exposition", "size", "land_size", "nb_rooms", "floor",
      "energy_performance_value", "ghg_value", "nb_bedrooms", "nb_bathrooms",
      "nb_parking_places", "nb_boxes", "nb_photos", "distance_to_eiffel",
      "rooms_per_m2", "is_house", "log_size", "log_land_size", "price")
    val fitted = pipeline.fit(rows)
    val features = fitted.transform(rows)
    features.select("features").head.getAs[Vector](0).size shouldBe 16
    // refit an RF with the salvaged hyper-params and check a finite score
    val (params, _) = ReferenceArtifacts.rfHyperParams(modelDir)
    val rf = new RandomForestRegressor()
      .setNumTrees(params("numTrees").asInstanceOf[JInt].num.toInt)
      .setMaxDepth(params("maxDepth").asInstanceOf[JInt].num.toInt)
      .setMinInstancesPerNode(
        params("minInstancesPerNode").asInstanceOf[JInt].num.toInt)
      .setLabelCol("price").setFeaturesCol("features").setSeed(42L)
    val preds = rf.fit(features).transform(features)
      .select("prediction").as[Double].collect()
    preds should have size 30
    all(preds.map(java.lang.Double.isFinite(_))) shouldBe true
  }
}
