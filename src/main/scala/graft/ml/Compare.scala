package graft.ml

import org.apache.spark.ml.Model
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Model-comparison workflow — the reference's train.py main loop
  * (/root/reference/src/models/train.py:262-370 and
  * notebooks/03_model_training.py): CV-tune RF / LR / GBT on the same
  * (cached) training frame, evaluate rmse/r²/mae on the holdout, persist
  * the comparison table, pick the best by RMSE.
  */
object Compare {

  final case class ModelResult(
      name: String, metrics: EvalMetrics, model: Model[_])

  /** @param train assembled frame with `features` + label; cached once so
    *              the k-fold × grid fits share a single materialization.
    */
  def compareModels(train: DataFrame, test: DataFrame, labelCol: String,
      folds: Int = 3, seed: Long = 42L): Seq[ModelResult] = {
    train.cache()
    try {
      val rf = Trainer.randomForest(labelCol, seed = seed)
      val lr = Trainer.linear(labelCol)
      val gbt = Trainer.gbt(labelCol, seed = seed)
      val tuned = Seq(
        ("random_forest", Trainer.trainWithCV(train, rf, Trainer.rfGrid(rf), labelCol, folds, seed)),
        ("linear_regression", Trainer.trainWithCV(train, lr, Trainer.lrGrid(lr), labelCol, folds, seed)),
        ("gbt", Trainer.trainWithCV(train, gbt,
          new org.apache.spark.ml.tuning.ParamGridBuilder()
            .addGrid(gbt.maxDepth, Array(3, 5)).addGrid(gbt.maxIter, Array(5, 10)).build(),
          labelCol, folds, seed)))
      tuned.map { case (name, cv) =>
        val best = cv.bestModel.asInstanceOf[Model[_]]
        ModelResult(name, Trainer.evaluate(best.transform(test), labelCol), best)
      }
    } finally train.unpersist()
  }

  def bestByRmse(results: Seq[ModelResult]): ModelResult =
    results.minBy(_.metrics.rmse)

  /** Comparison table, persisted like models/model_comparison.csv. */
  def comparisonFrame(spark: SparkSession, results: Seq[ModelResult]): DataFrame = {
    import spark.implicits._
    results.map(r => (r.name, r.metrics.rmse, r.metrics.r2, r.metrics.mae))
      .toDF("model", "rmse", "r2", "mae")
  }

  def saveComparison(spark: SparkSession, results: Seq[ModelResult], path: String): Unit =
    comparisonFrame(spark, results)
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
