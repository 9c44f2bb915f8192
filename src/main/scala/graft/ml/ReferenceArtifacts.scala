package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineStage}
import org.apache.spark.ml.param.Params
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.nio.file.{Files, Paths}
import scala.util.Try

/** Cross-version salvage of the reference's shipped Spark-ML artifacts
  * (ref: models/rf/feature_engineering/pipeline, models/rf/model —
  * written by src/models/train.py under Spark 3.5.1).
  *
  * The shipped directories are METADATA-ONLY: every pipeline stage and
  * both RF model dirs carry `metadata/part-00000` (and the RF dirs
  * `treesMetadata/`) but none of the `data/` parquet that Spark's
  * `MLReader`s require for learned state (indexer labels, encoder
  * category sizes, tree splits). `PipelineModel.load` /
  * `RandomForestRegressionModel.load` therefore fail under ANY Spark
  * version — this is artifact truncation, not 3.5→4.1 skew
  * ([[ReferenceArtifactsSpec]] pins the failure mode).
  *
  * What IS recoverable — and what a migrating user actually needs — is
  * the full pipeline STRUCTURE with every explicitly-set param:
  * stage order, uids, input/output columns, handleInvalid/dropLast
  * policies, the assembler's 16-slot feature list, and the RF
  * hyper-parameters. [[pipelineSkeleton]] rebuilds the stages as unfit
  * estimators with identical uids and params, ready to refit on the
  * migrating user's data; [[rfHyperParams]] recovers the training
  * configuration. Param values are decoded with Spark's own
  * `Param.jsonDecode` (the same codec `DefaultParamsReader` uses), so
  * any param type Spark can persist round-trips here.
  */
object ReferenceArtifacts {

  /** One stage's `metadata/part-00000`, parsed. `params` holds the
    * explicitly-set paramMap; `defaults` the recorded defaultParamMap.
    */
  final case class StageMeta(className: String, uid: String,
      sparkVersion: String, params: Map[String, JValue],
      defaults: Map[String, JValue])

  def readMeta(stageDir: String): StageMeta = {
    val raw = Files.readString(Paths.get(s"$stageDir/metadata/part-00000"))
    val j = JsonMethods.parse(raw)
    def fields(name: String): Map[String, JValue] = j \ name match {
      case JObject(fs) => fs.toMap
      case _ => Map.empty
    }
    val JString(cls) = (j \ "class"): @unchecked
    val JString(uid) = (j \ "uid"): @unchecked
    val JString(ver) = (j \ "sparkVersion"): @unchecked
    StageMeta(cls, uid, ver, fields("paramMap"), fields("defaultParamMap"))
  }

  /** Instantiate `meta`'s stage as an UNFIT estimator/transformer with the
    * original uid, applying every explicitly-set param. Fitted-model
    * classes map back to their estimator (`StringIndexerModel` →
    * `StringIndexer`); params the estimator doesn't declare (none in the
    * reference's artifacts) are skipped rather than failed, since a
    * skeleton's contract is "refit-ready", not "bit-identical".
    */
  def instantiateStage(meta: StageMeta): PipelineStage = {
    val estimatorCls = meta.className match {
      case m if m.endsWith("Model") =>
        val e = m.stripSuffix("Model")
        if (Try(Class.forName(e)).isSuccess) e else m
      case other => other
    }
    val stage = Class.forName(estimatorCls)
      .getConstructor(classOf[String])
      .newInstance(meta.uid)
      .asInstanceOf[PipelineStage]
    applyParams(stage, meta.params)
    stage
  }

  private def applyParams(target: Params, params: Map[String, JValue]): Unit =
    params.foreach { case (name, jval) =>
      if (target.hasParam(name)) {
        val p = target.getParam(name)
        target.set(p, p.jsonDecode(JsonMethods.compact(JsonMethods.render(jval))))
      }
    }

  /** Rebuild the reference pipeline as an unfit [[Pipeline]] (stages in
    * the persisted `stageUids` order) plus the parsed per-stage metadata
    * for inspection. `dir` is the pipeline root (the one holding
    * `metadata/` and `stages/`).
    */
  def pipelineSkeleton(dir: String): (Pipeline, Seq[StageMeta]) = {
    val root = readMeta(dir)
    val stageUids = root.params.get("stageUids") match {
      case Some(JArray(vs)) => vs.collect { case JString(s) => s }
      case _ => sys.error(s"no stageUids in $dir/metadata")
    }
    val stageDirs = stageUids.zipWithIndex.map { case (uid, i) =>
      s"$dir/stages/${i}_$uid"
    }
    val metas = stageDirs.map(readMeta)
    (new Pipeline(root.uid).setStages(metas.map(instantiateStage).toArray), metas)
  }

  /** The RF model dir's hyper-parameters: explicitly-set params merged
    * over recorded defaults, plus the persisted `numFeatures`.
    */
  def rfHyperParams(modelDir: String): (Map[String, JValue], Int) = {
    val meta = readMeta(modelDir)
    val raw = Files.readString(Paths.get(s"$modelDir/metadata/part-00000"))
    val numFeatures = JsonMethods.parse(raw) \ "numFeatures" match {
      case JInt(n) => n.toInt
      case _ => -1
    }
    (meta.defaults ++ meta.params, numFeatures)
  }

  /** The per-tree rows the reference DID ship (tree params + ensemble
    * weights — not the splits, which were truncated with `data/`).
    */
  def treesMetadata(spark: SparkSession, modelDir: String): DataFrame =
    spark.read.parquet(s"$modelDir/treesMetadata")
}
