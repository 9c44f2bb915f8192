package graft.features

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}

/** Categorical encode pipeline: StringIndexer×k → OneHotEncoder →
  * VectorAssembler (ref: src/features/feature_engineering.py:223-268).
  *
  * Fixes reference quirk Q1 (SURVEY §2.12): the reference's output-column
  * membership test used the singular `getOutputCol` on the plural-output
  * OneHotEncoder, silently dropping every encoded categorical from the
  * feature vector (16 features shipped instead of the intended 64). Here
  * the encoded columns are explicitly included.
  */
object Encoding {

  def indexedCol(c: String): String = s"${c}_indexed"
  def encodedCol(c: String): String = s"${c}_encoded"

  /** @param handleInvalid "skip" (strict — unseen categories drop the row,
    *                      reference quirk Q3) or "keep" (permissive).
    */
  def buildPipeline(
      categoricalCols: Seq[String],
      numericCols: Seq[String],
      handleInvalid: String = "keep"): Pipeline = {
    val indexers = categoricalCols.map { c =>
      new StringIndexer()
        .setInputCol(c).setOutputCol(indexedCol(c))
        .setHandleInvalid(handleInvalid)
        .setStringOrderType("frequencyDesc")
    }
    val encoder = new OneHotEncoder()
      .setInputCols(categoricalCols.map(indexedCol).toArray)
      .setOutputCols(categoricalCols.map(encodedCol).toArray)
      .setDropLast(true)
      .setHandleInvalid(if (handleInvalid == "skip") "error" else "keep")
    val assembler = new VectorAssembler()
      .setInputCols((numericCols ++ categoricalCols.map(encodedCol)).toArray)
      .setOutputCol("features")
      .setHandleInvalid("keep")
    new Pipeline().setStages((indexers :+ encoder :+ assembler).toArray)
  }
}
