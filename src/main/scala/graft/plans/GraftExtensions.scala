package graft.plans

import graft.functions.{CosineSimilarity, GraftFunctions}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** SparkSessionExtensions entry point: registers graft's native expressions
  * into the session function registry. Enable with
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      GraftFunctions.cosineSimInfo,
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_sig"),
      GraftFunctions.hyperplaneSigInfo,
      GraftFunctions.buildHyperplaneSig _))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      GraftFunctions.simhash64Info,
      (children: Seq[Expression]) => graft.functions.SimHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      GraftFunctions.minhashSigsInfo,
      GraftFunctions.buildMinHashSigs _))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      GraftFunctions.wordNGramsInfo,
      GraftFunctions.buildWordNGrams _))
    ext.injectFunction((
      FunctionIdentifier("lang_quality_counts"),
      GraftFunctions.langQualityCountsInfo,
      GraftFunctions.buildLangQualityCounts _))
    // point-in-interval inequality joins → banded equi-joins (see
    // RangeJoinRewrite; BNLJ is a scale-killer on 100 TB inputs)
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
  }
}
