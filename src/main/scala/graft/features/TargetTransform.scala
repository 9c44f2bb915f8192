package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Stats captured at fit time (mirrors the reference's
  * models/rf/target_transformer.json shape).
  */
final case class TargetStats(
    count: Long, mean: Double, std: Double, logMean: Double, logStd: Double) {
  /** Duan smearing factor exp(σ²_log / 2)
    * (reference: src/features/target_transformer.py:82-87).
    */
  def smearingFactor: Double = math.exp(logStd * logStd / 2.0)
}

/** log(price) target transform with smearing inverse.
  *
  * Reference: /root/reference/src/features/target_transformer.py:24-99.
  * Differences by design (SURVEY §7 decision on quirk Q2): fit is a SINGLE
  * aggregation job (the reference runs two summary().collect() actions), and
  * the intended use is training on `log_price` so the smearing inverse is
  * mathematically valid (the reference trained on raw price and then applied
  * exp(), producing inf predictions).
  */
class TargetTransformer(val labelCol: String = "price") extends Serializable {

  private var statsOpt: Option[TargetStats] = None
  def stats: TargetStats =
    statsOpt.getOrElse(throw new IllegalStateException("TargetTransformer not fitted"))
  def isFitted: Boolean = statsOpt.isDefined

  val logCol: String = s"log_$labelCol"

  def fit(df: DataFrame): this.type = {
    // log stats over raw ln(label) with non-positive labels excluded (null
    // → skipped by avg/stddev), matching the reference's summary-of-log
    // semantics (src/features/target_transformer.py:34-44): guardedLog's
    // 0.0 for label ≤ 0 would otherwise bias log_mean/log_std and hence
    // the Duan smearing factor. transform() still uses the guarded log,
    // as the reference does.
    val lg = when(col(labelCol) > 0, log(col(labelCol)))
    // cast the moments to double in-plan: a decimal label column (common
    // when the parquet was written by another engine) would otherwise
    // surface as BigDecimal and break the typed row reads below
    val row = df.agg(
      count(col(labelCol)).as("n"),
      avg(col(labelCol)).cast("double").as("mean"),
      stddev_samp(col(labelCol)).cast("double").as("std"),
      avg(lg).cast("double").as("log_mean"),
      stddev_samp(lg).cast("double").as("log_std")).head()
    statsOpt = Some(TargetStats(
      row.getLong(0), row.getDouble(1), row.getDouble(2),
      row.getDouble(3), row.getDouble(4)))
    this
  }

  /** Adds `log_<label>` (guarded log, as the reference). */
  def transform(df: DataFrame): DataFrame =
    df.withColumn(logCol, Derived.guardedLog(col(labelCol)))

  /** Inverse transform of a log-scale prediction column:
    * price = exp(pred) · exp(σ²_log/2) (Duan smearing).
    */
  def inverse(df: DataFrame, predCol: String, outCol: String = "prediction_price"): DataFrame =
    df.withColumn(outCol, exp(col(predCol)) * lit(stats.smearingFactor))

  def save(path: String): Unit = {
    val s = stats
    val body =
      s"""{"original_count": ${s.count}, "original_mean": ${s.mean}, "original_std": ${s.std}, "log_mean": ${s.logMean}, "log_std": ${s.logStd}}"""
    if (Paths.get(path).getParent != null) Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), body)
  }

  def load(path: String): this.type = {
    val txt = Files.readString(Paths.get(path))
    def field(name: String): String = {
      val m = s""""$name":\\s*([-0-9.eE]+)""".r.findFirstMatchIn(txt)
        .getOrElse(throw new IllegalArgumentException(s"missing $name in $path"))
      m.group(1)
    }
    statsOpt = Some(TargetStats(
      field("original_count").toDouble.toLong,
      field("original_mean").toDouble, field("original_std").toDouble,
      field("log_mean").toDouble, field("log_std").toDouble))
    this
  }
}
