package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Outlier capping (winsorize at p01/p99) with persisted fit-state.
  *
  * Reference: /root/reference/src/features/feature_engineering.py:152-180 and
  * the shipped state at models/rf/feature_engineering/params.json.
  *
  * Scale notes vs the reference:
  *   - fit() uses the multi-column `approxQuantile(cols, probs, err)` overload
  *     — ONE distributed job for all columns, not one action per column
  *     (the reference's per-column loop is an anti-pattern, SURVEY §4).
  *   - transform() is a pure column expression (least/greatest), codegen'd.
  *   - The reference's fit-on-transform memoization (quirk Q4) is kept but
  *     explicit: transform on an unfitted Capper throws unless
  *     `fitIfUnfit = true` is requested.
  */
class Capper(
    val cols: Seq[String],
    val lowerP: Double = 0.01,
    val upperP: Double = 0.99,
    val relErr: Double = 0.01) extends Serializable {

  private var state: Option[Map[String, (Double, Double)]] = None

  def bounds: Map[String, (Double, Double)] =
    state.getOrElse(throw new IllegalStateException("Capper not fitted"))

  def isFitted: Boolean = state.isDefined

  def fit(df: DataFrame): this.type = {
    val qs = df.stat.approxQuantile(cols.toArray, Array(lowerP, upperP), relErr)
    state = Some(cols.zip(qs.map(q => (q(0), q(1)))).toMap)
    this
  }

  def transform(df: DataFrame, fitIfUnfit: Boolean = false): DataFrame = {
    if (!isFitted) {
      if (fitIfUnfit) fit(df)
      else throw new IllegalStateException("Capper not fitted; pass fitIfUnfit=true to reproduce reference quirk Q4")
    }
    bounds.foldLeft(df) { case (d, (c, (lo, hi))) =>
      d.withColumn(c, least(greatest(col(c), lit(lo)), lit(hi)))
    }
  }

  def fitTransform(df: DataFrame): DataFrame = fit(df).transform(df)

  /** Persist bounds as JSON in the reference's nested params.json shape:
    * {"capping_values": {"col": {"lower": …, "upper": …}}} — so artifacts
    * are interoperable with reference-produced state in both directions.
    */
  def save(path: String): Unit = {
    val body = bounds.toSeq.sortBy(_._1).map { case (c, (lo, hi)) =>
      s""""$c": {"lower": $lo, "upper": $hi}"""
    }.mkString("""{"capping_values": {""", ", ", "}}")
    val parent = Paths.get(path).getParent
    if (parent != null) Files.createDirectories(parent)
    Files.writeString(Paths.get(path), body)
  }

  /** Loads both this class's output and a reference-produced params.json
    * (the {"lower": …, "upper": …} objects are the only shape either
    * writes inside capping_values).
    */
  def load(path: String): this.type = {
    val txt = Files.readString(Paths.get(path))
    val entry =
      """"([^"]+)"\s*:\s*\{\s*"lower"\s*:\s*([-0-9.eE]+)\s*,\s*"upper"\s*:\s*([-0-9.eE]+)\s*\}""".r
    val entries = entry.findAllMatchIn(txt)
      .map(m => m.group(1) -> (m.group(2).toDouble, m.group(3).toDouble)).toSeq
    require(entries.nonEmpty, s"no capping_values entries found in $path")
    state = Some(entries.toMap)
    this
  }
}
