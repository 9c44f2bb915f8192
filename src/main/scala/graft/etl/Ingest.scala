package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The prepare-data ETL (ref: notebooks/00_prepare_data.py): CSV scans →
  * inner join on the key → cast-project to the canonical schema → Parquet.
  *
  * Scale notes: the label side of the join is small relative to features in
  * general workloads — Catalyst broadcast-joins under the threshold, and
  * AQE handles skew above it. The cast-project is one ProjectExec
  * (CollapseProject), and the Parquet write preserves the scan partitioning
  * (no shuffle).
  */
object Ingest {

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** X ⋈ y on id_annonce — inner join, dropping label-less rows
    * (reference quirk Q5, kept as canonical semantics).
    */
  def joinFeaturesLabels(x: DataFrame, y: DataFrame, key: String = "id_annonce"): DataFrame =
    x.join(y, Seq(key))

  /** Cast every column to the canonical listing type
    * (ref: notebooks/00_prepare_data.py:65-87).
    */
  def castCanonical(df: DataFrame): DataFrame = {
    val casts = Schemas.listing.fields.collect {
      case f if df.columns.contains(f.name) => col(f.name).cast(f.dataType).as(f.name)
    }
    df.select(casts.toSeq: _*)
  }

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Full prepare pipeline + join-integrity counts (a10,
    * ref: notebooks/00_prepare_data.py:117-120). Inputs are cached so the
    * integrity counts don't re-scan (and re-infer) the raw CSVs after the
    * join/write already consumed them.
    */
  def prepare(spark: SparkSession, xCsv: String, yCsv: String, outParquet: String):
      (Long, Long, Long) = {
    val x = readCsv(spark, xCsv).cache()
    val y = readCsv(spark, yCsv).cache()
    try {
      val joined = castCanonical(joinFeaturesLabels(x, y))
      writeParquet(joined, outParquet)
      (x.count(), y.count(), spark.read.parquet(outParquet).count())
    } finally {
      x.unpersist()
      y.unpersist()
    }
  }
}
