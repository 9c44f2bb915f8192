package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark plan builder over the testdata dir plus an
  * optional DuckDB oracle SQL twin (same tables, same column names — the
  * driver hash-compares results column-name-sorted).
  */
final case class QSpec(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)
