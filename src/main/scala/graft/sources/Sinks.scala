package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout levers for scale: bucketed tables (co-located,
  * shuffle-free equi-joins) and partitioned layouts (partition-pruned
  * scans). These are the write-side half of the 100 TB story — a join or
  * time-range scan is only as cheap as the layout lets it be.
  */
object Sinks {

  /** Write a bucketed + sorted table: joins/aggregations on `bucketCol`
    * between tables bucketed the same way need NO exchange — each bucket
    * pairs 1:1. (Bucketing requires the table catalog, hence saveAsTable.)
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket column — with matching
    * bucket counts Catalyst plans a sort-merge join with zero Exchange.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Hive-style partitioned parquet layout: scans filtering on
    * `partitionCol` prune directories before reading a byte
    * (PartitionFilters in the scan node).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  def readPartition(spark: SparkSession, path: String, partitionCol: String,
      value: Any): DataFrame =
    spark.read.parquet(path).filter(col(partitionCol) === lit(value))
}
